"""gigalens_tpu — TPU-native Bayesian strong-lensing inference.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of furcelay/gigalens
(cluster-lens branch): differentiable batched lens simulation, a probabilistic
model over images and multiple-image positions, and a MAP -> SVI -> HMC / SMC
inference pipeline — designed for TPU (single substrate, device-resident
optimization loops, mesh sharding over the sample batch, FFT PSF convolution).
"""

__version__ = "0.1.0"

from gigalens_tpu.config import SimulatorConfig
from gigalens_tpu.model import PhysicalModel

__all__ = ["SimulatorConfig", "PhysicalModel", "__version__"]
