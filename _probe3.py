import time, cProfile, pstats, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.profiles.light.sersic import SersicEllipse
from gigalens_tpu.profiles.mass.epl import EPL
from gigalens_tpu.profiles.mass.shear import Shear
from gigalens_tpu.simulator import LensSimulator
psf = np.load("/root/reference/src/gigalens/assets/psf.npy").astype(np.float32)
phys = PhysicalModel([EPL(23), Shear()], [SersicEllipse()], [SersicEllipse()])
cfg = SimulatorConfig(delta_pix=0.065, num_pix=40, supersample=2, kernel=psf)
t0=time.time()
pr = cProfile.Profile(); pr.enable()
sim = LensSimulator(phys, cfg, bs=1)
pr.disable()
print("init wall:", round(time.time()-t0,1), flush=True)
pstats.Stats(pr).sort_stats("cumulative").print_stats(18)
