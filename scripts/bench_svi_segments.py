"""Measure SVI phase wall vs segment_steps on the real chip.

The bench's SVI phase shows ~77 ms/step while the underlying posterior
gradient at the same batch size costs ~24 ms — this script isolates how much
of the gap is per-dispatch overhead (the axon tunnel adds latency per device
call; bench.py dispatches vi_steps//10-step segments) vs per-step cost
inherent to the ELBO program.

Usage: python scripts/bench_svi_segments.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from gigalens_tpu.utils.aot import setup_compilation_cache as _scc; _scc()
import jax.numpy as jnp
import optax

from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.inference import ModellingSequence
from gigalens_tpu.model import ForwardProbModel
from gigalens_tpu.prob import Prior
from gigalens_tpu.prob import distributions as gld
from gigalens_tpu.profiles.light.sersic import SersicEllipse
from gigalens_tpu.profiles.mass.epl import EPL
from gigalens_tpu.profiles.mass.shear import Shear
from gigalens_tpu.simulator import LensSimulator


def build():
    prior = Prior(
        dict(
            lens_mass=[
                dict(
                    theta_E=gld.LogNormal(jnp.log(1.25), 0.25),
                    gamma=gld.TruncatedNormal(2, 0.25, 1, 3),
                    e1=gld.Normal(0, 0.1),
                    e2=gld.Normal(0, 0.1),
                    center_x=gld.Normal(0, 0.05),
                    center_y=gld.Normal(0, 0.05),
                ),
                dict(gamma1=gld.Normal(0, 0.05), gamma2=gld.Normal(0, 0.05)),
            ],
            lens_light=[
                dict(
                    R_sersic=gld.LogNormal(jnp.log(1.0), 0.15),
                    n_sersic=gld.Uniform(2, 6),
                    e1=gld.TruncatedNormal(0, 0.1, -0.3, 0.3),
                    e2=gld.TruncatedNormal(0, 0.1, -0.3, 0.3),
                    center_x=gld.Normal(0, 0.05),
                    center_y=gld.Normal(0, 0.05),
                    Ie=gld.LogNormal(jnp.log(500.0), 0.3),
                )
            ],
            source_light=[
                dict(
                    R_sersic=gld.LogNormal(jnp.log(0.25), 0.15),
                    n_sersic=gld.Uniform(0.5, 4),
                    e1=gld.TruncatedNormal(0, 0.15, -0.5, 0.5),
                    e2=gld.TruncatedNormal(0, 0.15, -0.5, 0.5),
                    center_x=gld.Normal(0, 0.25),
                    center_y=gld.Normal(0, 0.25),
                    Ie=gld.LogNormal(jnp.log(150.0), 0.5),
                )
            ],
        )
    )
    psf = np.load("/root/reference/src/gigalens/assets/psf.npy").astype(np.float32)
    phys = PhysicalModel([EPL(50), Shear()], [SersicEllipse()], [SersicEllipse()])
    cfg = SimulatorConfig(delta_pix=0.065, num_pix=80, supersample=2, kernel=psf)
    truth = prior.sample(jax.random.PRNGKey(42), 1)
    sim1 = LensSimulator(phys, cfg, bs=1)
    truth_img = np.asarray(jax.jit(sim1.simulate)(truth))
    rng = np.random.default_rng(1)
    obs = truth_img + rng.normal(size=truth_img.shape).astype(np.float32) * np.sqrt(
        0.2**2 + np.clip(truth_img, 0, None) / 100.0
    )
    pm = ForwardProbModel(prior, obs, background_rms=0.2, exp_time=100.0)
    return prior, phys, cfg, pm


def main():
    print("devices:", jax.devices(), flush=True)
    prior, phys, cfg, pm = build()
    seq = ModellingSequence(phys, pm, cfg)
    start = np.asarray(prior.unconstrain(prior.sample(jax.random.PRNGKey(7), 1)))
    L0 = seq.laplace_scale_tril(start)

    schedule = optax.polynomial_schedule(-1e-6, -3e-3, 2, 60)
    opt = optax.chain(optax.scale_by_adam(), optax.scale_by_schedule(schedule))

    for seg in (30, 100, 300):
        # warm-up compile for this segment length
        seq.SVI(start, opt, n_vi=1000, num_steps=seg, init_scales=L0,
                seed=1, segment_steps=seg)
        for rep in range(2):
            t0 = time.time()
            _, losses = seq.SVI(start, opt, n_vi=1000, num_steps=300,
                                init_scales=L0, seed=1, segment_steps=seg)
            jax.block_until_ready(losses)
            dt = time.time() - t0
            print(f"segment_steps={seg:4d} rep{rep}: 300 steps in {dt:6.2f}s "
                  f"({dt / 300 * 1e3:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
