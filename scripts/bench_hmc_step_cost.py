"""In-chain HMC per-step cost vs leapfrog count, on the real chip.

The host-dispatch floor through the axon tunnel (~1.2 ms/call) pollutes
single-call gradient timings; this measures the *device-side* cost of HMC
steps by scanning N identical steps in one program with a static leapfrog
count L, for several L, then fitting wall = N * (a + L * b):

    b = device cost of one leapfrog gradient
    a = fixed per-step cost (momentum sample, cholesky solves, adaptation)

Usage: python scripts/bench_hmc_step_cost.py [bs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from gigalens_tpu.utils.aot import setup_compilation_cache as _scc; _scc()
import jax.numpy as jnp
import numpy as np

from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.inference.hmc import sample_hmc
from gigalens_tpu.model import ForwardProbModel
from gigalens_tpu.prob import Prior
from gigalens_tpu.prob import distributions as gld
from gigalens_tpu.profiles.light.sersic import SersicEllipse
from gigalens_tpu.profiles.mass.epl import EPL
from gigalens_tpu.profiles.mass.shear import Shear
from gigalens_tpu.simulator import LensSimulator


def build(bs):
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
    niter = EPL.recommended_niter(q_min=0.43, tol=1e-8)
    phys = PhysicalModel([EPL(niter), Shear()], [SersicEllipse()], [SersicEllipse()])
    cfg = SimulatorConfig(delta_pix=0.065, num_pix=80, supersample=2, kernel=psf)
    truth = prior.sample(jax.random.PRNGKey(42), 1)
    sim1 = LensSimulator(phys, cfg, bs=1)
    obs = np.asarray(jax.jit(sim1.simulate)(truth))
    pm = ForwardProbModel(prior, obs, background_rms=0.2, exp_time=100.0)
    mode = os.environ.get("GIGALENS_STEPCOST_PSF")  # None=auto(dft) | fft
    if mode:
        import dataclasses

        cfg = dataclasses.replace(cfg, psf_mode=mode)
    sim = LensSimulator(phys, cfg, bs=bs)
    return prior, pm, sim


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    prior, pm, sim = build(bs)
    z0 = prior.unconstrain(prior.sample(jax.random.PRNGKey(7), bs))

    def log_prob_fn(z):
        return pm.log_prob(sim, z)[0]

    N = 100
    results = {}
    for L in (1, 3, 8, 16):
        # static trajectories, no mass adaptation: per-step work = L grads + fixed
        def run():
            return sample_hmc(
                log_prob_fn, z0, jax.random.PRNGKey(0),
                step_size=0.01, num_leapfrog_steps=L,
                num_burnin_steps=0, num_results=N,
                trajectory_adaptation="none", mass_adaptation=False,
            )

        r = run()
        jax.block_until_ready(r.samples)
        t0 = time.time()
        r = run()
        jax.block_until_ready(r.samples)
        dt = time.time() - t0
        results[L] = dt / N
        print(f"L={L:3d}: {dt/N*1e3:8.3f} ms/step")

    Ls = sorted(results)
    # least-squares fit a + L*b
    A = np.stack([np.ones(len(Ls)), np.asarray(Ls, float)], 1)
    coef, *_ = np.linalg.lstsq(A, np.asarray([results[L] for L in Ls]), rcond=None)
    print(f"fixed per-step a = {coef[0]*1e3:.3f} ms, per-leapfrog b = {coef[1]*1e3:.3f} ms")


if __name__ == "__main__":
    main()
