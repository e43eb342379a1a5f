"""Micro-benchmark: pixelated-source inversion cost per likelihood eval.

Times the marginal-likelihood forward pass and its gradient (the HMC unit
of work) at a production-shape config: 64x64 @ 0.05", supersample 2, HST-like
9x9 PSF, n_side=24 source grid, over a sweep of batch sizes.

    python scripts/bench_inversion.py [n_side [num_pix]]
"""
import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gigalens_tpu import PhysicalModel, SimulatorConfig
    from gigalens_tpu.inversion import PixelatedSourceProbModel, SourceGrid
    from gigalens_tpu.prob import Prior
    from gigalens_tpu.prob import distributions as gld
    from gigalens_tpu.profiles.mass.sie import SIE
    from gigalens_tpu.profiles.mass.shear import Shear
    from gigalens_tpu.simulator import LensSimulator

    n_side = int(_sys.argv[1]) if len(_sys.argv) > 1 else 24
    num_pix = int(_sys.argv[2]) if len(_sys.argv) > 2 else 64
    print(f"device={jax.devices()[0]} n_side={n_side} num_pix={num_pix}")

    kern = np.exp(
        -((np.arange(9) - 4) ** 2 + (np.arange(9)[:, None] - 4) ** 2) / 4.0
    )
    kern = (kern / kern.sum()).astype(np.float32)
    cfg = SimulatorConfig(delta_pix=0.05, num_pix=num_pix, supersample=2,
                          kernel=kern)
    prior = Prior(
        dict(
            lens_mass=[
                dict(theta_E=gld.LogNormal(np.log(0.8), 0.1),
                     e1=gld.Normal(0, 0.1), e2=gld.Normal(0, 0.1),
                     center_x=gld.Normal(0, 0.05),
                     center_y=gld.Normal(0, 0.05)),
                dict(gamma1=gld.Normal(0, 0.05), gamma2=gld.Normal(0, 0.05)),
            ],
            source_pixelated=[dict(lam=gld.LogNormal(1.0, 1.0))],
        )
    )
    phys = PhysicalModel([SIE(), Shear()], [], [])
    rng = np.random.default_rng(0)
    obs = rng.normal(0.0, 0.1, (num_pix, num_pix)).astype(np.float32)
    model = PixelatedSourceProbModel(
        prior, obs, background_rms=0.1, exp_time=1e3,
        grid=SourceGrid(n_side=n_side, extent=0.4), lam=None,
    )

    for bs in (1, 8, 32):
        sim = LensSimulator(phys, cfg, bs=bs)
        z = prior.unconstrain(prior.sample(jax.random.PRNGKey(0), bs))

        fwd = jax.jit(lambda zz: model.log_prob(sim, zz)[0])
        grad = jax.jit(jax.grad(lambda zz: jnp.sum(model.log_prob(sim, zz)[0])))

        for name, fn in (("fwd", fwd), ("fwd+grad", grad)):
            out = fn(z)
            jax.block_until_ready(out)
            n_rep = 5
            t0 = time.time()
            for _ in range(n_rep):
                out = fn(z)
            jax.block_until_ready(out)
            dt = (time.time() - t0) / n_rep
            print(f"bs={bs:3d} {name:9s}: {dt*1e3:8.2f} ms "
                  f"({dt/bs*1e3:7.2f} ms/sample)")


if __name__ == "__main__":
    main()
