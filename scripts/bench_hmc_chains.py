"""HMC chain-count scaling on TPU: gradient cost vs number of chains.

The published HMC config (50 chains x (250+750)) was tuned for an A100; on a
TPU v5e 50 samples x 25.6k supersampled pixels underfills the chip, so the
per-gradient cost should be strongly sublinear in the chain count. If so, the
same total draw budget is cheaper with more chains x fewer results each
(burn-in is the fixed per-chain tax), and ESS is at least as good (more
independent chains).

    python scripts/bench_hmc_chains.py
"""
import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import dataclasses
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gigalens_tpu.utils.aot import setup_compilation_cache as _scc; _scc()
    from __graft_entry__ import _demo_setup
    from gigalens_tpu import PhysicalModel
    from gigalens_tpu.model import ForwardProbModel
    from gigalens_tpu.profiles.light.sersic import SersicEllipse
    from gigalens_tpu.profiles.mass.epl import EPL
    from gigalens_tpu.profiles.mass.shear import Shear
    from gigalens_tpu.simulator import LensSimulator

    prior, _, cfg, _, _ = _demo_setup(num_pix=80, bs=16, psf_size=25)
    phys = PhysicalModel([EPL(50), Shear()], [SersicEllipse()], [SersicEllipse()])
    psf_path = "/root/reference/src/gigalens/assets/psf.npy"
    if _os.path.exists(psf_path):
        cfg = dataclasses.replace(cfg, kernel=np.load(psf_path).astype(np.float32))

    truth = prior.sample(jax.random.PRNGKey(42), 1)
    sim1 = LensSimulator(phys, cfg, bs=1)
    timg = np.asarray(jax.jit(sim1.simulate)(truth))
    rng = np.random.default_rng(1)
    obs = timg + rng.normal(size=timg.shape).astype(np.float32) * np.sqrt(
        0.2**2 + np.clip(timg, 0, None) / 100.0
    )
    pm = ForwardProbModel(prior, obs, background_rms=0.2, exp_time=100.0)

    variants = {
        "exact fft": dict(psf_mode="fft", use_fused_render=False),
        "fft+fused": dict(psf_mode="fft", use_fused_render=True),
    }
    for name, kw in variants.items():
        print(f"--- {name}", flush=True)
        for bs in (50, 100, 200, 400, 800):
            sim = LensSimulator(phys, dataclasses.replace(cfg, **kw), bs=bs)

            def lp_fn(z):
                return pm.log_prob(sim, z)[0]

            @jax.jit
            def grad_step(z):
                lp, vjp = jax.vjp(lp_fn, z)
                (g,) = vjp(jnp.ones_like(lp))
                return lp, g

            z = prior.unconstrain(prior.sample(jax.random.PRNGKey(0), bs))
            lp, g = grad_step(z)
            jax.block_until_ready(g)
            n_rep = 30
            t0 = time.time()
            for _ in range(n_rep):
                lp, g = grad_step(z)
            jax.block_until_ready(g)
            dt = (time.time() - t0) / n_rep * 1e3
            print(
                f"bs={bs:4d}: {dt:7.2f} ms/grad  {dt/bs*1e3:6.1f} us/chain",
                flush=True,
            )


if __name__ == "__main__":
    main()
