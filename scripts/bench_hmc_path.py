"""HMC-path A/B on TPU: leapfrog gradient cost and likelihood exactness.

Compares the exact-phase simulator candidates at HMC batch size (bs=50,
benchmark scene): XLA render + FFT conv (previous exact path) vs XLA render +
dft_hi conv (f32-exact DFT matmuls) vs fused render + dft_hi. Reports
per-gradient wall time and the log-likelihood deviation from the FFT path
(MH acceptance tolerates ~0.0x nats).
"""
import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import dataclasses

import numpy as np


def main():
    import jax

    from gigalens_tpu.utils.aot import setup_compilation_cache as _scc; _scc()
    import jax.numpy as jnp

    from __graft_entry__ import _demo_setup
    from gigalens_tpu.model import ForwardProbModel
    from gigalens_tpu.simulator import LensSimulator
    from gigalens_tpu.utils.profiling import timed

    bs = 50
    prior, phys, cfg, pm, _ = _demo_setup(num_pix=80, bs=bs, psf_size=25)
    z = prior.unconstrain(prior.sample(jax.random.PRNGKey(0), bs))

    variants = {
        "fft (old exact)": dict(psf_mode="fft", use_fused_render=False),
        "fft+fused": dict(psf_mode="fft", use_fused_render=True),
        "dft_hi": dict(psf_mode="dft_hi", use_fused_render=False),
        "dft_hi+fused": dict(psf_mode="dft_hi", use_fused_render=True),
        "dft (bf16)": dict(psf_mode="dft", use_fused_render=False),
    }
    lps, fns = {}, {}
    for name, kw in variants.items():
        sim = LensSimulator(phys, dataclasses.replace(cfg, **kw), bs=bs)

        def lp_and_grad(z, sim=sim):
            lp, vjp = jax.vjp(lambda zz: pm.log_prob(sim, zz)[0], z)
            (g,) = vjp(jnp.ones_like(lp))
            return lp, g

        f = jax.jit(lp_and_grad)
        fns[name] = f
        t, (lp, g) = timed(f, z, repeats=10)
        lps[name] = np.asarray(lp)
        print(f"{name:18s}: {t*1e3:7.2f} ms/grad", flush=True)

    ref = lps["fft (old exact)"]
    for name, lp in lps.items():
        d = np.abs(lp - ref)
        print(f"{name:18s}: |dlogL| mean {d.mean():.4f}  max {d.max():.4f} nats",
              flush=True)

    # Roughness along a leapfrog-like path: take tiny steps along each
    # variant's own gradient direction and measure how much the *increment*
    # of its own logL wobbles vs the smooth FFT increments. MH acceptance
    # sees dH over a trajectory; ULP-scale roughness here is what collapses
    # dual averaging (not the absolute offset above).
    print("\ntrajectory roughness (per-step dlogL vs own smooth fit, eps=3e-3):")
    for name, f in fns.items():
        lp0, g0 = f(z)
        gdir = g0 / jnp.linalg.norm(g0, axis=-1, keepdims=True)
        steps = []
        lp_prev = np.asarray(lp0)
        for i in range(1, 9):
            lp_i, _ = f(z + 3e-3 * i * gdir)
            lp_i = np.asarray(lp_i)
            steps.append(lp_i - lp_prev)
            lp_prev = lp_i
        steps = np.stack(steps)  # (8, bs) increments
        # second difference = deviation from locally-linear logL
        rough = np.abs(np.diff(steps, axis=0))
        print(f"{name:18s}: |d2logL| mean {rough.mean():.4f}  "
              f"p95 {np.quantile(rough, 0.95):.4f} nats", flush=True)


if __name__ == "__main__":
    main()
