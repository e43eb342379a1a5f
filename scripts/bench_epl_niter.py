"""EPL series depth vs gradient cost/accuracy at HMC batch size.

Motivation: the leapfrog integrator only needs a gradient *field* — any
smooth approximation yields a valid (reversible, volume-preserving)
proposal, and Metropolis acceptance with the exact density keeps the chain
exact. So if truncating the EPL angular series (niter 50 -> 18, the
reference's own JAX default) meaningfully cuts the fused render gradient
cost while moving log L by << 1 nat, HMC can kick with the short series and
accept with the long one.

Reports, for niter in {50, 30, 18, 10}: fused-render posterior-gradient
wall at bs=50, |dlogL| vs niter=50, and gradient relative deviation.
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

    from gigalens_tpu.utils.aot import setup_compilation_cache as _scc; _scc()
    import jax.numpy as jnp

    from __graft_entry__ import _demo_setup
    from gigalens_tpu import PhysicalModel
    from gigalens_tpu.model import ForwardProbModel
    from gigalens_tpu.profiles.light.sersic import SersicEllipse
    from gigalens_tpu.profiles.mass.epl import EPL
    from gigalens_tpu.profiles.mass.shear import Shear
    from gigalens_tpu.simulator import LensSimulator

    bs = 50
    prior, phys50, cfg, pm, _ = _demo_setup(num_pix=80, bs=bs, psf_size=25)
    z = prior.unconstrain(prior.sample(jax.random.PRNGKey(0), bs))

    ref_lp = None
    ref_grad = None
    for niter in (50, 30, 18, 10):
        phys = PhysicalModel(
            [EPL(niter), Shear()], [SersicEllipse()], [SersicEllipse()]
        )
        sim = LensSimulator(phys, cfg, bs=bs)

        def lp_sum(zz, sim=sim):
            lp, _ = pm.log_prob(sim, zz)
            return jnp.sum(lp), lp

        gfn = jax.jit(jax.grad(lambda zz: lp_sum(zz)[0]))
        lpfn = jax.jit(lambda zz: lp_sum(zz)[1])
        g = jax.block_until_ready(gfn(z))
        lp = jax.block_until_ready(lpfn(z))
        t0 = time.time()
        n_rep = 30
        for _ in range(n_rep):
            g = gfn(z)
        jax.block_until_ready(g)
        dt_g = (time.time() - t0) / n_rep
        t0 = time.time()
        for _ in range(n_rep):
            lp2 = lpfn(z)
        jax.block_until_ready(lp2)
        dt_f = (time.time() - t0) / n_rep

        g = np.asarray(g)
        lp = np.asarray(lp)
        if niter == 50:
            ref_lp, ref_grad = lp, g
            print(f"niter={niter:3d}: grad {dt_g*1e3:6.2f} ms  fwd {dt_f*1e3:6.2f} ms"
                  f"  (reference)", flush=True)
        else:
            dlp = np.abs(lp - ref_lp)
            rel = np.linalg.norm(g - ref_grad) / np.linalg.norm(ref_grad)
            print(f"niter={niter:3d}: grad {dt_g*1e3:6.2f} ms  fwd {dt_f*1e3:6.2f} ms"
                  f"  |dlogL| mean {dlp.mean():.4f} max {dlp.max():.4f} nats"
                  f"  grad rel {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
