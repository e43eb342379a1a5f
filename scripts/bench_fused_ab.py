"""A/B harness for fused-render kernel tuning knobs on the real TPU.

Times render fwd and fwd+grad at the benchmark scale for the current
GIGALENS_EPL_UNROLL / GIGALENS_FUSED_PIX_BLK settings (read at import time
by epl.py / fused_render.py).

    GIGALENS_EPL_UNROLL=50 GIGALENS_FUSED_PIX_BLK=2560 \
        python scripts/bench_fused_ab.py [n]
"""
import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import os
import sys


def main():
    import jax

    from gigalens_tpu.utils.aot import setup_compilation_cache as _scc; _scc()
    import jax.numpy as jnp
    import numpy as np

    from gigalens_tpu.ops.pallas.fused_render import fused_render
    from gigalens_tpu.utils.profiling import timed

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    niter = 50
    npix = 25600

    rng = np.random.default_rng(0)
    params = np.zeros((n, 22), np.float32)
    params[:, 0] = 1.2 + 0.1 * rng.normal(size=n)      # theta_E
    params[:, 1] = 2.0 + 0.1 * rng.normal(size=n)      # gamma
    params[:, 2:4] = 0.1 * rng.normal(size=(n, 2))     # e1 e2
    params[:, 4:6] = 0.05 * rng.normal(size=(n, 2))
    params[:, 6:8] = 0.03 * rng.normal(size=(n, 2))
    for base in (8, 15):
        params[:, base + 0] = 0.8 + 0.05 * rng.normal(size=n)   # R_sersic
        params[:, base + 1] = 3.0 + 0.2 * rng.normal(size=n)    # n_sersic
        params[:, base + 2 : base + 4] = 0.1 * rng.normal(size=(n, 2))
        params[:, base + 4 : base + 6] = 0.05 * rng.normal(size=(n, 2))
        params[:, base + 6] = 100.0
    params = jnp.asarray(params)
    lin = np.linspace(-2.6, 2.6, 160, dtype=np.float32)
    X, Y = np.meshgrid(lin, lin)
    x = jnp.asarray(X.reshape(-1))
    y = jnp.asarray(Y.reshape(-1))
    assert x.shape[0] == npix

    from gigalens_tpu.ops.pallas import fused_render as fr_mod
    from gigalens_tpu.profiles.mass import epl as epl_mod

    tag = (f"unroll={epl_mod._UNROLL}(kernel:full) pix_blk={fr_mod.PIX_BLK}")

    fwd = jax.jit(lambda p: fused_render(p, x, y, niter))
    t, out = timed(fwd, params, repeats=10)
    print(f"[{tag}] render fwd      : {t*1e3:7.1f} ms  (sum {float(out.sum()):.6g})",
          flush=True)

    g = jax.jit(jax.grad(lambda p: jnp.sum(fused_render(p, x, y, niter) ** 2)))
    t, gout = timed(g, params, repeats=10)
    print(f"[{tag}] render fwd+grad : {t*1e3:7.1f} ms  (gsum {float(jnp.abs(gout).sum()):.6g})",
          flush=True)


if __name__ == "__main__":
    main()
