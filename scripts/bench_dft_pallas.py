"""Pallas DFT-conv kernel vs the XLA einsum DFT paths (TPU).

Measures forward and forward+vjp wall time at the benchmark conv size
(bs x 160x160 images, fshape 192x192, pool=2 folded) and checks numerics
against the f32-exact XLA dft_hi path.

    python scripts/bench_dft_pallas.py [bs]
"""
import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import sys

import numpy as np


def main():
    import jax

    from gigalens_tpu.utils.aot import setup_compilation_cache as _scc; _scc()
    import jax.numpy as jnp

    from gigalens_tpu.ops.pallas.dft_conv import PallasDFTConv
    from gigalens_tpu.ops.psf import PSFConv
    from gigalens_tpu.utils.profiling import timed

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    rng = np.random.default_rng(0)
    kern = rng.random((33, 33)).astype(np.float32)
    kern /= kern.sum()
    x = jnp.asarray(rng.standard_normal((bs, 160, 160)).astype(np.float32))

    hi = PSFConv(kern, (160, 160), mode="dft_hi", pool=2)
    lo = PSFConv(kern, (160, 160), mode="dft", pool=2)
    facts = (hi._fh_re, hi._fh_im, hi._fw_re, hi._fw_im, hi._k_re, hi._k_im,
             hi._ih_re, hi._ih_im, hi._iw_re, hi._iw_im)
    pal = PallasDFTConv(*facts)
    pal_hi = PallasDFTConv(*facts, precision=jax.lax.Precision.HIGHEST)

    ref = np.asarray(jax.jit(hi)(x))
    scale = np.abs(ref).max()

    variants = {"xla dft_hi": hi, "xla dft(bf16)": lo,
                "pallas": pal, "pallas HIGHEST": pal_hi}
    for name, f in variants.items():
        fj = jax.jit(f)
        t, out = timed(fj, x, repeats=10)
        err = np.abs(np.asarray(out) - ref).max() / scale

        def loss(xx, f=f):
            return jnp.sum(f(xx) ** 2)

        g = jax.jit(jax.grad(loss))
        tg, _ = timed(g, x, repeats=10)
        print(f"{name:15s}: fwd {t*1e3:7.2f} ms  fwd+grad {tg*1e3:7.2f} ms  "
              f"rel err vs hi {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
