"""DFT-conv layout experiment: batched einsum vs single-big-matmul stages.

The production `_dft_conv` uses batched einsums ("ij,njk->nik" etc.). This
times an alternative that keeps every stage a single 2D (M,K)@(K,N) matmul
with the batch folded into columns (explicit transposes between stages),
which maps better onto the MXU when the per-image matrices are small.

    python scripts/bench_conv_layouts.py [n]
"""
import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import sys

import numpy as np


def big_matmul_conv(conv, x):
    """conv: a PSFConv(mode='dft'); x: (n, H, W) -> (n, out_h, out_w).

    Same linear map as conv._dft_conv, all stages as 2D matmuls with the
    batch folded into the column dimension.
    """
    import jax.numpy as jnp

    n, H, W = x.shape
    fh, fw = conv.fshape
    oh, ow = conv.out_h, conv.out_w

    # stage 1 (rows): (fh,H) @ (H, n*W)
    t = jnp.transpose(x, (1, 0, 2)).reshape(H, n * W)
    yr = conv._fh_re @ t
    yi = conv._fh_im @ t
    # rearrange to (W, n*fh) for the column stage
    yr = jnp.transpose(yr.reshape(fh, n, W), (2, 1, 0)).reshape(W, n * fh)
    yi = jnp.transpose(yi.reshape(fh, n, W), (2, 1, 0)).reshape(W, n * fh)
    # stage 2 (cols): (fw,W) @ (W, n*fh) -> layout (fw, n, fh)
    zr = conv._fw_re @ yr - conv._fw_im @ yi
    zi = conv._fw_im @ yr + conv._fw_re @ yi
    # spectrum product in (fw, n, fh) layout
    kr = conv._k_re.T[:, None, :]
    ki = conv._k_im.T[:, None, :]
    zr3 = zr.reshape(fw, n, fh)
    zi3 = zi.reshape(fw, n, fh)
    pr = zr3 * kr - zi3 * ki
    pi = zr3 * ki + zi3 * kr
    # stage 3 (inverse rows, fh-contraction): (oh,fh) @ (fh, n*fw)
    pr = jnp.transpose(pr, (2, 1, 0)).reshape(fh, n * fw)
    pi = jnp.transpose(pi, (2, 1, 0)).reshape(fh, n * fw)
    ur = conv._ih_re @ pr - conv._ih_im @ pi
    ui = conv._ih_re @ pi + conv._ih_im @ pr
    # stage 4 (inverse cols): (ow,fw) @ (fw, n*oh)
    ur = jnp.transpose(ur.reshape(oh, n, fw), (2, 1, 0)).reshape(fw, n * oh)
    ui = jnp.transpose(ui.reshape(oh, n, fw), (2, 1, 0)).reshape(fw, n * oh)
    out = conv._iw_re @ ur - conv._iw_im @ ui  # (ow, n*oh)
    return jnp.transpose(out.reshape(ow, n, oh), (1, 2, 0))


def main():
    import jax

    from gigalens_tpu.utils.aot import setup_compilation_cache as _scc; _scc()
    import jax.numpy as jnp

    from gigalens_tpu.ops.psf import PSFConv
    from gigalens_tpu.utils.profiling import timed

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    rng = np.random.default_rng(0)
    k = rng.random((27, 27)).astype(np.float32)
    k /= k.sum()
    conv = PSFConv(k, (160, 160), mode="dft", pool=2)
    x = jnp.asarray(rng.normal(size=(n, 160, 160)).astype(np.float32))

    f_ein = jax.jit(conv)
    f_big = jax.jit(lambda xx: big_matmul_conv(conv, xx))

    a = np.asarray(f_ein(x))
    b = np.asarray(f_big(x))
    err = np.abs(a - b).max() / np.abs(a).max()
    print(f"rel err einsum vs big: {err:.2e}", flush=True)

    t, _ = timed(f_ein, x, repeats=10)
    print(f"einsum  fwd      : {t*1e3:7.2f} ms", flush=True)
    t, _ = timed(f_big, x, repeats=10)
    print(f"bigmm   fwd      : {t*1e3:7.2f} ms", flush=True)

    g_ein = jax.jit(jax.grad(lambda xx: jnp.sum(conv(xx) ** 2)))
    g_big = jax.jit(jax.grad(lambda xx: jnp.sum(big_matmul_conv(conv, xx) ** 2)))
    t, _ = timed(g_ein, x, repeats=10)
    print(f"einsum  fwd+grad : {t*1e3:7.2f} ms", flush=True)
    t, _ = timed(g_big, x, repeats=10)
    print(f"bigmm   fwd+grad : {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
