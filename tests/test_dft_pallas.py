"""Pallas DFT-conv kernel vs the XLA einsum DFT path (interpret mode on CPU).

On CPU both paths run f32-exact matmuls, so they must agree tightly; the
VJP goes through the transposed factor set and is checked against AD of the
XLA path. (On TPU the kernel replaces the einsum path inside PSFConv's dft
mode; numerics there are covered by scripts/bench_dft_pallas.py.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigalens_tpu.ops.pallas.dft_conv import PallasDFTConv
from gigalens_tpu.ops.psf import PSFConv


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    kern = rng.random((9, 9)).astype(np.float32)
    kern /= kern.sum()
    conv = PSFConv(kern, (40, 40), mode="dft", pool=2, pallas=False)
    pal = PallasDFTConv(
        conv._fh_re, conv._fh_im, conv._fw_re, conv._fw_im,
        conv._k_re, conv._k_im, conv._ih_re, conv._ih_im,
        conv._iw_re, conv._iw_im, interpret=True,
    )
    x = jnp.asarray(rng.standard_normal((5, 40, 40)).astype(np.float32))
    return conv, pal, x


def test_forward_matches_xla_dft(setup):
    conv, pal, x = setup
    ref = np.asarray(conv(x))
    out = np.asarray(pal(x))
    assert out.shape == ref.shape == (5, 20, 20)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4 * np.abs(ref).max())


def test_vjp_matches_xla_ad(setup):
    conv, pal, x = setup
    rng = np.random.default_rng(1)
    ct = jnp.asarray(rng.standard_normal((5, 20, 20)).astype(np.float32))
    _, vjp_ref = jax.vjp(conv, x)
    (g_ref,) = vjp_ref(ct)
    _, vjp_p = jax.vjp(pal, x)
    (g,) = vjp_p(ct)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref),
        rtol=1e-4, atol=1e-4 * np.abs(np.asarray(g_ref)).max(),
    )


def test_odd_batch_padding(setup):
    conv, pal, x = setup
    out = np.asarray(pal(x[:3]))
    ref = np.asarray(conv(x[:3]))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4 * np.abs(ref).max())
