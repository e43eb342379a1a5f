"""Pallas TPU kernel: VMEM-resident DFT-by-matmul PSF convolution.

The XLA DFT path (:class:`gigalens_tpu.ops.psf.PSFConv`, ``mode="dft"``)
lowers to five batched einsums with (bs, fh, fw) complex intermediates
materialized in HBM between them — at the benchmark scale (bs=1000,
160x160 images, fshape 192x192) that is ~1.5 GB of traffic per call for
only ~0.1 TFLOP of matmul work, i.e. purely bandwidth-bound (measured
10.3 ms forward on v5e, ~15x off the compute roofline).

This kernel runs the whole per-sample chain

    out = Re[ Ih @ ((Fh @ x @ FwT) * K) @ IwT ]

inside VMEM: one HBM read of the input tile, one HBM write of the output
tile, all five stages on the MXU back-to-back. The factor matrices are the
same ones PSFConv precomputes (rectangular forward slices; 'SAME' crop and
supersample average-pool folded into the inverse factors).

The transpose (VJP) of this real-linear map has the identical 5-stage
structure with transposed factors and the SAME spectrum product K:

    bwd(ct) = Re[ Fh^T @ ((Ih^T @ ct @ IwT^T) * K) @ FwT^T ]

so one kernel body serves forward and backward via two factor sets
(convolution is linear — no residuals).

Reference parity: replaces the reference's ``lax.conv`` PSF convolution
(``src/gigalens/jax/simulator.py:133``) on the fast optimizer path; the
numerics match the XLA dft path at Precision.HIGHEST (the MXU accumulates
f32 in-kernel) — i.e. this is *more* exact than the bf16 einsum path it
replaces, and faster.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# samples per grid step: 4 measured best on v5e (fwd+grad 5.5 vs 6.0 ms at
# 8, 6.9 ms at 16 — smaller blocks pipeline the HBM fetches better; 2 is
# within noise of 4)
B_BLK = int(os.environ.get("GIGALENS_DFT_B_BLK", "4"))


def _chain(x, fh_re, fh_im, fwt_re, fwt_im, k_re, k_im,
           ih_re, ih_im, iwt_re, iwt_im, precision=None):
    """One sample: Re[Ih @ ((Fh @ x @ FwT) * K) @ IwT] on the MXU.

    ``precision=None`` uses the MXU's native single-pass (bf16 multiplies,
    f32 accumulate) — the same numerics as the XLA "dft" mode; HIGHEST uses
    multi-pass f32-exact multiplies, matching "dft_hi"."""
    dot = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32, precision=precision
    )
    t1r = dot(x, fwt_re)            # (H, fw)
    t1i = dot(x, fwt_im)
    zr = dot(fh_re, t1r) - dot(fh_im, t1i)   # (fh, fw)
    zi = dot(fh_re, t1i) + dot(fh_im, t1r)
    pr = zr * k_re - zi * k_im
    pi = zr * k_im + zi * k_re
    ur = dot(ih_re, pr) - dot(ih_im, pi)     # (oh, fw)
    ui = dot(ih_re, pi) + dot(ih_im, pr)
    return dot(ur, iwt_re) - dot(ui, iwt_im)  # (oh, ow), real part


def _dft_kernel(x_ref, fh_re, fh_im, fwt_re, fwt_im, k_re, k_im,
                ih_re, ih_im, iwt_re, iwt_im, out_ref, *, precision):
    for b in range(x_ref.shape[0]):
        out_ref[b] = _chain(
            x_ref[b], fh_re[:], fh_im[:], fwt_re[:], fwt_im[:],
            k_re[:], k_im[:], ih_re[:], ih_im[:], iwt_re[:], iwt_im[:],
            precision=precision,
        )


def _run(x, mats, out_hw, interpret, precision=None):
    """x: (bs, H, W) f32; mats: 10 factor matrices; returns (bs, oh, ow)."""
    bs, h, w = x.shape
    oh, ow = out_hw
    nb = -(-bs // B_BLK)
    bs_p = nb * B_BLK
    if bs_p != bs:
        x = jnp.concatenate([x, jnp.zeros((bs_p - bs, h, w), x.dtype)])

    def const_spec(m):
        return pl.BlockSpec(m.shape, lambda b: (0,) * m.ndim,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_dft_kernel, precision=precision),
        grid=(nb,),
        in_specs=[pl.BlockSpec((B_BLK, h, w), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [const_spec(m) for m in mats],
        out_specs=pl.BlockSpec((B_BLK, oh, ow), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs_p, oh, ow), jnp.float32),
        interpret=interpret,
    )(x, *mats)
    return out[:bs]


class PallasDFTConv:
    """Drop-in compute core for PSFConv's dft mode on TPU.

    Built from the same numpy factors PSFConv precomputes. ``__call__``
    maps (bs, H, W) -> (bs, out_h, out_w) with a custom VJP whose backward
    runs the transposed factor set through the same kernel.
    """

    def __init__(self, fh_re, fh_im, fw_re, fw_im, k_re, k_im,
                 ih_re, ih_im, iw_re, iw_im, interpret: bool = False,
                 precision=None):
        def j(a):
            return jnp.asarray(np.ascontiguousarray(a, np.float32))

        # forward factor set: Fh (fh,H), FwT (W,fw), K (fh,fw),
        # Ih (oh,fh), IwT (fw,ow)
        self._fwd = (
            j(fh_re), j(fh_im), j(fw_re.T), j(fw_im.T), j(k_re), j(k_im),
            j(ih_re), j(ih_im), j(iw_re.T), j(iw_im.T),
        )
        # transpose set: "Fh" = Ih^T (fh,oh), "FwT" = IwT^T = Iw (ow,fw),
        # K unchanged, "Ih" = Fh^T (H,fh), "IwT" = FwT^T (fw,W)
        self._bwd = (
            j(ih_re.T), j(ih_im.T), j(iw_re), j(iw_im), j(k_re), j(k_im),
            j(fh_re.T), j(fh_im.T), j(fw_re), j(fw_im),
        )
        self.in_hw = (fh_re.shape[1], fw_re.shape[1])
        self.out_hw = (ih_re.shape[0], iw_re.shape[0])
        self._interpret = interpret

        fwd_m, bwd_m, in_hw, out_hw = self._fwd, self._bwd, self.in_hw, self.out_hw

        @functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
        def conv(x, interpret, precision):
            return _run(x, fwd_m, out_hw, interpret, precision)

        def conv_fwd(x, interpret, precision):
            return _run(x, fwd_m, out_hw, interpret, precision), None

        def conv_bwd(interpret, precision, _, ct):
            return (_run(ct, bwd_m, in_hw, interpret, precision),)

        conv.defvjp(conv_fwd, conv_bwd)
        self._conv = conv
        self._precision = precision

    def __call__(self, x):
        return self._conv(x, self._interpret, self._precision)
