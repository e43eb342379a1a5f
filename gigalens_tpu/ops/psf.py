"""PSF handling: subgrid resampling (host-side) and batched convolution.

Replaces two reference dependencies:
  * lenstronomy's ``subgrid_kernel`` (used at ``src/gigalens/jax/simulator.py:61``)
    -> :func:`subgrid_kernel`, a host-side numpy/scipy resampler with iterative
    flux correction.
  * ``lax.conv`` direct PSF convolution (``jax/simulator.py:133``)
    -> :func:`PSFConv`, which precomputes the kernel's rFFT once and convolves
    the whole sample batch with two batched FFTs. For the reference benchmark
    scene (supersampled 120x120 images, ~50x50 supersampled kernel, bs≈500)
    direct convolution costs ~1.9e10 MACs per forward pass while the FFT path
    costs ~1e8 flops — FFT is the TPU-friendly choice (BASELINE.json north
    star). A direct ``lax.conv_general_dilated`` path is kept for small kernels
    and for numerics cross-checks.
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp
from jax import lax


# --------------------------------------------------------------------------
# Host-side kernel preparation
# --------------------------------------------------------------------------

def _bilinear_resample(kernel: np.ndarray, factor: int, odd: bool = True) -> np.ndarray:
    """Bilinear interpolation of ``kernel`` onto a grid ``factor``x finer.

    The output grid is centered on the input grid's center; output size is
    ``factor * n`` (forced to the nearest odd size when ``odd``).
    """
    n = kernel.shape[0]
    m = factor * n
    if odd and m % 2 == 0:
        m += 1
    # Coordinates of the fine grid in units of coarse pixels, center-aligned.
    c_in = (n - 1) / 2.0
    c_out = (m - 1) / 2.0
    coords = (np.arange(m) - c_out) / factor + c_in
    x0 = np.clip(np.floor(coords).astype(int), 0, n - 2)
    w = coords - x0
    w = np.clip(w, 0.0, 1.0)

    # separable bilinear interpolation
    rows = kernel[x0, :] * (1 - w)[:, None] + kernel[x0 + 1, :] * w[:, None]
    out = rows[:, x0] * (1 - w)[None, :] + rows[:, x0 + 1] * w[None, :]
    return out


def _downsample_sum(kernel: np.ndarray, factor: int) -> np.ndarray:
    """Sums ``factor x factor`` blocks centered on the kernel center."""
    m = kernel.shape[0]
    n = m // factor
    if n * factor != m:
        pad = (n + 1) * factor - m
        lo = pad // 2
        hi = pad - lo
        kernel = np.pad(kernel, ((lo, hi), (lo, hi)))
        n += 1
    return kernel.reshape(n, factor, n, factor).sum(axis=(1, 3))


def subgrid_kernel(
    kernel: np.ndarray, factor: int, odd: bool = True, num_iter: int = 5
) -> np.ndarray:
    """Resamples a native-pixel PSF kernel onto a ``factor``x supersampled grid.

    Flux-conserving: iteratively corrects the interpolated kernel so that
    block-summing it back to the native grid reproduces the input kernel
    (the same contract as lenstronomy's ``subgrid_kernel``, re-implemented).
    """
    kernel = np.asarray(kernel, np.float64)
    kernel = kernel / kernel.sum()
    if factor == 1:
        return kernel.astype(np.float32)

    fine = _bilinear_resample(kernel, factor, odd=odd)
    fine = np.clip(fine, 0, None)
    fine /= fine.sum()

    for _ in range(num_iter):
        coarse = _downsample_sum(fine, factor)
        # align coarse grid back onto the input kernel's support
        cc = coarse.shape[0]
        if cc > kernel.shape[0]:
            trim = (cc - kernel.shape[0]) // 2
            coarse_c = coarse[trim : trim + kernel.shape[0], trim : trim + kernel.shape[0]]
        else:
            coarse_c = coarse
        ratio = kernel / np.maximum(coarse_c, 1e-12)
        correction = _bilinear_resample(ratio, factor, odd=odd)
        if correction.shape != fine.shape:
            t = (correction.shape[0] - fine.shape[0]) // 2
            correction = correction[t : t + fine.shape[0], t : t + fine.shape[0]]
        fine = np.clip(fine * correction, 0, None)
        fine /= fine.sum()
    return fine.astype(np.float32)


def _good_fft_size(n: int) -> int:
    """Next 5-smooth ("regular") integer >= n; XLA FFT likes small prime radix."""
    if n <= 2:
        return max(n, 1)
    best = 1 << (n - 1).bit_length()  # next power of two as the fallback
    p5 = 1
    while p5 <= best:
        p35 = p5
        while p35 <= best:
            m = p35
            while m < n:
                m *= 2
            best = min(best, m)
            p35 *= 3
        p5 *= 5
    return best


# --------------------------------------------------------------------------
# Device-side convolution
# --------------------------------------------------------------------------

class PSFConv:
    """Batched 2-D convolution of (bs, H, W) images with a fixed kernel.

    mode="fft": zero-padded linear convolution via rFFT with the kernel
    transform precomputed at construction. mode="direct": XLA convolution.
    Both produce 'SAME'-size output with true convolution orientation
    (kernel flipped), matching the reference's ``lax.conv`` usage.

    A stacked ``(S, kh, kw)`` kernel enables **per-scene convolution** for
    survey/catalogue batches: ``__call__`` then interprets its batch axis as
    scene-major ``(S * K, H, W)`` and convolves each scene's ``K`` samples
    with that scene's kernel (fft and dft modes; real survey cutouts have
    per-scene PSFs — the reference has no counterpart). Only the spectrum
    product is per-scene; the DFT factor matrices are shared, so the extra
    cost is one (S, fh, fw) constant.
    """

    def __init__(self, kernel: np.ndarray, img_shape, mode: str = "fft",
                 pool: int = 1, pallas=None):
        self.kernel = np.asarray(kernel, np.float32)
        self.n_scenes = self.kernel.shape[0] if self.kernel.ndim == 3 else None
        self.kh, self.kw = self.kernel.shape[-2:]
        self.h, self.w = int(img_shape[0]), int(img_shape[1])
        # "dft_hi" = the dft matmul path with Precision.HIGHEST einsums: XLA's
        # single-pass TPU matmul truncates f32 inputs to bf16 (~0.3 nats of
        # likelihood noise — fine for Adam/ELBO, fatal for MH acceptance); the
        # 3-pass variant is f32-exact and still far faster than the VPU FFT.
        self.precision = None
        if mode == "dft_hi":
            import jax

            mode = "dft"
            self.precision = jax.lax.Precision.HIGHEST
        self.mode = mode
        # pool > 1 (dft mode only) folds the trailing average-pool into the
        # inverse transform: the conv then emits (H/pool, W/pool) directly.
        self.pool = int(pool) if mode == "dft" else 1

        if mode == "dft":
            # DFT-by-matmul: XLA's TPU FFT runs on the VPU and costs ~200us
            # per 192x192 image; expressing the transform as dense DFT-matrix
            # matmuls runs on the MXU at a small fraction of that. All
            # factors are real numpy pairs (the axon backend cannot move
            # complex64 across the host boundary).
            #
            # The factors are shaped to do no wasted work: the forward
            # matrices are rectangular (fh, H) / (fw, W) slices (the zero
            # padding contributes nothing), and the inverse matrices fold in
            # the 'SAME' crop and, when ``pool`` > 1, the average-pool —
            # both are linear row/column selections of the full inverse DFT.
            fh = _good_fft_size(self.h + self.kh - 1)
            fw = _good_fft_size(self.w + self.kw - 1)
            self.fshape = (fh, fw)
            kstack = self.kernel[None] if self.n_scenes is None else self.kernel
            kpad = np.zeros((kstack.shape[0], fh, fw), np.float32)
            kpad[:, : self.kh, : self.kw] = kstack
            kfft = np.fft.fft2(kpad.astype(np.float64))
            self._k_re = kfft.real.astype(np.float32)
            self._k_im = kfft.imag.astype(np.float32)
            if self.n_scenes is None:
                self._k_re, self._k_im = self._k_re[0], self._k_im[0]

            def dft(n):
                w = np.exp(-2j * np.pi * np.outer(np.arange(n), np.arange(n)) / n)
                return w

            oy, ox = self.kh // 2, self.kw // 2
            p = self.pool
            if p > 1 and (self.h % p or self.w % p):
                raise ValueError("pool must divide the image shape")

            def fold(inv, off, size):
                """Crop rows [off, off+size) and mean-pool blocks of p."""
                sel = inv[off : off + size]
                if p == 1:
                    return sel
                return sel.reshape(size // p, p, -1).mean(axis=1)

            Fh = dft(fh)
            Fw = dft(fw)
            self._fh_re = Fh.real[:, : self.h].astype(np.float32).copy()
            self._fh_im = Fh.imag[:, : self.h].astype(np.float32).copy()
            self._fw_re = Fw.real[:, : self.w].astype(np.float32).copy()
            self._fw_im = Fw.imag[:, : self.w].astype(np.float32).copy()
            # inverse DFT = conj(F)/n, with crop (+pool) folded in
            self._ih_re = fold(Fh.real / fh, oy, self.h).astype(np.float32)
            self._ih_im = fold(-Fh.imag / fh, oy, self.h).astype(np.float32)
            self._iw_re = fold(Fw.real / fw, ox, self.w).astype(np.float32)
            self._iw_im = fold(-Fw.imag / fw, ox, self.w).astype(np.float32)
            self.out_h, self.out_w = self.h // p, self.w // p

            # Pallas VMEM-resident kernel for the same factor chain: one HBM
            # read + one write per sample instead of five einsum round-trips
            # (2.6x fwd+grad on v5e, see ops/pallas/dft_conv.py). First-order
            # AD only (custom VJP): code needing higher-order AD through the
            # conv should set pallas=False or use the fft mode.
            self._pallas = None
            if pallas is None:
                import jax

                pallas = (
                    jax.default_backend() == "tpu"
                    and os.environ.get("GIGALENS_PALLAS_CONV", "1") == "1"
                )
            if self.n_scenes is not None:
                # per-scene spectra: XLA dft path (the Pallas kernel takes a
                # single spectrum constant; extend with a scene-indexed
                # operand if survey fast-path profiling demands it)
                pallas = False
            if pallas:
                from gigalens_tpu.ops.pallas.dft_conv import PallasDFTConv

                self._pallas = PallasDFTConv(
                    self._fh_re, self._fh_im, self._fw_re, self._fw_im,
                    self._k_re, self._k_im, self._ih_re, self._ih_im,
                    self._iw_re, self._iw_im, precision=self.precision,
                )
            return

        if mode == "fft":
            fh = _good_fft_size(self.h + self.kh - 1)
            fw = _good_fft_size(self.w + self.kw - 1)
            self.fshape = (fh, fw)
            kstack = self.kernel[None] if self.n_scenes is None else self.kernel
            kpad = np.zeros((kstack.shape[0], fh, fw), np.float32)
            kpad[:, : self.kh, : self.kw] = kstack
            # Stored as real/imag numpy pairs and recombined in-graph: the
            # axon TPU backend cannot transfer complex64 host<->device, so a
            # complex closure constant would fail at jit lowering.
            kfft = np.fft.rfft2(kpad.astype(np.float64)).astype(np.complex64)
            if self.n_scenes is None:
                kfft = kfft[0]
            self._kfft_re = np.ascontiguousarray(kfft.real)
            self._kfft_im = np.ascontiguousarray(kfft.imag)
            # 'SAME' crop offsets matching XLA's flipped-kernel convolution
            # (pad_hi = k//2; identical to (k-1)//2 for odd kernels)
            self._oy = self.kh // 2
            self._ox = self.kw // 2
        else:
            if self.n_scenes is not None:
                raise NotImplementedError(
                    "per-scene PSF kernels support mode='fft' or 'dft'; "
                    "use one of those for survey batches"
                )
            # OIHW kernel, flipped for true convolution
            self._k = jnp.asarray(self.kernel[::-1, ::-1][None, None])

    # XLA TPU batched FFTs are silently WRONG above ~768 batch elements
    # (empirically: exact at 768, corrupted at 896+ on v5e/axon). Chunk well
    # below the cliff.
    MAX_FFT_BATCH = 512

    def _fft_conv(self, x, k_re=None, k_im=None):
        """x: (..., H, W); spectrum (broadcastable to the rfft2 of x)."""
        if k_re is None:
            k_re, k_im = self._kfft_re, self._kfft_im
        xf = jnp.fft.rfft2(x, s=self.fshape)
        kfft = lax.complex(jnp.asarray(k_re), jnp.asarray(k_im))
        out = jnp.fft.irfft2(xf * kfft, s=self.fshape)
        return out[..., self._oy : self._oy + self.h, self._ox : self._ox + self.w]

    def _dft_conv(self, x):
        """Linear convolution via dense DFT matmuls (all-real arithmetic).

        x: (n, H, W). The rectangular forward factors implicitly zero-pad to
        fshape; the inverse factors fold the 'SAME' crop (and optional
        average-pool), emitting (n, out_h, out_w) directly.
        """
        import functools

        ein = functools.partial(jnp.einsum, precision=self.precision)
        # rows: Y = F_h[:, :H] @ X -> (n, fh, W)
        yr = ein("ij,njk->nik", self._fh_re, x)
        yi = ein("ij,njk->nik", self._fh_im, x)
        # cols: Z = Y @ F_w[:, :W]^T -> (n, fh, fw)
        zr = ein("nik,jk->nij", yr, self._fw_re) - ein("nik,jk->nij", yi, self._fw_im)
        zi = ein("nik,jk->nij", yr, self._fw_im) + ein("nik,jk->nij", yi, self._fw_re)
        # spectrum product (per-scene when the kernel carries a scene axis)
        if self.n_scenes is not None:
            S = self.n_scenes
            z4 = zr.reshape(S, -1, *zr.shape[1:])
            w4 = zi.reshape(S, -1, *zi.shape[1:])
            kr, ki = self._k_re[:, None], self._k_im[:, None]
            pr = (z4 * kr - w4 * ki).reshape(zr.shape)
            pi = (z4 * ki + w4 * kr).reshape(zr.shape)
        else:
            pr = zr * self._k_re - zi * self._k_im
            pi = zr * self._k_im + zi * self._k_re
        # inverse rows (crop/pool folded) -> (n, out_h, fw)
        ur = ein("ij,njk->nik", self._ih_re, pr) - ein("ij,njk->nik", self._ih_im, pi)
        ui = ein("ij,njk->nik", self._ih_re, pi) + ein("ij,njk->nik", self._ih_im, pr)
        # inverse cols (crop/pool folded), real part only -> (n, out_h, out_w)
        return ein("nik,jk->nij", ur, self._iw_re) - ein("nik,jk->nij", ui, self._iw_im)

    def _check_scene_batch(self, n):
        if n % self.n_scenes:
            raise ValueError(
                f"per-scene PSF: batch {n} is not a multiple of "
                f"n_scenes={self.n_scenes} (samples must be scene-major)"
            )
        return n // self.n_scenes

    def __call__(self, img):
        """img: (..., H, W) -> convolved (..., H, W).

        With a per-scene kernel the flattened batch must be scene-major
        ``S * K`` (all of scene 0's samples, then scene 1's, ...).
        """
        if self.mode == "dft":
            batch_shape = img.shape[:-2]
            x = img.reshape((-1, self.h, self.w))
            if self.n_scenes is not None:
                self._check_scene_batch(x.shape[0])
            conv = self._pallas if self._pallas is not None else self._dft_conv
            return conv(x).reshape((*batch_shape, self.out_h, self.out_w))
        if self.mode == "fft":
            batch_shape = img.shape[:-2]
            x = img.reshape((-1, self.h, self.w))
            n = x.shape[0]
            if self.n_scenes is not None:
                # static per-scene slices on the flat batch (a (S, K, fh, fw)
                # reshape feeds XLA's fft thunk a non-dim0-major layout under
                # mesh sharding — RET_CHECK on CPU)
                S = self.n_scenes
                K = self._check_scene_batch(n)
                outs = []
                for s in range(S):
                    xs = x[s * K : (s + 1) * K]
                    kr, ki = self._kfft_re[s], self._kfft_im[s]
                    outs.extend(
                        self._fft_conv(xs[i : i + self.MAX_FFT_BATCH], kr, ki)
                        for i in range(0, K, self.MAX_FFT_BATCH)
                    )
                out = jnp.concatenate(outs)
                return out.reshape((*batch_shape, self.h, self.w))
            if n <= self.MAX_FFT_BATCH:
                out = self._fft_conv(x)
            else:
                out = jnp.concatenate(
                    [
                        self._fft_conv(x[i : i + self.MAX_FFT_BATCH])
                        for i in range(0, n, self.MAX_FFT_BATCH)
                    ]
                )
            return out.reshape((*batch_shape, self.h, self.w))
        batch_shape = img.shape[:-2]
        x = img.reshape((-1, 1, self.h, self.w))
        out = lax.conv_general_dilated(
            x, self._k, (1, 1), padding="SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return out.reshape((*batch_shape, self.h, self.w))


def average_pool(img, factor: int):
    """Non-overlapping mean pooling over the last two axes.

    Equivalent to the reference's ``objax.average_pool_2d`` for inputs whose
    size is divisible by ``factor`` (always true for supersampled renders),
    but implemented as a reshape+mean, which XLA fuses with neighbors instead
    of emitting a pooling convolution.
    """
    if factor == 1:
        return img
    *b, h, w = img.shape
    img = img.reshape(*b, h // factor, factor, w // factor, factor)
    return img.mean(axis=(-3, -1))
