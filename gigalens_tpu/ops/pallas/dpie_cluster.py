"""Pallas TPU kernel: fused dPIE cluster-member deflection sum.

The cluster hot loop is alpha(p) = sum_g dpie_deflection(p; galaxy g) over
hundreds of member galaxies and tens of thousands of (supersampled) pixels,
batched over samples. The XLA path (``profiles/mass/scaling.py``) materializes
``(bs, chunk, npix)`` intermediates between the elementwise profile math and
the galaxy reduction; this kernel keeps the whole tile in VMEM and writes only
the reduced ``(bs, npix)`` output to HBM.

Tiling: grid over (8-sample block, pixel tile); samples ride the 8-sublane
axis ((8, 1) scaled parameters broadcast against (1, PIX_BLK) coordinates),
pixels the 128-lane axis. The galaxy loop is a ``fori_loop`` over the
catalogue with per-galaxy scalars read from SMEM.

Gradients: custom VJP — theta_E scaling is linear (grad = out/theta), and the
(r_core, r_cut) scaling directions come from a second kernel evaluating
``jax.jvp`` of the block function inside the kernel.

Kernel-portable math: ``atan2`` does not lower in Mosaic and is replaced by
:mod:`gigalens_tpu.ops.pallas._math`.

STATUS (v5e, G=200, P=25600, bs=64, in-process A/B): the XLA scaling path
with chunk rematerialization runs 13.4 ms fwd / 22 ms fwd+grad vs this
kernel's 27.6 / 81.6 ms — the sequential per-galaxy loop underutilizes the
VPU while XLA fuses whole chunks. The kernel therefore stays opt-in
(DPIESubhaloPallas); the production-fast cluster path is the Taylor-series
stack (5.9 / 3.9 ms after precompute, profiles/mass/series.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gigalens_tpu.ops.pallas._math import atan2 as _atan2

PIX_BLK = 512
S_BLK = 8       # samples per block (sublane axis)
S_PAD = 128     # scales row padded to a full lane vector
N_GCOLS = 8     # galaxy table columns


def _dpie_alpha_block(x, y, theta, rcore, rcut, e, phi):
    """Ellipse-frame dPIE deflection for an (S_BLK, PIX_BLK) block.

    x, y: (1, PIX_BLK) pixel coords already offset by the galaxy center
    theta, rcore, rcut: (S_BLK, 1) per-sample scaled parameters
    e, phi: scalars (per-galaxy shape)
    Returns (alpha_x, alpha_y), each (S_BLK, PIX_BLK), in the sky frame.
    """
    cos_p = jnp.cos(phi)
    sin_p = jnp.sin(phi)
    xr = x * cos_p + y * sin_p
    yr = -x * sin_p + y * cos_p

    e = jnp.clip(e, 1e-6, 0.9999)  # sqe>0 keeps the formula total
    # core < cut guard (keeps padded zero-parameter galaxies finite; their
    # theta = 0 zeroes the contribution exactly)
    rcore = jnp.maximum(rcore, 1e-4)
    rcut = jnp.maximum(rcut, rcore + 1e-4)
    q = (1.0 - e) / (1.0 + e)
    sqe = jnp.sqrt(e)
    rem2 = xr**2 / (1.0 + e) ** 2 + yr**2 / (1.0 - e) ** 2

    a = q * xr
    b_core = 2.0 * sqe * jnp.sqrt(rcore**2 + rem2) - yr / q
    b_cut = 2.0 * sqe * jnp.sqrt(rcut**2 + rem2) - yr / q
    c = xr
    d_core = 2.0 * rcore * sqe - yr
    d_cut = 2.0 * rcut * sqe - yr

    top_re = a * c - b_core * d_cut
    top_im = a * d_cut + b_core * c
    bot_re = a * c - b_cut * d_core
    bot_im = a * d_core + b_cut * c

    bot2 = bot_re**2 + bot_im**2
    z_re = (top_re * bot_re + top_im * bot_im) / bot2
    z_im = (top_im * bot_re - top_re * bot_im) / bot2

    log_re = 0.5 * jnp.log(z_re**2 + z_im**2)
    log_im = _atan2(z_im, z_re)

    pref = -0.5 * (1.0 - e**2) / sqe
    scale = theta * rcut / (rcut - rcore)
    ax = scale * (-pref) * log_im
    ay = scale * pref * log_re
    # rotate back to the sky frame
    return ax * cos_p - ay * sin_p, ax * sin_p + ay * cos_p


def _gal_scalars(gal_ref, g):
    cx = gal_ref[g, 0]
    cy = gal_ref[g, 1]
    e = gal_ref[g, 2]
    phi = gal_ref[g, 3]
    u_t = gal_ref[g, 4]
    u_rc = gal_ref[g, 5]
    u_rs = gal_ref[g, 6]
    return cx, cy, e, phi, u_t, u_rc, u_rs


def _kernel(scales_ref, gal_ref, x_ref, y_ref, out_x_ref, out_y_ref, *, n_gal):
    """One (sample-block, pixel tile) cell: sum over all galaxies."""
    theta_s = scales_ref[:, 0:1]   # (S_BLK, 1)
    rcore_s = scales_ref[:, 1:2]
    rcut_s = scales_ref[:, 2:3]
    x = x_ref[:]  # (1, PIX_BLK)
    y = y_ref[:]

    def body(g, acc):
        acc_x, acc_y = acc
        cx, cy, e, phi, u_t, u_rc, u_rs = _gal_scalars(gal_ref, g)
        ax, ay = _dpie_alpha_block(
            x - cx, y - cy, theta_s * u_t, rcore_s * u_rc, rcut_s * u_rs, e, phi
        )
        return acc_x + ax, acc_y + ay

    zero = jnp.zeros((S_BLK, PIX_BLK), jnp.float32)
    acc_x, acc_y = jax.lax.fori_loop(0, n_gal, body, (zero, zero))
    out_x_ref[:] = acc_x
    out_y_ref[:] = acc_y


def _kernel_jvp(scales_ref, gal_ref, x_ref, y_ref,
                oxa_ref, oya_ref, oxs_ref, oys_ref, *, n_gal):
    """Directional derivatives w.r.t. the global r_core (a) and r_cut (s)
    scalings via jax.jvp of the block function, traced inside the kernel."""
    theta_s = scales_ref[:, 0:1]
    rcore_s = scales_ref[:, 1:2]
    rcut_s = scales_ref[:, 2:3]
    x = x_ref[:]
    y = y_ref[:]

    def body(g, acc):
        axa, aya, axs, ays = acc
        cx, cy, e, phi, u_t, u_rc, u_rs = _gal_scalars(gal_ref, g)
        primals = (x - cx, y - cy, theta_s * u_t, rcore_s * u_rc, rcut_s * u_rs,
                   e, phi)
        z = [jnp.zeros_like(p) for p in primals]
        ta = tuple(z[:3] + [u_rc * jnp.ones_like(primals[3])] + z[4:])
        _, (dxa, dya) = jax.jvp(_dpie_alpha_block, primals, ta)
        ts = tuple(z[:4] + [u_rs * jnp.ones_like(primals[4])] + z[5:])
        _, (dxs, dys) = jax.jvp(_dpie_alpha_block, primals, ts)
        return axa + dxa, aya + dya, axs + dxs, ays + dys

    zero = jnp.zeros((S_BLK, PIX_BLK), jnp.float32)
    axa, aya, axs, ays = jax.lax.fori_loop(0, n_gal, body, (zero,) * 4)
    oxa_ref[:] = axa
    oya_ref[:] = aya
    oxs_ref[:] = axs
    oys_ref[:] = ays


def _pad_to(arr, n, axis=0, value=0.0):
    pad = n - arr.shape[axis]
    if pad <= 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths, constant_values=value)


def _prep(scales, galaxy_table, x, y):
    bs = scales.shape[0]
    n_sblk = -(-bs // S_BLK)
    bs_p = n_sblk * S_BLK
    scales_p = _pad_to(scales.astype(jnp.float32), S_PAD, axis=1)
    scales_p = _pad_to(scales_p, bs_p, axis=0, value=1.0)
    P = x.shape[0]
    n_tiles = -(-P // PIX_BLK)
    Pp = n_tiles * PIX_BLK
    xp = _pad_to(x.astype(jnp.float32), Pp).reshape(1, Pp)
    yp = _pad_to(y.astype(jnp.float32), Pp).reshape(1, Pp)
    gal = galaxy_table.astype(jnp.float32)
    return bs, bs_p, n_sblk, P, n_tiles, Pp, xp, yp, gal, scales_p


def _specs():
    in_specs = [
        pl.BlockSpec((S_BLK, S_PAD), lambda b, p: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # whole galaxy table, scalars
        pl.BlockSpec((1, PIX_BLK), lambda b, p: (0, p), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, PIX_BLK), lambda b, p: (0, p), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec(
        (S_BLK, PIX_BLK), lambda b, p: (b, p), memory_space=pltpu.VMEM
    )
    return in_specs, out_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def dpie_cluster_deriv(scales, galaxy_table, x, y, interpret: bool = False):
    """Summed dPIE member deflection.

    scales: (bs, 3) global (theta_E, r_core, r_cut) scalings
    galaxy_table: (G, 8) columns [cx, cy, e, phi, u_theta, u_rcore, u_rcut, pad]
        where u_* are the per-galaxy luminosity-scaling multipliers; padded
        galaxies must have u_theta == 0.
    x, y: (P,) pixel coordinates
    Returns (alpha_x, alpha_y), each (bs, P).
    """
    bs, bs_p, n_sblk, P, n_tiles, Pp, xp, yp, gal, scales_p = _prep(
        scales, galaxy_table, x, y
    )
    in_specs, out_spec = _specs()
    out_shape = tuple(jax.ShapeDtypeStruct((bs_p, Pp), jnp.float32) for _ in range(2))
    ax, ay = pl.pallas_call(
        functools.partial(_kernel, n_gal=gal.shape[0]),
        grid=(n_sblk, n_tiles),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=out_shape,
        interpret=interpret,
    )(scales_p, gal, xp, yp)
    return ax[:bs, :P], ay[:bs, :P]


def _deriv_fwd(scales, galaxy_table, x, y, interpret=False):
    out = dpie_cluster_deriv(scales, galaxy_table, x, y, interpret)
    return out, (scales, galaxy_table, x, y, out)


def _deriv_bwd(interpret, res, ct):
    scales, galaxy_table, x, y, (ax, ay) = res
    ct_x, ct_y = ct
    bs, bs_p, n_sblk, P, n_tiles, Pp, xp, yp, gal, scales_p = _prep(
        scales, galaxy_table, x, y
    )
    in_specs, out_spec = _specs()
    out_shape = tuple(jax.ShapeDtypeStruct((bs_p, Pp), jnp.float32) for _ in range(4))
    dxa, dya, dxs, dys = pl.pallas_call(
        functools.partial(_kernel_jvp, n_gal=gal.shape[0]),
        grid=(n_sblk, n_tiles),
        in_specs=in_specs,
        out_specs=(out_spec,) * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(scales_p, gal, xp, yp)
    dxa, dya, dxs, dys = (v[:bs, :P] for v in (dxa, dya, dxs, dys))

    # theta scaling is linear: d out / d theta_s = out / theta_s
    g_t = jnp.sum(ct_x * ax + ct_y * ay, axis=-1) / scales[:, 0]
    g_a = jnp.sum(ct_x * dxa + ct_y * dya, axis=-1)
    g_s = jnp.sum(ct_x * dxs + ct_y * dys, axis=-1)
    g_scales = jnp.stack([g_t, g_a, g_s], axis=-1)
    return (g_scales, jnp.zeros_like(galaxy_table), jnp.zeros_like(x), jnp.zeros_like(y))


dpie_cluster_deriv.defvjp(_deriv_fwd, _deriv_bwd)


def make_galaxy_table(catalogue, lum_star, powers):
    """Builds the (G, 8) galaxy table from a catalogue dict (host-side)."""
    lum = np.asarray(catalogue["lum"], np.float32)
    e1 = np.asarray(catalogue["e1"], np.float32)
    e2 = np.asarray(catalogue["e2"], np.float32)
    phi = np.arctan2(e2, e1) / 2.0
    e = np.minimum(np.sqrt(e1**2 + e2**2), 0.9999)
    rel = lum / float(lum_star)
    table = np.stack(
        [
            np.asarray(catalogue["center_x"], np.float32),
            np.asarray(catalogue["center_y"], np.float32),
            e.astype(np.float32),
            phi.astype(np.float32),
            rel ** powers["theta_E"],
            rel ** powers["r_core"],
            rel ** powers["r_cut"],
            np.zeros_like(lum),
        ],
        axis=1,
    )
    return table.astype(np.float32)
