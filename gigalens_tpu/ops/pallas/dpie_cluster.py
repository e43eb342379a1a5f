"""Pallas TPU kernel: fused dPIE cluster-member deflection sum.

The cluster hot loop is alpha(p) = sum_g dpie_deflection(p; galaxy g) over
hundreds of member galaxies and tens of thousands of (supersampled) pixels,
batched over samples. The XLA path (``profiles/mass/scaling.py``) materializes
``(bs, chunk, npix)`` intermediates between the elementwise profile math and
the galaxy reduction; this kernel keeps the whole galaxies x pixels tile in
VMEM and writes only the reduced ``(bs, npix)`` output to HBM.

Tiling: grid over (sample, pixel-tile); pixels are the 128-lane axis, member
galaxies ride the 8-sublane axis in blocks (``(G_BLK, PIX_BLK)`` broadcasts),
and the galaxy-block loop is a ``fori_loop`` accumulating into the output
tile. The galaxy table (a few hundred rows x 7 columns) lives in VMEM whole.

Only the ellipse-frame dPIE formula is fused here (rotation by the galaxy
position angle is part of the math, applied per galaxy inside the kernel).
Gradients: the kernel defines a custom JVP (deflection is linear in theta_E
and the (r_core, r_cut) tangents are computed by jet-free closed-form finite
channels); for the common inference case — MAP/SVI/HMC differentiating w.r.t.
the global (theta_E, r_core, r_cut) scalings — reverse mode reduces to three
extra kernel calls. Use ``deriv_xla`` as the always-available fallback.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PIX_BLK = 128
G_BLK = 8


def _dpie_alpha_block(x, y, theta, rcore, rcut, e, phi):
    """Ellipse-frame dPIE deflection for a (G_BLK, PIX_BLK) block.

    x, y: (1, PIX_BLK) pixel coords already offset by galaxy centers
    theta, rcore, rcut, e, phi: (G_BLK, 1) per-galaxy parameters
    Returns (alpha_x, alpha_y) each (G_BLK, PIX_BLK) in the sky frame.
    """
    cos_p = jnp.cos(phi)
    sin_p = jnp.sin(phi)
    xr = x * cos_p + y * sin_p
    yr = -x * sin_p + y * cos_p

    e = jnp.clip(e, 1e-6, 0.9999)  # sqe>0 keeps the formula total
    # core < cut guard (also keeps padded zero-parameter galaxies finite:
    # theta = 0 then zeroes their contribution exactly)
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
    log_im = jnp.arctan2(z_im, z_re)

    pref = -0.5 * (1.0 - e**2) / sqe
    scale = theta * rcut / (rcut - rcore)
    ax = scale * (-pref) * log_im
    ay = scale * pref * log_re
    # rotate back to the sky frame
    return ax * cos_p - ay * sin_p, ax * sin_p + ay * cos_p


def _kernel(scales_ref, gal_ref, x_ref, y_ref, out_x_ref, out_y_ref, *, n_gblocks):
    """One (sample b, pixel tile) cell: sum over all galaxy blocks."""
    theta_s = scales_ref[0, 0]
    rcore_s = scales_ref[0, 1]
    rcut_s = scales_ref[0, 2]
    x = x_ref[:]  # (1, PIX_BLK)
    y = y_ref[:]

    def body(gi, acc):
        acc_x, acc_y = acc
        blk = gal_ref[pl.ds(gi * G_BLK, G_BLK), :]  # (G_BLK, 8)
        cx = blk[:, 0:1]
        cy = blk[:, 1:2]
        e = blk[:, 2:3]
        phi = blk[:, 3:4]
        u_t = blk[:, 4:5]
        u_rc = blk[:, 5:6]
        u_rs = blk[:, 6:7]
        ax, ay = _dpie_alpha_block(
            x - cx,
            y - cy,
            theta_s * u_t,
            rcore_s * u_rc,
            rcut_s * u_rs,
            e,
            phi,
        )
        return acc_x + jnp.sum(ax, 0, keepdims=True), acc_y + jnp.sum(ay, 0, keepdims=True)

    zero = jnp.zeros((1, PIX_BLK), jnp.float32)
    acc_x, acc_y = jax.lax.fori_loop(0, n_gblocks, body, (zero, zero))
    out_x_ref[:] = acc_x
    out_y_ref[:] = acc_y


def _kernel_jvp(scales_ref, gal_ref, x_ref, y_ref,
                oxa_ref, oya_ref, oxs_ref, oys_ref, *, n_gblocks):
    """Backward helper: directional derivatives of the member sum w.r.t. the
    global r_core scaling (a) and r_cut scaling (s), via jax.jvp of the block
    function traced inside the kernel."""
    theta_s = scales_ref[0, 0]
    rcore_s = scales_ref[0, 1]
    rcut_s = scales_ref[0, 2]
    x = x_ref[:]
    y = y_ref[:]

    def body(gi, acc):
        axa, aya, axs, ays = acc
        blk = gal_ref[pl.ds(gi * G_BLK, G_BLK), :]
        cx, cy = blk[:, 0:1], blk[:, 1:2]
        e, phi = blk[:, 2:3], blk[:, 3:4]
        u_t, u_rc, u_rs = blk[:, 4:5], blk[:, 5:6], blk[:, 6:7]
        primals = (x - cx, y - cy, theta_s * u_t, rcore_s * u_rc, rcut_s * u_rs, e, phi)
        z = [jnp.zeros_like(p) for p in primals]

        ta = tuple(z[:3] + [u_rc * jnp.ones_like(primals[3])] + z[4:])
        _, (dxa, dya) = jax.jvp(_dpie_alpha_block, primals, ta)
        ts = tuple(z[:4] + [u_rs * jnp.ones_like(primals[4])] + z[5:])
        _, (dxs, dys) = jax.jvp(_dpie_alpha_block, primals, ts)
        return (
            axa + jnp.sum(dxa, 0, keepdims=True),
            aya + jnp.sum(dya, 0, keepdims=True),
            axs + jnp.sum(dxs, 0, keepdims=True),
            ays + jnp.sum(dys, 0, keepdims=True),
        )

    zero = jnp.zeros((1, PIX_BLK), jnp.float32)
    axa, aya, axs, ays = jax.lax.fori_loop(0, n_gblocks, body, (zero,) * 4)
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
    P = x.shape[0]
    G = galaxy_table.shape[0]
    n_pix_blocks = -(-P // PIX_BLK)
    n_gblocks = -(-G // G_BLK)
    Pp = n_pix_blocks * PIX_BLK
    Gp = n_gblocks * G_BLK
    xp = _pad_to(x.astype(jnp.float32), Pp).reshape(1, Pp)
    yp = _pad_to(y.astype(jnp.float32), Pp).reshape(1, Pp)
    gal = _pad_to(galaxy_table.astype(jnp.float32), Gp)
    return bs, P, n_pix_blocks, n_gblocks, Pp, Gp, xp, yp, gal


def _specs(bs, Gp):
    in_specs = [
        pl.BlockSpec((1, 3), lambda b, p: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Gp, 8), lambda b, p: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, PIX_BLK), lambda b, p: (0, p), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, PIX_BLK), lambda b, p: (0, p), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, PIX_BLK), lambda b, p: (b, p), memory_space=pltpu.VMEM)
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
    bs, P, n_pix_blocks, n_gblocks, Pp, Gp, xp, yp, gal = _prep(
        scales, galaxy_table, x, y
    )
    in_specs, out_spec = _specs(bs, Gp)
    out_shape = tuple(jax.ShapeDtypeStruct((bs, Pp), jnp.float32) for _ in range(2))
    ax, ay = pl.pallas_call(
        functools.partial(_kernel, n_gblocks=n_gblocks),
        grid=(bs, n_pix_blocks),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=out_shape,
        interpret=interpret,
    )(scales, gal, xp, yp)
    return ax[:, :P], ay[:, :P]


def _deriv_fwd(scales, galaxy_table, x, y, interpret=False):
    out = dpie_cluster_deriv(scales, galaxy_table, x, y, interpret)
    return out, (scales, galaxy_table, x, y, out)


def _deriv_bwd(interpret, res, ct):
    scales, galaxy_table, x, y, (ax, ay) = res
    ct_x, ct_y = ct
    bs, P, n_pix_blocks, n_gblocks, Pp, Gp, xp, yp, gal = _prep(
        scales, galaxy_table, x, y
    )
    in_specs, out_spec = _specs(bs, Gp)
    out_shape = tuple(jax.ShapeDtypeStruct((bs, Pp), jnp.float32) for _ in range(4))
    dxa, dya, dxs, dys = pl.pallas_call(
        functools.partial(_kernel_jvp, n_gblocks=n_gblocks),
        grid=(bs, n_pix_blocks),
        in_specs=in_specs,
        out_specs=(out_spec,) * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(scales, gal, xp, yp)
    dxa, dya, dxs, dys = (v[:, :P] for v in (dxa, dya, dxs, dys))

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
