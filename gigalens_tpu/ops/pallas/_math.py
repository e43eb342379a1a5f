"""Kernel-safe math for Pallas TPU (Mosaic) lowering.

Mosaic does not lower ``atan2`` (and general ``pow`` is risky); these
replacements use only +,*,/,sqrt,select,log,exp which all lower. ``atan2``
follows the classic Cephes ``atanf`` reduction (range-reduce to [0, 0.414),
degree-9 odd minimax polynomial; float32 accuracy ~1e-7), with standard
quadrant fix-up.
"""
from __future__ import annotations

import jax.numpy as jnp

_TAN_3PI_8 = 2.414213562373095
_TAN_PI_8 = 0.4142135623730950
_HALF_PI = 1.5707963267948966
_QUARTER_PI = 0.7853981633974483


def _atan_pos(x):
    """atan for x >= 0 (elementwise), Cephes atanf reduction."""
    big = x > _TAN_3PI_8
    mid = (x > _TAN_PI_8) & (~big)

    x_big = jnp.where(big, x, 1.0)
    x_mid = jnp.where(mid, x, 1.0)
    base = jnp.where(big, _HALF_PI, jnp.where(mid, _QUARTER_PI, 0.0))
    xr = jnp.where(
        big, -1.0 / x_big, jnp.where(mid, (x_mid - 1.0) / (x_mid + 1.0), x)
    )
    z = xr * xr
    poly = (
        (8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1
    ) * z - 3.33329491539e-1
    return base + xr + xr * z * poly


def atan2(y, x):
    """Elementwise atan2 built from kernel-safe primitives."""
    y = jnp.asarray(y)
    x = jnp.asarray(x)
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.where(swap, ay, ax)
    r = _atan_pos(num / jnp.maximum(den, 1e-30))
    r = jnp.where(swap, _HALF_PI - r, r)
    r = jnp.where(x < 0, jnp.pi - r, r)
    return jnp.where(y < 0, -r, r)


def powp(base, expo):
    """base ** expo for strictly positive base (kernel-safe)."""
    return jnp.exp(expo * jnp.log(base))


def half_angle(e1, e2):
    """(cos phi, sin phi) for phi = atan2(e2, e1) / 2 — pure algebra.

    Replaces the approximate ``atan2`` + cos/sin round-trip wherever only
    the rotation (cos phi, sin phi) is needed: exact to f32 rounding and
    free of the polynomial approximation's branch-point derivative
    discontinuities. Uses cos phi = sqrt((1 + cos 2phi)/2) (non-negative on
    atan2's range) and sin phi = sin 2phi / (2 cos phi); smooth everywhere
    except the genuine branch cut at e2 = 0, e1 < 0.
    """
    # The epsilon goes INSIDE the sqrt: sqrt(e1^2+e2^2) has an infinite
    # derivative at the origin and a where-guard on the result alone still
    # propagates NaN through the VJP (0 * inf); with the floor inside, both
    # the value and the gradient of m are finite everywhere.
    m = jnp.sqrt(e1 * e1 + e2 * e2 + 1e-24)
    # below the floor the direction is undefined: return the identity
    # rotation exactly (phi = 0) rather than the mis-normalized
    # (sqrt(1/2), 0) the raw formulas would give at c2 = s2 = 0
    degenerate = m <= 1e-11
    c2 = jnp.where(degenerate, 1.0, e1 / m)
    s2 = jnp.where(degenerate, 0.0, e2 / m)
    # Branch on the sign of e1 so the division is always by the
    # well-conditioned component (>= sqrt(2)/2): dividing by the vanishing
    # one has d/de ~ 1/|e2| near the e1 < 0 branch cut (measured blowing up
    # SVI gradients), while atan2's derivative stays ~ 1/m there.
    pos = e1 >= 0
    cp_pos = jnp.sqrt(jnp.maximum((1.0 + c2) * 0.5, 1e-12))
    sp_neg = jnp.where(e2 >= 0, 1.0, -1.0) * jnp.sqrt(
        jnp.maximum((1.0 - c2) * 0.5, 1e-12)
    )
    cp = jnp.where(pos, cp_pos, 0.5 * s2 / sp_neg)
    sp = jnp.where(pos, 0.5 * s2 / cp_pos, sp_neg)
    return cp, sp
