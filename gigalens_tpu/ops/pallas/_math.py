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
