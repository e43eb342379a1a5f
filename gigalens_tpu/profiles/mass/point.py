"""Point mass and uniform convergence sheet — simple analytic profiles.

Beyond the reference's profile set (no counterpart in
``src/gigalens/jax/profiles/mass/``): a point mass is the compact-object /
quasar-microlensing deflector, and the convergence sheet is the standard
tool for mass-sheet-degeneracy studies. Both have closed-form deflections
and Hessians and follow the package broadcasting convention
(coords ``(npix,)`` x params ``(bs, 1)``).
"""
from __future__ import annotations

import jax.numpy as jnp

from gigalens_tpu.profiles.base import MassProfile


class PointMass(MassProfile):
    """alpha = theta_E^2 * r_hat / r: the Schwarzschild (point) lens."""

    _name = "POINT_MASS"
    _params = ["theta_E", "center_x", "center_y"]

    def deriv(self, x, y, theta_E, center_x, center_y):
        dx, dy = x - center_x, y - center_y
        r2 = jnp.maximum(dx * dx + dy * dy, 1e-12)  # finite at the center
        a = theta_E**2 / r2
        return a * dx, a * dy

    def hessian(self, x, y, theta_E, center_x, center_y):
        dx, dy = x - center_x, y - center_y
        r2 = jnp.maximum(dx * dx + dy * dy, 1e-12)
        c = theta_E**2 / (r2 * r2)
        f_xx = c * (dy * dy - dx * dx)
        f_yy = c * (dx * dx - dy * dy)
        f_xy = -2.0 * c * dx * dy
        return f_xx, f_xy, f_xy, f_yy

    def potential(self, x, y, theta_E, center_x, center_y):
        dx, dy = x - center_x, y - center_y
        r2 = jnp.maximum(dx * dx + dy * dy, 1e-12)
        return 0.5 * theta_E**2 * jnp.log(r2)


class MassSheet(MassProfile):
    """Uniform external convergence: alpha = kappa * (x - c); kappa(x) = kappa.

    The mass-sheet transform `kappa -> lambda + (1 - lambda) kappa` leaves
    image positions and flux ratios invariant while rescaling time delays —
    include a sheet with a tight prior to marginalize that degeneracy.
    """

    _name = "MASS_SHEET"
    _params = ["kappa", "center_x", "center_y"]

    def deriv(self, x, y, kappa, center_x, center_y):
        return kappa * (x - center_x), kappa * (y - center_y)

    def hessian(self, x, y, kappa, center_x, center_y):
        shape = jnp.broadcast_shapes(jnp.shape(x), jnp.shape(kappa))
        k = jnp.broadcast_to(kappa, shape)
        zero = jnp.zeros(shape, k.dtype)
        return k, zero, zero, k

    def potential(self, x, y, kappa, center_x, center_y):
        dx, dy = x - center_x, y - center_y
        return 0.5 * kappa * (dx * dx + dy * dy)
