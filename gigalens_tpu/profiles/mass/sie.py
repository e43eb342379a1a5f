"""Singular isothermal ellipsoid (SIE) and sphere (SIS) deflectors.

Closed forms (Kormann et al. 1994; reference:
``src/gigalens/jax/profiles/mass/sie.py``, ``sis.py``). The SIS carries an
analytic Hessian; the SIE Hessian falls back to the forward-mode AD default.
"""
from __future__ import annotations

import jax.numpy as jnp

from gigalens_tpu.profiles.base import MassProfile, ellipticity_to_polar, rotate


def _kormann_deriv(x, y, theta_E, q, phi, s_scale, center_x, center_y):
    """Kormann (1994) cored isothermal-ellipsoid deflection in the rotated
    frame; ``s_scale = 0`` is the singular (SIE) case."""
    # intermediate-axis normalization of theta_E
    b = theta_E * jnp.sqrt(2 * q / (1 + q**2)) * jnp.sqrt((1 + q**2) / 2)
    s = s_scale * jnp.sqrt((1 + q**2) / (2 * q**2))

    x, y = rotate(x - center_x, y - center_y, phi)
    psi = jnp.sqrt(q**2 * (s**2 + x**2) + y**2)
    # Floor 1 - q^2: at exactly e1 = e2 = 0 (a start from the prior
    # mean) f32 rounds q to 1.0 and the raw sqrt gives root = 0, making
    # b/root * arctan(0) = inf * 0 = NaN in the forward value itself.
    # With the floor, arctan(root*u)/root = u + O(root^2 u^3) resolves
    # to the SIS limit b*x/psi with ~1e-11 relative error, and the
    # max() kills the (spurious) infinite dq branch of the gradient.
    root = jnp.sqrt(jnp.maximum(1.0 - q**2, 1e-10))
    fx = b / root * jnp.arctan(root * x / (psi + s))
    fy = b / root * jnp.arctanh(root * y / (psi + q**2 * s))
    return rotate(fx, fy, -phi)


class SIE(MassProfile):
    _name = "SIE"
    _params = ["theta_E", "e1", "e2", "center_x", "center_y"]

    # Softening used only to keep the q -> 1 limit finite.
    s_scale = 0.0

    def deriv(self, x, y, theta_E, e1, e2, center_x, center_y):
        _, q, phi = ellipticity_to_polar(e1, e2)
        return _kormann_deriv(
            x, y, theta_E, q, phi, self.s_scale, center_x, center_y
        )

    def potential(self, x, y, theta_E, e1, e2, center_x, center_y):
        """Euler identity: the singular isothermal deflection is homogeneous
        of degree 0 in the centered coords, so ``psi = x~ . alpha`` exactly."""
        fx, fy = self.deriv(x, y, theta_E, e1, e2, center_x, center_y)
        return (x - center_x) * fx + (y - center_y) * fy


class NIE(MassProfile):
    """Non-singular isothermal ellipsoid: the SIE with the core radius
    ``s_scale`` promoted to a fit parameter.

    The reference's SIE declares an ``s_scale`` attribute but always passes 0
    (``src/gigalens/jax/profiles/mass/sie.py:11,16``); this makes the cored
    variant — the standard model when the central image matters or the
    deflector is a group — a first-class profile.
    """

    _name = "NIE"
    _params = ["theta_E", "e1", "e2", "s_scale", "center_x", "center_y"]

    def deriv(self, x, y, theta_E, e1, e2, s_scale, center_x, center_y):
        _, q, phi = ellipticity_to_polar(e1, e2)
        return _kormann_deriv(x, y, theta_E, q, phi, s_scale, center_x, center_y)

    def potential(self, x, y, theta_E, e1, e2, s_scale, center_x, center_y):
        """Keeton (2001) cored-isothermal potential: the Euler term plus the
        core correction (which vanishes as ``s_scale -> 0``)."""
        _, q, phi = ellipticity_to_polar(e1, e2)
        b = theta_E * jnp.sqrt(2 * q / (1 + q**2)) * jnp.sqrt((1 + q**2) / 2)
        s = s_scale * jnp.sqrt((1 + q**2) / (2 * q**2))
        xr, yr = rotate(x - center_x, y - center_y, phi)
        psi = jnp.sqrt(q**2 * (s**2 + xr**2) + yr**2)
        root = jnp.sqrt(jnp.maximum(1.0 - q**2, 1e-10))
        fx = b / root * jnp.arctan(root * xr / (psi + s))
        fy = b / root * jnp.arctanh(root * yr / (psi + q**2 * s))
        pot = xr * fx + yr * fy
        s_safe = jnp.maximum(s, 1e-12)
        core = b * s * (
            0.5 * jnp.log((psi + s) ** 2 + (1.0 - q**2) * xr**2)
            - jnp.log((1.0 + q) * s_safe)
        )
        return pot - jnp.where(s > 0, core, 0.0)


class SIS(MassProfile):
    _name = "SIS"
    _params = ["theta_E", "center_x", "center_y"]

    def deriv(self, x, y, theta_E, center_x, center_y):
        dx, dy = x - center_x, y - center_y
        r = jnp.sqrt(dx**2 + dy**2)
        a = jnp.where(r == 0, 0.0, theta_E / jnp.where(r == 0, 1.0, r))
        return a * dx, a * dy

    def potential(self, x, y, theta_E, center_x, center_y):
        dx, dy = x - center_x, y - center_y
        return theta_E * jnp.sqrt(dx**2 + dy**2)

    def hessian(self, x, y, theta_E, center_x, center_y):
        dx, dy = x - center_x, y - center_y
        r3 = (dx**2 + dy**2) ** 1.5
        a = jnp.where(r3 == 0, 0.0, theta_E / jnp.where(r3 == 0, 1.0, r3))
        f_xx = dy**2 * a
        f_yy = dx**2 * a
        f_xy = -dx * dy * a
        return f_xx, f_xy, f_xy, f_yy
