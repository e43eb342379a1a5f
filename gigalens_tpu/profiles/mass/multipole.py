"""Angular multipole perturbation to the lens potential.

Beyond the reference's profile set: multipoles (especially m = 3 and m = 4,
the "boxy/disky" isophote terms) are standard additions in precision lens
modeling — recent time-delay cosmography and dark-substructure analyses fit
them alongside the EPL. Closed form from Keeton (2001, astro-ph/0102341
§3.1.4; lenstronomy ``MULTIPOLE`` convention):

  psi(r, phi)  = r * a_m / (1 - m^2) * cos(m (phi - phi_m))
  kappa        = a_m cos(m (phi - phi_m)) / (2 r)

The multipole order ``m`` is a static constructor argument (like EPL's
``niter``) so the trig stays trace-time constant-folded where possible;
``a_m``/``phi_m`` are ordinary fit parameters. The potential is singular at
r = 0 (as in every published implementation); the radius is floored so the
functions stay total and differentiable under ``pjit``.
"""
from __future__ import annotations

import jax.numpy as jnp

from gigalens_tpu.profiles.base import MassProfile

_R_MIN = 1e-7


class Multipole(MassProfile):
    _name = "MULTIPOLE"
    _params = ["a_m", "phi_m", "center_x", "center_y"]

    def __init__(self, m: int = 4):
        super().__init__()
        if m == 1:
            raise ValueError(
                "m = 1 has no potential of this form (1 - m^2 = 0); it is a "
                "pure translation degenerate with the deflector centroid"
            )
        self.m = int(m)

    def deriv(self, x, y, a_m, phi_m, center_x, center_y):
        m = self.m
        dx, dy = x - center_x, y - center_y
        r = jnp.maximum(jnp.sqrt(dx * dx + dy * dy), _R_MIN)
        phi = jnp.arctan2(dy, dx)
        c = jnp.cos(m * (phi - phi_m))
        s = jnp.sin(m * (phi - phi_m))
        pref = a_m / (1.0 - m * m)
        cos_p, sin_p = dx / r, dy / r
        f_x = pref * (cos_p * c + m * sin_p * s)
        f_y = pref * (sin_p * c - m * cos_p * s)
        return f_x, f_y

    def hessian(self, x, y, a_m, phi_m, center_x, center_y):
        # With psi = r A cos(m dphi) (A = a_m/(1-m^2)): psi_rr = 0 and, in the
        # polar->cartesian change of variables, the psi_rphi and psi_phi terms
        # cancel exactly, leaving the rank-1 tangential form
        #   H = (a_m cos(m dphi) / r) [[sin^2, -sin cos], [-sin cos, cos^2]]
        # whose trace reproduces kappa = a_m cos(m dphi)/(2r).
        m = self.m
        dx, dy = x - center_x, y - center_y
        r = jnp.maximum(jnp.sqrt(dx * dx + dy * dy), _R_MIN)
        phi = jnp.arctan2(dy, dx)
        base = a_m * jnp.cos(m * (phi - phi_m)) / r
        cos_p, sin_p = dx / r, dy / r
        f_xx = base * sin_p * sin_p
        f_yy = base * cos_p * cos_p
        f_xy = -base * sin_p * cos_p
        return f_xx, f_xy, f_xy, f_yy

    def convergence(self, x, y, a_m, phi_m, center_x, center_y):
        m = self.m
        dx, dy = x - center_x, y - center_y
        r = jnp.maximum(jnp.sqrt(dx * dx + dy * dy), _R_MIN)
        phi = jnp.arctan2(dy, dx)
        return a_m * jnp.cos(m * (phi - phi_m)) / (2.0 * r)
