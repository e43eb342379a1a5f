"""Elliptical power-law (EPL) deflector.

Angular-series solution of Tessore & Metcalf (2015), as used by the reference
(``src/gigalens/jax/profiles/mass/epl.py:9-53``). The deflection in the
ellipse-aligned frame is

    alpha(R, theta) = (2 b)/(1+q) (b/R)^(t-1) * Omega(theta),
    Omega = sum_n  prod-form recursion over the angular multipoles,

computed here with ``lax.scan`` so the fixed-depth recursion is reverse-mode
differentiable and compiles to a single fused loop on TPU. The reference's TF
substrate truncates adaptively (``src/gigalens/tf/profiles/mass/epl.py:37-54``);
``EPL.recommended_niter`` exposes the same convergence bound so callers can pick
a static depth with the same guarantee (static shapes are required under jit).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax

from gigalens_tpu.profiles.base import MassProfile, ellipticity_to_polar, rotate


class EPL(MassProfile):
    _name = "EPL"
    _params = ["theta_E", "gamma", "e1", "e2", "center_x", "center_y"]

    def __init__(self, niter: int = 18):
        super().__init__()
        self.niter = int(niter)

    @staticmethod
    def recommended_niter(q_min: float, tol: float = 1e-12) -> int:
        """Series depth giving truncation error < tol for axis ratios >= q_min.

        The series converges geometrically with ratio f = (1-q)/(1+q); this is
        the static-shape analogue of the reference TF substrate's adaptive
        ``log(tol)/log(f) + 2`` bound.
        """
        f = (1 - q_min) / (1 + q_min)
        if f <= 0:
            return 2
        return int(math.ceil(math.log(tol) / math.log(f))) + 2

    def deriv(self, x, y, theta_E, gamma, e1, e2, center_x, center_y):
        _, q, phi = ellipticity_to_polar(e1, e2, e_max=1.0)
        # Convert theta_E (intermediate-axis convention) to the scale length b.
        b = theta_E * jnp.sqrt(2 * q / (1 + q**2)) * jnp.sqrt((1 + q**2) / 2)
        t = gamma - 1  # 2D log-slope

        x, y = rotate(x - center_x, y - center_y, phi)
        R = jnp.clip(jnp.sqrt((q * x) ** 2 + y**2), 1e-10, 1e10)
        theta = jnp.arctan2(y, q * x)

        f = (1 - q) / (1 + q)
        cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
        cos_2t, sin_2t = jnp.cos(2 * theta), jnp.sin(2 * theta)

        def step(carry, n):
            term_x, term_y, acc_x, acc_y = carry
            ratio = -f * (2 * n - (2 - t)) / (2 * n + (2 - t))
            term_x, term_y = (
                ratio * (cos_2t * term_x - sin_2t * term_y),
                ratio * (sin_2t * term_x + cos_2t * term_y),
            )
            return (term_x, term_y, acc_x + term_x, acc_y + term_y), None

        init = (cos_t, sin_t, cos_t, sin_t)
        ns = jnp.arange(1, self.niter, dtype=jnp.result_type(float))
        (_, _, omega_x, omega_y), _ = lax.scan(step, init, ns)

        prefac = (2 * b) / (1 + q) * (b / R) ** (t - 1)
        return rotate(prefac * omega_x, prefac * omega_y, -phi)
