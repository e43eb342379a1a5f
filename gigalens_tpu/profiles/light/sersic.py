"""Sersic-family light profiles.

Reference: ``src/gigalens/jax/profiles/light/sersic.py``. Note the reference's
JAX spherical ``Sersic.light`` multiplies by ``Ie`` twice (``:18-19``); its TF
substrate applies it once (``tf/profiles/light/sersic.py:31-35``), which is the
correct behavior implemented here.
"""
from __future__ import annotations

import jax.numpy as jnp

from gigalens_tpu.profiles.base import LightProfile


def _elliptical_radius(x, y, cx, cy, e1, e2):
    """Elliptical radius with |e|-preserving axis-ratio scaling (sqrt(q) in,
    1/sqrt(q) cross), the lenstronomy SersicElliptic convention.

    Guarded at e1 = e2 = 0 like :func:`..base.ellipticity_to_polar`: the
    epsilon inside the sqrt and the degenerate-region angle substitution keep
    gradients finite when optimization starts from zero ellipticity."""
    degenerate = (e1 * e1 + e2 * e2) < 1e-24
    phi = jnp.arctan2(
        jnp.where(degenerate, 0.0, e2), jnp.where(degenerate, 1.0, e1)
    ) / 2
    c = jnp.sqrt(e1**2 + e2**2 + 1e-24)
    q = (1 - c) / (1 + c)
    dx, dy = x - cx, y - cy
    cos_phi, sin_phi = jnp.cos(phi), jnp.sin(phi)
    xt1 = (cos_phi * dx + sin_phi * dy) * jnp.sqrt(q)
    xt2 = (-sin_phi * dx + cos_phi * dy) / jnp.sqrt(q)
    return jnp.sqrt(xt1**2 + xt2**2)


def _b_n(n_sersic):
    """Ciotti & Bertin approximation used throughout the reference."""
    return 1.9992 * n_sersic - 0.3271


class Sersic(LightProfile):
    _name = "SERSIC"
    _params = ["R_sersic", "n_sersic", "center_x", "center_y"]
    _amp = "Ie"

    def light(self, x, y, R_sersic, n_sersic, center_x, center_y, Ie=None):
        R = _elliptical_radius(
            x, y, center_x, center_y, jnp.zeros_like(center_x), jnp.zeros_like(center_y)
        )
        bn = _b_n(n_sersic)
        ret = jnp.exp(-bn * ((R / R_sersic) ** (1.0 / n_sersic) - 1.0))
        return ret[jnp.newaxis] if self.use_lstsq else Ie * ret


class SersicEllipse(Sersic):
    _name = "SERSIC_ELLIPSE"
    _params = ["R_sersic", "n_sersic", "e1", "e2", "center_x", "center_y"]

    def light(self, x, y, R_sersic, n_sersic, e1, e2, center_x, center_y, Ie=None):
        R = _elliptical_radius(x, y, center_x, center_y, e1, e2)
        bn = _b_n(n_sersic)
        ret = jnp.exp(-bn * ((R / R_sersic) ** (1.0 / n_sersic) - 1.0))
        return ret[jnp.newaxis] if self.use_lstsq else Ie * ret


class CoreSersic(Sersic):
    _name = "CORE_SERSIC"
    _params = [
        "R_sersic",
        "n_sersic",
        "Rb",
        "alpha",
        "gamma",
        "e1",
        "e2",
        "center_x",
        "center_y",
    ]

    def light(
        self, x, y, R_sersic, n_sersic, Rb, alpha, gamma, e1, e2,
        center_x, center_y, Ie=None,
    ):
        R = _elliptical_radius(x, y, center_x, center_y, e1, e2)
        bn = _b_n(n_sersic)
        # Canonical Core-Sersic (Graham et al. 2003 / lenstronomy convention,
        # normalized so I(R_sersic) = Ie); the reference's transcription at
        # jax/profiles/light/sersic.py:81-85 drops the 1/(alpha*n) exponent.
        u = (R**alpha + Rb**alpha) / R_sersic**alpha
        ret = (1 + (Rb / R) ** alpha) ** (gamma / alpha) * jnp.exp(
            -bn * (u ** (1.0 / (alpha * n_sersic)) - 1.0)
        )
        return ret[jnp.newaxis] if self.use_lstsq else Ie * ret
