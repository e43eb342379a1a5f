"""Gaussian and Moffat light profiles.

Beyond the reference's light set (``src/gigalens/jax/profiles/light/``
carries only the Sersic family and shapelets): Gaussians are the building
block of multi-Gaussian-expansion (MGE) photometry and the natural model
for marginally-resolved sources; the Moffat profile is the standard
seeing-limited PSF/compact-source shape. Both follow the package
conventions — elliptical radius via the lenstronomy axis-ratio scaling
(:func:`.sersic._elliptical_radius`), linear-amplitude (``use_lstsq``)
support with the amplitude factored out as a unit-amplitude basis layer.
"""
from __future__ import annotations

import jax.numpy as jnp

from gigalens_tpu.profiles.base import LightProfile
from gigalens_tpu.profiles.light.sersic import _elliptical_radius


class Gaussian(LightProfile):
    """amp * exp(-R^2 / (2 sigma^2)) on the elliptical radius."""

    _name = "GAUSSIAN"
    _params = ["sigma", "e1", "e2", "center_x", "center_y"]
    _amp = "amp"

    def light(self, x, y, sigma, e1, e2, center_x, center_y, amp=None):
        R = _elliptical_radius(x, y, center_x, center_y, e1, e2)
        ret = jnp.exp(-0.5 * (R / sigma) ** 2)
        return ret[jnp.newaxis] if self.use_lstsq else amp * ret


class Moffat(LightProfile):
    """amp * (1 + (R/rd)^2)^(-beta): the seeing-limited compact-source shape."""

    _name = "MOFFAT"
    _params = ["rd", "beta", "e1", "e2", "center_x", "center_y"]
    _amp = "amp"

    def light(self, x, y, rd, beta, e1, e2, center_x, center_y, amp=None):
        R = _elliptical_radius(x, y, center_x, center_y, e1, e2)
        ret = (1.0 + (R / rd) ** 2) ** (-beta)
        return ret[jnp.newaxis] if self.use_lstsq else amp * ret
