"""External shear (reference: ``src/gigalens/jax/profiles/mass/shear.py``)."""
from __future__ import annotations

import jax.numpy as jnp

from gigalens_tpu.profiles.base import MassProfile


class Shear(MassProfile):
    _name = "SHEAR"
    _params = ["gamma1", "gamma2"]

    def deriv(self, x, y, gamma1, gamma2):
        return gamma1 * x + gamma2 * y, gamma2 * x - gamma1 * y

    def potential(self, x, y, gamma1, gamma2):
        return 0.5 * gamma1 * (x**2 - y**2) + gamma2 * x * y

    def hessian(self, x, y, gamma1, gamma2):
        shape = jnp.broadcast_shapes(
            jnp.shape(x), jnp.shape(gamma1), jnp.shape(gamma2)
        )
        f_xx = jnp.broadcast_to(gamma1, shape)
        f_yy = jnp.broadcast_to(-gamma1, shape)
        f_xy = jnp.broadcast_to(gamma2, shape)
        return f_xx, f_xy, f_xy, f_yy
