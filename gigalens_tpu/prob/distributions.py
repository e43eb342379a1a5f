"""Pure-JAX distributions for priors and inference.

Replaces the TFP distributions used by the reference
(``src/gigalens/jax/model.py:8``, ``src/gigalens/jax/inference.py:9-13``).
Each scalar-family distribution carries an ``event_shape`` inferred from
broadcasting its parameters, a default unconstraining ``bijector`` matching
TFP's event-space bijector choices, and reparameterized sampling so gradients
flow through ``sample`` (needed for the SVI ELBO).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import log_ndtr, ndtr, ndtri

from gigalens_tpu.prob import bijectors as bij

_LOG_2PI = math.log(2.0 * math.pi)


class Distribution:
    """Base class: scalar family broadcast over ``event_shape``."""

    event_shape: tuple = ()

    def sample(self, key, sample_shape=()):
        raise NotImplementedError

    def log_prob(self, x):
        """Sums over event dims; retains batch (sample) dims."""
        raise NotImplementedError

    @property
    def bijector(self) -> bij.Bijector:
        """Default unconstraining bijector (reals -> support)."""
        return bij.Identity()

    @property
    def event_size(self):
        return int(np.prod(self.event_shape, dtype=int)) if self.event_shape else 1

    def _sum_event(self, lp, sample_shape_ndim=None):
        """Sums log-prob over the trailing event dims."""
        n_event = len(self.event_shape)
        if n_event == 0:
            return lp
        return jnp.sum(lp, axis=tuple(range(-n_event, 0)))


def _broadcast_event_shape(*params):
    shapes = [np.shape(p) for p in params]
    return tuple(np.broadcast_shapes(*shapes))


class Normal(Distribution):
    def __init__(self, loc, scale):
        self.loc = jnp.asarray(loc, jnp.float32)
        self.scale = jnp.asarray(scale, jnp.float32)
        self.event_shape = _broadcast_event_shape(loc, scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.event_shape
        eps = jax.random.normal(key, shape, self.loc.dtype)
        return self.loc + self.scale * eps

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        lp = -0.5 * (z**2 + _LOG_2PI) - jnp.log(self.scale)
        return self._sum_event(lp)

    @property
    def bijector(self):
        return bij.Identity()


class LogNormal(Distribution):
    def __init__(self, loc, scale):
        self.loc = jnp.asarray(loc, jnp.float32)
        self.scale = jnp.asarray(scale, jnp.float32)
        self.event_shape = _broadcast_event_shape(loc, scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.event_shape
        eps = jax.random.normal(key, shape, self.loc.dtype)
        return jnp.exp(self.loc + self.scale * eps)

    def log_prob(self, x):
        logx = jnp.log(x)
        z = (logx - self.loc) / self.scale
        lp = -0.5 * (z**2 + _LOG_2PI) - jnp.log(self.scale) - logx
        return self._sum_event(lp)

    @property
    def bijector(self):
        return bij.Exp()


class Uniform(Distribution):
    def __init__(self, low, high):
        self.low = jnp.asarray(low, jnp.float32)
        self.high = jnp.asarray(high, jnp.float32)
        self.event_shape = _broadcast_event_shape(low, high)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.event_shape
        u = jax.random.uniform(key, shape, self.low.dtype)
        return self.low + (self.high - self.low) * u

    def log_prob(self, x):
        lp = jnp.where(
            (x >= self.low) & (x <= self.high),
            -jnp.log(self.high - self.low),
            -jnp.inf,
        )
        return self._sum_event(lp)

    @property
    def bijector(self):
        return bij.Sigmoid(self.low, self.high)


class TruncatedNormal(Distribution):
    """Normal(loc, scale) truncated to [low, high].

    Sampling is by inverse-CDF so it is reparameterized in (loc, scale).
    """

    def __init__(self, loc, scale, low, high):
        self.loc = jnp.asarray(loc, jnp.float32)
        self.scale = jnp.asarray(scale, jnp.float32)
        self.low = jnp.asarray(low, jnp.float32)
        self.high = jnp.asarray(high, jnp.float32)
        self.event_shape = _broadcast_event_shape(loc, scale, low, high)

    def _alpha_beta(self):
        a = (self.low - self.loc) / self.scale
        b = (self.high - self.loc) / self.scale
        return a, b

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.event_shape
        a, b = self._alpha_beta()
        # Mirror right-tail windows (a > 0) into the left tail where ndtr
        # does not saturate (the same construction as _log_gauss_mass): in
        # float32 ndtr(8) == ndtr(10) == 1.0 exactly, so the naive
        # inverse-CDF collapses every draw of a far right-tail truncation
        # to `high`. Left-tail ndtr values are small but fully precise.
        right = a > 0
        a_, b_ = jnp.where(right, -b, a), jnp.where(right, -a, b)
        fa, fb = ndtr(a_), ndtr(b_)
        u = jax.random.uniform(
            key, shape, self.loc.dtype, minval=1e-7, maxval=1.0 - 1e-7
        )
        z = ndtri(fa + u * (fb - fa))
        x = self.loc + self.scale * jnp.where(right, -z, z)
        return jnp.clip(x, self.low, self.high)

    @staticmethod
    def _log_gauss_mass(a, b):
        """log(Phi(b) - Phi(a)), stable for far-tail truncation windows.

        ``log(ndtr(b) - ndtr(a))`` cancels catastrophically when both bounds
        sit in the same tail; computing in the left tail via ``log_ndtr``
        (mirroring right-tail windows with (a, b) -> (-b, -a)) keeps full
        precision. Same construction as scipy's truncnorm ``_log_gauss_mass``.
        """
        right = a > 0
        a_, b_ = jnp.where(right, -b, a), jnp.where(right, -a, b)
        la, lb = log_ndtr(a_), log_ndtr(b_)
        # lb >= la always; exp(la - lb) <= 1 so log1p is well-defined
        return lb + jnp.log1p(-jnp.exp(la - lb))

    def log_prob(self, x):
        a, b = self._alpha_beta()
        log_z = self._log_gauss_mass(a, b)
        t = (x - self.loc) / self.scale
        lp = -0.5 * (t**2 + _LOG_2PI) - jnp.log(self.scale) - log_z
        lp = jnp.where((x >= self.low) & (x <= self.high), lp, -jnp.inf)
        return self._sum_event(lp)

    @property
    def bijector(self):
        return bij.Sigmoid(self.low, self.high)


class HalfNormal(Distribution):
    def __init__(self, scale):
        self.scale = jnp.asarray(scale, jnp.float32)
        self.event_shape = _broadcast_event_shape(scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.event_shape
        return jnp.abs(jax.random.normal(key, shape, self.scale.dtype)) * self.scale

    def log_prob(self, x):
        z = x / self.scale
        lp = -0.5 * (z**2 + _LOG_2PI) - jnp.log(self.scale) + math.log(2.0)
        lp = jnp.where(x >= 0, lp, -jnp.inf)
        return self._sum_event(lp)

    @property
    def bijector(self):
        return bij.Softplus()


class MultivariateNormalTriL:
    """MVN with lower-triangular scale factor: x = loc + L @ eps.

    Used for the SVI surrogate posterior and as an HMC momentum distribution,
    mirroring the reference's ``tfd.MultivariateNormalTriL``
    (``src/gigalens/jax/inference.py:116``).
    """

    def __init__(self, loc, scale_tril):
        self.loc = jnp.asarray(loc)
        self.scale_tril = jnp.asarray(scale_tril)
        self.d = self.loc.shape[-1]

    def mean(self):
        return self.loc

    def covariance(self):
        return self.scale_tril @ self.scale_tril.T

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + (self.d,)
        eps = jax.random.normal(key, shape, self.loc.dtype)
        return self.loc + eps @ self.scale_tril.T

    def log_prob(self, x):
        diff = jnp.asarray(x) - self.loc
        batch_shape = diff.shape[:-1]
        # Solve L y = diff^T for all batch elements in one triangular solve.
        flat = diff.reshape(-1, self.d).T  # (d, N)
        y = jax.scipy.linalg.solve_triangular(self.scale_tril, flat, lower=True)
        quad = jnp.sum(y**2, axis=0).reshape(batch_shape)
        half_log_det = jnp.sum(jnp.log(jnp.abs(jnp.diagonal(self.scale_tril))))
        return -0.5 * (quad + self.d * _LOG_2PI) - half_log_det


class MultivariateNormalFullCovariance(MultivariateNormalTriL):
    def __init__(self, loc, covariance_matrix):
        scale_tril = jnp.linalg.cholesky(covariance_matrix)
        super().__init__(loc, scale_tril)


class MultivariateNormalDiag(MultivariateNormalTriL):
    def __init__(self, loc, scale_diag):
        super().__init__(loc, jnp.diag(jnp.asarray(scale_diag)))
