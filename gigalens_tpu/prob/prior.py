"""Joint prior over a nested pytree of distributions.

Replaces the reference's TFP ``JointDistributionSequential/Named`` priors plus
the ``pack_bij``/``unconstraining_bij`` chain (``src/gigalens/jax/model.py:61-72``)
with one object built on ``jax.tree_util``:

  * ``sample(key, n)``       -> params pytree, each leaf shaped ``(n, *event_shape)``
  * ``log_prob(x)``          -> ``(n,)`` log density in constrained space
  * ``unconstrain(x)``       -> ``(n, d)`` matrix of unconstrained parameters ``z``
  * ``constrain(z)``         -> params pytree (the ``bij.forward`` of the reference)
  * ``fldj(z)``              -> ``(n,)`` sum of forward log-det-Jacobians
  * ``log_prob_z(z)``        -> constrained-space prior density + Jacobian factor,
                                 i.e. the prior term of the unconstrained posterior

Column ordering follows ``jax.tree_util.tree_flatten`` over the prior pytree
(dict keys sorted), so the mapping between ``z`` columns and parameters is
deterministic and documented by :meth:`column_names`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gigalens_tpu.prob.distributions import Distribution


def _is_dist(x):
    return isinstance(x, Distribution)


class Prior:
    def __init__(self, tree):
        self.tree = tree
        leaves, treedef = jax.tree_util.tree_flatten(tree, is_leaf=_is_dist)
        if not all(_is_dist(l) for l in leaves):
            bad = [type(l).__name__ for l in leaves if not _is_dist(l)]
            raise TypeError(f"Prior leaves must be Distributions, got {bad}")
        self.leaves = leaves
        self.treedef = treedef
        self._event_sizes = [l.event_size for l in leaves]
        self._event_shapes = [l.event_shape for l in leaves]
        self._offsets = np.concatenate([[0], np.cumsum(self._event_sizes)])
        self.n_params = int(self._offsets[-1])

    # ------------------------------------------------------------------ info
    @property
    def d(self) -> int:
        """Total number of unconstrained dimensions (z columns)."""
        return self.n_params

    def column_names(self):
        """Human-readable name per z column, derived from the pytree paths."""
        paths = jax.tree_util.tree_flatten_with_path(self.tree, is_leaf=_is_dist)[0]
        names = []
        for (path, leaf) in paths:
            base = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
            if leaf.event_size == 1:
                names.append(base)
            else:
                names.extend(f"{base}[{i}]" for i in range(leaf.event_size))
        return names

    # -------------------------------------------------------------- sampling
    def sample(self, key, sample_shape=()):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        keys = jax.random.split(key, len(self.leaves))
        samples = [l.sample(k, sample_shape) for l, k in zip(self.leaves, keys)]
        return jax.tree_util.tree_unflatten(self.treedef, samples)

    def log_prob(self, x):
        xl = self._flatten_like(x)
        lp = 0.0
        for leaf, xv in zip(self.leaves, xl):
            lp = lp + leaf.log_prob(xv)
        return lp

    # ------------------------------------------------------- z-matrix packing
    def _flatten_like(self, x):
        xl, xdef = jax.tree_util.tree_flatten(x)
        # Structure must match, not just leaf count: a pytree with the same
        # number of leaves but different nesting/key order would silently
        # misalign z columns against the prior leaves.
        if xdef != self.treedef:
            raise ValueError(
                "params pytree structure does not match the prior: "
                f"got {xdef}, prior expects {self.treedef}"
            )
        return xl

    def unconstrain(self, x):
        """Constrained params pytree -> (..., d) unconstrained matrix."""
        xl = self._flatten_like(x)
        cols = []
        for leaf, xv, esh in zip(self.leaves, xl, self._event_shapes):
            z = leaf.bijector.inverse(xv)
            n_event = len(esh)
            batch_shape = jnp.shape(z)[: jnp.ndim(z) - n_event]
            cols.append(jnp.reshape(z, (*batch_shape, leaf.event_size)))
        return jnp.concatenate(cols, axis=-1)

    def _check_width(self, z):
        if jnp.shape(z)[-1] != self.n_params:
            raise ValueError(
                f"z has {jnp.shape(z)[-1]} columns, prior has d={self.n_params}"
            )

    def constrain(self, z):
        """(..., d) unconstrained matrix -> constrained params pytree."""
        self._check_width(z)
        out = []
        batch_shape = jnp.shape(z)[:-1]
        for leaf, esh, lo, hi in zip(
            self.leaves, self._event_shapes, self._offsets[:-1], self._offsets[1:]
        ):
            zi = jnp.reshape(z[..., lo:hi], (*batch_shape, *esh))
            out.append(leaf.bijector.forward(zi))
        return jax.tree_util.tree_unflatten(self.treedef, out)

    def fldj(self, z):
        """Sum of forward log-det-Jacobians over all columns; shape = batch."""
        self._check_width(z)
        total = jnp.zeros(jnp.shape(z)[:-1])
        for leaf, esh, lo, hi in zip(
            self.leaves, self._event_shapes, self._offsets[:-1], self._offsets[1:]
        ):
            batch_shape = jnp.shape(z)[:-1]
            zi = jnp.reshape(z[..., lo:hi], (*batch_shape, *esh))
            ld = leaf.bijector.forward_log_det_jacobian(zi)
            n_event = len(esh)
            if n_event:
                ld = jnp.sum(ld, axis=tuple(range(-n_event, 0)))
            total = total + ld
        return total

    def log_prob_z(self, z):
        """Prior density of unconstrained z (constrained log-prob + Jacobian)."""
        return self.log_prob(self.constrain(z)) + self.fldj(z)
