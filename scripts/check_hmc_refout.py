"""Regression probe for refactors of the HMC step.

Finding from the per-group (survey-mode) generalization: the G=1 path is
bitwise-identical for the first steps, then picks up 1-ulp differences from
reduction-shape changes (means over ``(1, C)`` axis-1 vs flat ``(C,)``),
which amplify chaotically along trajectories — so cross-refactor comparison
must be statistical, not bitwise. This script checks posterior moments of a
known Gaussian target for G=1 and a two-geometry G=2 run.
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import os
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
from gigalens_tpu.inference.hmc import sample_hmc


def check_single():
    d = 4
    scales = jnp.asarray([1.0, 2.0, 0.5, 1.5])

    def log_prob(z):
        return -0.5 * jnp.sum((z / scales) ** 2, -1)

    z0 = jax.random.normal(jax.random.PRNGKey(0), (8, d))
    res = sample_hmc(
        log_prob, z0, jax.random.PRNGKey(1),
        step_size=0.2, num_leapfrog_steps=3,
        num_burnin_steps=200, num_results=800,
        momentum_covariance_tril=jnp.diag(scales * 0.9),
        trajectory_adaptation="chees", mass_adaptation=True,
    )
    s = np.asarray(res.samples).reshape(-1, d)
    np.testing.assert_allclose(s.std(0), np.asarray(scales), rtol=0.1)
    assert float(res.step_size) > 0 and np.isscalar(float(res.step_size))
    print("G=1 OK: std", s.std(0), "eps", float(res.step_size))


def check_grouped():
    d, C = 3, 16
    scales_g = jnp.asarray([0.1, 3.0])

    def log_prob(z):
        s = jnp.repeat(scales_g, C)[:, None]
        return -0.5 * jnp.sum((z / s) ** 2, -1)

    z0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (2 * C, d))
    tril = jnp.stack([jnp.eye(d) * 0.1, jnp.eye(d) * 3.0])
    res = sample_hmc(
        log_prob, z0, jax.random.PRNGKey(1), step_size=0.2,
        num_leapfrog_steps=3, num_burnin_steps=200, num_results=500,
        momentum_covariance_tril=tril, trajectory_adaptation="chees",
        mass_adaptation=True, n_groups=2,
    )
    s = np.asarray(res.samples)
    np.testing.assert_allclose(s[:, :C].reshape(-1, d).std(0), 0.1, rtol=0.15)
    np.testing.assert_allclose(s[:, C:].reshape(-1, d).std(0), 3.0, rtol=0.15)
    assert res.step_size.shape == (2,)
    print("G=2 OK: eps", np.asarray(res.step_size))


if __name__ == "__main__":
    check_single()
    check_grouped()
    print("HMC REFOUT OK")
