"""Diagnostics and checkpointing."""
import jax
import jax.numpy as jnp
import numpy as np

from gigalens_tpu.utils import (
    PipelineCheckpointer,
    effective_sample_size,
    potential_scale_reduction,
)


def test_rhat_converged_chains(rng):
    chains = rng.normal(size=(500, 8, 3)).astype(np.float32)
    r = np.asarray(potential_scale_reduction(chains))
    assert np.all(np.abs(r - 1.0) < 0.05), r


def test_rhat_detects_disagreement(rng):
    chains = rng.normal(size=(500, 8, 2)).astype(np.float32)
    chains[:, 0, 0] += 5.0  # one chain stuck elsewhere
    r = np.asarray(potential_scale_reduction(chains))
    assert r[0] > 1.5 and abs(r[1] - 1.0) < 0.05


def test_ess_iid_is_full(rng):
    chains = rng.normal(size=(400, 6, 2)).astype(np.float32)
    ess = np.asarray(effective_sample_size(chains))
    assert np.all(ess > 0.5 * 400 * 6), ess


def test_ess_correlated_is_reduced(rng):
    # AR(1) with strong correlation: ESS ~ N (1-rho)/(1+rho)
    rho = 0.9
    n, m = 2000, 4
    eps = rng.normal(size=(n, m, 1)).astype(np.float32)
    x = np.zeros((n, m, 1), np.float32)
    for t in range(1, n):
        x[t] = rho * x[t - 1] + np.sqrt(1 - rho**2) * eps[t]
    ess = float(effective_sample_size(x)[0])
    expected = n * m * (1 - rho) / (1 + rho)
    assert 0.4 * expected < ess < 2.5 * expected, (ess, expected)


def test_pipeline_checkpointer(tmp_path):
    from gigalens_tpu.inference.hmc import HMCResult
    from gigalens_tpu.prob.distributions import MultivariateNormalTriL

    cp = PipelineCheckpointer(str(tmp_path))
    calls = {"map": 0}

    def run():
        calls["map"] += 1
        return jnp.ones((4, 3)), jnp.zeros(5)

    z1, _ = cp.run_map(run)
    z2, _ = cp.run_map(run)
    assert calls["map"] == 1
    np.testing.assert_allclose(z1, z2)

    q = MultivariateNormalTriL(jnp.zeros(3), jnp.eye(3))
    q2, _ = cp.run_svi(lambda: (q, jnp.zeros(2)))
    q3, _ = cp.run_svi(lambda: (_ for _ in ()).throw(AssertionError("should not rerun")))
    np.testing.assert_allclose(q2.covariance(), q3.covariance())

    res = HMCResult(jnp.ones((5, 2, 3)), jnp.zeros(7), jnp.float32(0.1), jnp.ones((2, 3)))
    r2 = cp.run_hmc(lambda: res)
    r3 = cp.run_hmc(lambda: (_ for _ in ()).throw(AssertionError))
    np.testing.assert_allclose(r2.samples, r3.samples)
