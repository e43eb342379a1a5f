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


def test_summarize_posterior_names_and_values(demo_prior):
    """Summary keys follow the prior's column names; constrained stats match
    directly computed ones; global block carries rhat/ess/divergences."""
    from gigalens_tpu.utils import format_summary, summarize_posterior

    d = demo_prior.d
    key = jax.random.PRNGKey(0)
    # synthetic "chains": prior draws arranged as (T, C, d)
    z = demo_prior.unconstrain(demo_prior.sample(key, 40 * 4))
    chains = jnp.reshape(z, (40, 4, d))
    s = summarize_posterior(demo_prior, chains, divergences=jnp.asarray([0, 2]))
    names = demo_prior.column_names()
    assert set(names) <= set(s.keys())
    assert "lens_mass/0/theta_E" in s
    assert s["_global"]["divergences"] == 2
    assert s["_global"]["max_rhat"] >= 1.0 - 1e-3
    # theta_E stats in PHYSICAL space: recompute directly
    x = demo_prior.constrain(jnp.reshape(chains, (-1, d)))
    te = np.asarray(x["lens_mass"][0]["theta_E"])
    np.testing.assert_allclose(s["lens_mass/0/theta_E"]["mean"], te.mean(),
                               rtol=1e-5)
    np.testing.assert_allclose(s["lens_mass/0/theta_E"]["q50"],
                               np.quantile(te, 0.5), rtol=1e-4)
    # flat (n, d) input: no rhat/ess keys
    s2 = summarize_posterior(demo_prior, z)
    assert "rhat" not in s2["lens_mass/0/theta_E"]
    txt = format_summary(s)
    assert "theta_E" in txt and "max_rhat" in txt


def test_sequence_summarize_convenience(demo_prior, demo_physmodel,
                                        small_sim_config):
    """ModellingSequence.summarize == summarize_posterior on the result."""
    from gigalens_tpu.inference import ModellingSequence
    from gigalens_tpu.inference.hmc import HMCResult
    from gigalens_tpu.model import ForwardProbModel

    pm = ForwardProbModel(demo_prior, np.zeros((20, 20), np.float32),
                          background_rms=0.1, exp_time=100)
    seq = ModellingSequence(demo_physmodel, pm, small_sim_config)
    z = demo_prior.unconstrain(demo_prior.sample(jax.random.PRNGKey(0), 80))
    res = HMCResult(jnp.reshape(z, (20, 4, demo_prior.d)), jnp.zeros(20),
                    jnp.float32(0.1), z[:4],
                    jnp.float32(0.5), jnp.zeros((4,), jnp.int32))
    s = seq.summarize(res)
    assert "lens_mass/0/theta_E" in s
    assert s["_global"]["divergences"] == 0


def test_find_images_sis_analytic():
    """SIS lens: a source at beta < theta_E on the x-axis has exactly two
    images at x = beta + theta_E and x = beta - theta_E, with known
    magnifications (theta/beta at each image)."""
    from gigalens_tpu import PhysicalModel, SimulatorConfig
    from gigalens_tpu.profiles.light.sersic import SersicEllipse
    from gigalens_tpu.profiles.mass.sie import SIS
    from gigalens_tpu.simulator import LensSimulator
    from gigalens_tpu.utils import find_images

    theta_E, beta = 1.2, 0.3
    phys = PhysicalModel([SIS()], [], [SersicEllipse()])
    cfg = SimulatorConfig(delta_pix=0.08, num_pix=50, supersample=2)
    sim = LensSimulator(phys, cfg, bs=1)
    lens_params = [dict(theta_E=jnp.asarray([theta_E]),
                        center_x=jnp.asarray([0.0]),
                        center_y=jnp.asarray([0.0]))]
    ix, iy, mags = find_images(sim, lens_params, beta, 0.0,
                               search_window=6.0)
    assert len(ix) == 2, (ix, iy)
    got = np.sort(ix)
    np.testing.assert_allclose(got, [beta - theta_E, beta + theta_E],
                               atol=1e-4)
    np.testing.assert_allclose(iy, 0.0, atol=1e-4)
    # SIS magnifications: theta / beta at each image -> |mu| = theta/|beta|
    want_mu = np.sort(np.abs(np.asarray(
        [(beta + theta_E) / beta, (theta_E - beta) / beta])))
    np.testing.assert_allclose(np.sort(np.abs(mags)), want_mu, rtol=1e-3)


def test_checkpointer_smc_roundtrip(tmp_path):
    from gigalens_tpu.inference.smc import SMCResult
    from gigalens_tpu.utils.checkpoint import PipelineCheckpointer

    cp = PipelineCheckpointer(str(tmp_path))
    res = SMCResult(jnp.ones((8, 2, 3)), jnp.asarray(7),
                    jnp.zeros((8, 2)), jnp.ones((4, 16, 3)),
                    jnp.ones(2), jnp.asarray([-3.5, -3.6]))
    r1 = cp.run_smc(lambda: res)
    r2 = cp.run_smc(lambda: (_ for _ in ()).throw(AssertionError("no rerun")))
    np.testing.assert_allclose(r1.particles, r2.particles)
    np.testing.assert_allclose(np.asarray(r2.log_evidence), [-3.5, -3.6])
    assert int(r2.num_stages) == 7
