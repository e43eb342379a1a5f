"""Inference drivers: optimizer plumbing, HMC/SMC statistical correctness.

Uses the reference's cheap deterministic tricks (zero-lr no-op, nonzero-lr
moves params; reference tests/tf/test_model.py:29-57) plus exact statistical
checks on Gaussian targets that the reference lacks.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gigalens_tpu.inference import ModellingSequence, fit_smc, sample_hmc
from gigalens_tpu.model import ForwardProbModel
from gigalens_tpu.simulator import LensSimulator


@pytest.fixture(scope="module")
def seq(demo_prior, demo_physmodel, small_sim_config):
    pm = ForwardProbModel(
        demo_prior, np.zeros((20, 20), np.float32), background_rms=0.1, exp_time=100
    )
    return ModellingSequence(demo_physmodel, pm, small_sim_config)


def test_map_zero_lr_is_noop(seq, demo_prior):
    start = demo_prior.unconstrain(demo_prior.sample(jax.random.PRNGKey(0), 8))
    z = seq.MAP(optax.adam(0.0), start=start, n_samples=8, num_steps=3)
    np.testing.assert_allclose(z, start, rtol=1e-6)


def test_map_nonzero_lr_moves(seq, demo_prior):
    start = demo_prior.unconstrain(demo_prior.sample(jax.random.PRNGKey(0), 8))
    z = seq.MAP(optax.adam(1e-3), start=start, n_samples=8, num_steps=3)
    assert not np.allclose(np.asarray(z), np.asarray(start))


def test_svi_zero_lr_keeps_mean(seq, demo_prior):
    start = demo_prior.unconstrain(demo_prior.sample(jax.random.PRNGKey(1), 1))
    q_z, losses = seq.SVI(start, optax.adam(0.0), n_vi=4, num_steps=3)
    np.testing.assert_allclose(q_z.mean(), start[0], rtol=1e-6)
    assert losses.shape == (3,)


def test_svi_nonzero_lr_moves(seq, demo_prior):
    start = demo_prior.unconstrain(demo_prior.sample(jax.random.PRNGKey(1), 1))
    q_z, _ = seq.SVI(start, optax.adam(1e-3), n_vi=4, num_steps=3)
    assert not np.allclose(np.asarray(q_z.mean()), np.asarray(start[0]))


def test_hmc_shapes(seq, demo_prior):
    from gigalens_tpu.prob.distributions import MultivariateNormalTriL

    d = demo_prior.d
    start = demo_prior.unconstrain(demo_prior.sample(jax.random.PRNGKey(1), 1))
    q_z = MultivariateNormalTriL(start[0], jnp.eye(d) * 1e-3)
    res = seq.HMC(q_z, n_hmc=8, num_burnin_steps=4, num_results=6)
    assert res.samples.shape == (6, 8, d)
    assert np.isfinite(np.asarray(res.samples)).all()


def test_hmc_gaussian_moments():
    """HMC must reproduce a correlated Gaussian's mean and covariance."""
    d = 4
    rng = np.random.default_rng(0)
    A = rng.normal(size=(d, d)).astype(np.float32)
    cov = A @ A.T + np.eye(d, dtype=np.float32)
    prec = np.linalg.inv(cov)
    mean = np.arange(d, dtype=np.float32)

    def log_prob(z):
        diff = z - mean
        return -0.5 * jnp.sum((diff @ prec) * diff, -1)

    res = sample_hmc(
        log_prob,
        jnp.zeros((32, d)) + mean,
        jax.random.PRNGKey(0),
        step_size=0.3,
        num_leapfrog_steps=3,
        num_burnin_steps=300,
        num_results=1500,
        momentum_covariance=jnp.asarray(cov),
    )
    s = np.asarray(res.samples).reshape(-1, d)
    assert float(res.accept_rate[-200:].mean()) > 0.6
    np.testing.assert_allclose(s.mean(0), mean, atol=0.15)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.6, rtol=0.25)


def test_warmup_adaptations_improve_ess():
    """Correlated Gaussian, deliberately bad (identity) initial preconditioner:
    ChEES trajectory adaptation must beat static L=3, and windowed mass
    adaptation must beat both by learning the covariance during warmup."""
    from gigalens_tpu.utils import effective_sample_size

    d = 6
    rng = np.random.default_rng(0)
    A = rng.normal(size=(d, d)).astype(np.float32)
    cov = A @ A.T + np.eye(d, dtype=np.float32)
    prec = np.linalg.inv(cov)

    def log_prob(z):
        return -0.5 * jnp.sum((z @ prec) * z, -1)

    def run(mode, mass):
        return sample_hmc(
            log_prob, jnp.zeros((32, d)), jax.random.PRNGKey(0),
            step_size=0.2, num_leapfrog_steps=3,
            num_burnin_steps=300, num_results=800,
            trajectory_adaptation=mode, max_leapfrog_steps=30,
            mass_adaptation=mass,
        )

    def min_ess(res):
        return float(np.asarray(effective_sample_size(res.samples)).min())

    ess_static = min_ess(run("none", False))
    res_chees = run("chees", False)
    ess_chees = min_ess(res_chees)
    ess_mass = min_ess(run("none", True))
    assert ess_chees > 1.2 * ess_static, (ess_chees, ess_static)
    assert ess_mass > 2.0 * ess_static, (ess_mass, ess_static)
    t_final = float(res_chees.trajectory_length)
    eps = float(res_chees.step_size)
    assert t_final > 2.0 * eps * 3 / 2, (t_final, eps)  # grew beyond L~3 scale
    # moments still correct
    s = np.asarray(res_chees.samples).reshape(-1, d)
    np.testing.assert_allclose(np.var(s, 0), np.diag(cov), rtol=0.25)


class _GaussianTargetModel:
    """Duck-typed prob_model exposing the SMC interface for a conjugate
    Gaussian problem: prior N(0, 1) per dim, likelihood N(1, 0.5^2) per dim,
    posterior N(0.8, 0.2) per dim."""

    class _P:
        d = 3

        def log_prob_z(self, z):
            return -0.5 * jnp.sum(z**2, -1)

        def constrain(self, z):
            return z

        def unconstrain(self, x):
            return x

        def sample(self, key, shape):
            if isinstance(shape, int):
                shape = (shape,)
            return jax.random.normal(key, (*shape, self.d))

    prior = _P()

    def stats_pixels(self, sim, x):
        ll = jnp.sum(-0.5 * ((x - 1.0) / 0.5) ** 2, -1)
        return ll, ll

    def stats_positions(self, sim, x):
        return jnp.zeros(x.shape[0]), jnp.zeros(x.shape[0])


def test_smc_gaussian_posterior():
    pm = _GaussianTargetModel()
    res = fit_smc(
        pm,
        simulator=None,
        num_particles=400,
        num_ensembles=2,
        num_leapfrog_steps=5,
        post_sampling_steps=50,
        max_stage=50,
        target="pixels",
        auxiliar="none",
        seed=0,
    )
    assert float(res.final_beta.min()) == 1.0
    s = np.asarray(res.post_samples[-30:]).reshape(-1, 3)
    # posterior: var = 1/(1/1 + 1/0.25) = 0.2, mean = 0.2 * (1/0.25) = 0.8
    np.testing.assert_allclose(s.mean(0), [0.8] * 3, atol=0.08)
    np.testing.assert_allclose(s.var(0), [0.2] * 3, atol=0.07)
    # log evidence: Z = prod_d int N(z;0,1) exp(-0.5 (z-1)^2/0.25) dz
    #             = (sqrt(0.25/1.25) * exp(-0.5/1.25))^3
    log_z_true = 3 * (0.5 * np.log(0.25 / 1.25) - 0.5 / 1.25)
    lz = np.asarray(res.log_evidence)
    assert lz.shape == (2,)
    np.testing.assert_allclose(lz, log_z_true, atol=0.2)


def test_smc_pixels_only_default_aux_and_segments(seq):
    """Default auxiliar="positions" degrades to "none" on a pixels-only
    model, and segmented dispatch matches the run semantics (beta advances,
    particles finite)."""
    res = seq.SMC(num_particles=16, num_ensembles=1, num_leapfrog_steps=2,
                  post_sampling_steps=2, max_stage=3, seed=0,
                  segment_stages=1)
    assert np.isfinite(np.asarray(res.particles)).all()
    assert float(res.final_beta[0]) > 0.0
    assert int(res.num_stages) <= 3


def test_svi_mean_field_ansatz(seq, demo_prior):
    """full_rank=False (reference tf/inference.py:62-66 parity): diagonal
    scale, d+d variational params, still usable as an HMC preconditioner."""
    start = demo_prior.unconstrain(demo_prior.sample(jax.random.PRNGKey(1), 1))
    q_z, losses = seq.SVI(start, optax.adam(1e-3), n_vi=4, num_steps=3,
                          full_rank=False)
    tril = np.asarray(q_z.scale_tril)
    assert tril.shape == (demo_prior.d, demo_prior.d)
    # strictly diagonal scale factor
    np.testing.assert_allclose(tril, np.diag(np.diagonal(tril)))
    assert np.all(np.diagonal(tril) > 0)
    assert losses.shape == (3,)
    # matrix init_scales contributes its diagonal
    L0 = np.diag(np.linspace(0.1, 0.2, demo_prior.d)).astype(np.float32)
    q_z2, _ = seq.SVI(start, optax.adam(0.0), n_vi=4, num_steps=2,
                      init_scales=L0, full_rank=False)
    np.testing.assert_allclose(
        np.diagonal(np.asarray(q_z2.scale_tril)), np.diagonal(L0), rtol=1e-4
    )
    # a 1-D per-dimension scale vector — the canonical mean-field
    # initializer — must work in both ansatzes (regression: used to raise
    # "diag requires an array of at least two dimensions")
    v0 = np.linspace(0.05, 0.3, demo_prior.d).astype(np.float32)
    q_z3, _ = seq.SVI(start, optax.adam(0.0), n_vi=4, num_steps=2,
                      init_scales=v0, full_rank=False)
    np.testing.assert_allclose(
        np.diagonal(np.asarray(q_z3.scale_tril)), v0, rtol=1e-4
    )
    q_z4, _ = seq.SVI(start, optax.adam(0.0), n_vi=4, num_steps=2,
                      init_scales=v0, full_rank=True)
    np.testing.assert_allclose(
        np.diagonal(np.asarray(q_z4.scale_tril)), v0, rtol=1e-3
    )


def test_progress_callbacks_fire(seq, demo_prior):
    """MAP/SVI/HMC live-progress hooks (reference tqdm parity)."""
    from gigalens_tpu.prob.distributions import MultivariateNormalTriL

    start = demo_prior.unconstrain(demo_prior.sample(jax.random.PRNGKey(0), 8))
    calls = []
    seq.MAP(optax.adam(1e-3), start=start, n_samples=8, num_steps=4,
            segment_steps=2, progress=lambda s, v: calls.append((s, v)))
    assert [s for s, _ in calls] == [2, 4]
    assert all(np.isfinite(v) for _, v in calls)

    calls = []
    seq.SVI(start[:1], optax.adam(1e-3), n_vi=4, num_steps=4, segment_steps=2,
            progress=lambda s, v: calls.append((s, v)))
    assert [s for s, _ in calls] == [2, 4]

    calls = []
    q_z = MultivariateNormalTriL(start[0], jnp.eye(demo_prior.d) * 1e-3)
    seq.HMC(q_z, n_hmc=8, num_burnin_steps=2, num_results=4, segment_steps=3,
            progress=lambda s, v: calls.append((s, v)))
    assert [s for s, _ in calls] == [3, 6]


def test_smc_combined_target_and_start_subsample(
    demo_prior, demo_physmodel, small_sim_config
):
    """target="pixels+positions" anneals BOTH likelihood terms from the
    prior (the robust mode when the magnification-scaled position term has
    huge log-likelihood magnitudes — see inference/smc.py docstring), and a
    ``start`` with fewer rows than particles subsamples with replacement."""
    pm = ForwardProbModel(
        demo_prior,
        observed_image=np.zeros((20, 20), np.float32),
        background_rms=0.1,
        exp_time=100,
        centroids_x=[np.array([0.5, -0.5])],
        centroids_y=[np.array([0.1, -0.1])],
        centroids_errors_x=[np.full(2, 0.05)],
        centroids_errors_y=[np.full(2, 0.05)],
    )
    seq2 = ModellingSequence(demo_physmodel, pm, small_sim_config)
    start = demo_prior.unconstrain(demo_prior.sample(jax.random.PRNGKey(0), 4))
    res = seq2.SMC(start=start, num_particles=16, num_ensembles=1,
                   num_leapfrog_steps=2, post_sampling_steps=2, max_stage=3,
                   target="pixels+positions", auxiliar="none", seed=0)
    assert np.isfinite(np.asarray(res.particles)).all()
    assert float(res.final_beta[0]) > 0.0


def test_smc_callable_target():
    """target/auxiliar accept callables (custom science terms): a callable
    Gaussian target reproduces the named-selector posterior semantics."""
    pm = _GaussianTargetModel()

    def my_like(x):  # same likelihood as stats_pixels, as a raw callable
        return jnp.sum(-0.5 * ((x - 1.0) / 0.5) ** 2, -1)

    res = fit_smc(
        pm, simulator=None, num_particles=300, num_ensembles=1,
        num_leapfrog_steps=5, post_sampling_steps=0, max_stage=50,
        target=my_like, auxiliar="none", seed=0,
    )
    assert float(res.final_beta.min()) == 1.0
    s = np.asarray(res.particles).reshape(-1, 3)
    np.testing.assert_allclose(s.mean(0), [0.8] * 3, atol=0.1)
    np.testing.assert_allclose(s.var(0), [0.2] * 3, atol=0.08)


def test_importance_evidence_conjugate():
    """IS evidence with an exact surrogate reproduces the analytic log Z of
    the conjugate Gaussian (same truth the SMC estimator is tested against),
    with near-perfect weight ESS; a mismatched surrogate degrades n_eff."""
    from gigalens_tpu.inference.svi import importance_evidence
    from gigalens_tpu.prob.distributions import MultivariateNormalTriL

    pm = _GaussianTargetModel()

    class _PM:
        prior = pm.prior

        def log_prob(self, sim, z):
            ll = jnp.sum(-0.5 * ((z - 1.0) / 0.5) ** 2, -1)
            lp = -0.5 * jnp.sum(z**2, -1) - 1.5 * jnp.log(2 * jnp.pi)
            return ll + lp, ll

    # exact posterior as surrogate: N(0.8, 0.2) per dim
    q = MultivariateNormalTriL(jnp.full(3, 0.8), jnp.eye(3) * np.sqrt(0.2))
    log_z, n_eff = importance_evidence(_PM(), None, q, n_samples=4096, seed=0)
    log_z_true = 3 * (0.5 * np.log(0.25 / 1.25) - 0.5 / 1.25)
    np.testing.assert_allclose(log_z, log_z_true, atol=0.02)
    assert n_eff > 3000, n_eff

    # overdispersed, offset surrogate: estimate still unbiased-ish but the
    # weight ESS collapses -> the documented quality gate fires
    q_bad = MultivariateNormalTriL(jnp.full(3, -1.5), jnp.eye(3) * 1.5)
    log_z_b, n_eff_b = importance_evidence(_PM(), None, q_bad,
                                           n_samples=4096, seed=0)
    assert n_eff_b < n_eff / 3, (n_eff_b, n_eff)


def test_multi_window_mass_adaptation_moments():
    """mass_adaptation=2 (two Stan-style warmup windows) keeps correct
    posterior moments and a healthy acceptance on the correlated Gaussian."""
    d = 5
    rng = np.random.default_rng(1)
    A = rng.normal(size=(d, d)).astype(np.float32)
    cov = A @ A.T + np.eye(d, dtype=np.float32)
    prec = np.linalg.inv(cov)

    def log_prob(z):
        return -0.5 * jnp.sum((z @ prec) * z, -1)

    res = sample_hmc(
        log_prob, jnp.zeros((32, d)), jax.random.PRNGKey(0),
        step_size=0.2, num_leapfrog_steps=3,
        num_burnin_steps=400, num_results=800,
        trajectory_adaptation="chees", mass_adaptation=2,
    )
    s = np.asarray(res.samples).reshape(-1, d)
    assert float(np.asarray(res.accept_rate)[-200:].mean()) > 0.5
    np.testing.assert_allclose(np.var(s, 0), np.diag(cov), rtol=0.3)
    np.testing.assert_allclose(s.mean(0), 0.0, atol=0.35)


def test_fit_one_call_pipeline(tmp_path, seq):
    """fit(): full MAP -> Laplace -> SVI -> HMC in one call, resumable."""
    out = seq.fit(
        n_samples=8, map_steps=10, n_vi=8, vi_steps=10, n_hmc=4,
        num_burnin_steps=8, num_results=12, seed=0,
        checkpoint_dir=str(tmp_path),
    )
    assert out["hmc"].samples.shape[0] == 12
    assert np.isfinite(np.asarray(out["hmc"].samples)).all()
    assert set(out["times"]) == {"map", "svi", "hmc"}
    assert "summary" in out

    # resume: all three phases load from disk -> samples identical
    calls = []
    out2 = seq.fit(
        n_samples=8, map_steps=10, n_vi=8, vi_steps=10, n_hmc=4,
        num_burnin_steps=8, num_results=12, seed=0,
        checkpoint_dir=str(tmp_path),
        progress=lambda ph, st, v: calls.append(ph),
    )
    np.testing.assert_array_equal(
        np.asarray(out["hmc"].samples), np.asarray(out2["hmc"].samples)
    )
    assert not calls  # nothing recomputed
