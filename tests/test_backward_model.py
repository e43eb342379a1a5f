"""BackwardProbModel: linear-amplitude inference end-to-end."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.inference import ModellingSequence
from gigalens_tpu.model import BackwardProbModel
from gigalens_tpu.prob import Prior
from gigalens_tpu.prob import distributions as gld
from gigalens_tpu.profiles.light.sersic import SersicEllipse
from gigalens_tpu.profiles.mass.sie import SIE
from gigalens_tpu.simulator import LensSimulator


def _setup():
    prior = Prior(
        dict(
            lens_mass=[dict(theta_E=gld.LogNormal(0.0, 0.2),
                            e1=gld.Normal(0, 0.1), e2=gld.Normal(0, 0.1),
                            center_x=gld.Normal(0, 0.05), center_y=gld.Normal(0, 0.05))],
            source_light=[dict(R_sersic=gld.LogNormal(np.log(0.25), 0.15),
                               n_sersic=gld.Uniform(0.5, 4),
                               e1=gld.Normal(0, 0.1), e2=gld.Normal(0, 0.1),
                               center_x=gld.Normal(0, 0.2), center_y=gld.Normal(0, 0.2))],
        )
    )
    # lstsq source: amplitude solved linearly, not sampled
    phys = PhysicalModel([SIE()], [], [SersicEllipse(use_lstsq=True)])
    cfg = SimulatorConfig(delta_pix=0.1, num_pix=24, supersample=2)
    return prior, phys, cfg


def test_backward_log_prob_and_map():
    prior, phys, cfg = _setup()

    # synthesize data with a KNOWN amplitude using the non-lstsq twin
    phys_amp = PhysicalModel([SIE()], [], [SersicEllipse(use_lstsq=False)])
    truth = prior.sample(jax.random.PRNGKey(3), 1)
    truth_amp = jax.tree_util.tree_map(lambda x: x, truth)
    truth_amp["source_light"][0]["Ie"] = jnp.array([80.0])
    sim_t = LensSimulator(phys_amp, cfg, bs=1)
    obs = np.asarray(sim_t.simulate(truth_amp))

    pm = BackwardProbModel(prior, obs, background_rms=0.1, exp_time=100)
    sim = LensSimulator(phys, cfg, bs=4)
    z = prior.unconstrain(prior.sample(jax.random.PRNGKey(0), 4))
    lp, red_chi2 = pm.log_prob(sim, z)
    assert lp.shape == (4,) and np.isfinite(np.asarray(lp)).all()

    # at the true nonlinear params the lstsq amplitudes give chi2 ~ 0
    z_true = prior.unconstrain(truth)
    sim1 = LensSimulator(phys, cfg, bs=1)
    _, chi2_true = pm.log_prob(sim1, z_true)
    assert float(chi2_true[0]) < 1e-3, float(chi2_true[0])

    # recovered amplitude equals the injected one
    coeffs = sim1.lstsq_simulate(truth, pm.observed_image, pm.err_map,
                                 return_coeffs=True)
    np.testing.assert_allclose(np.asarray(coeffs)[0], [80.0], rtol=1e-3)

    # short MAP through the backward model moves toward higher posterior
    seq = ModellingSequence(phys, pm, cfg)
    z0 = prior.unconstrain(prior.sample(jax.random.PRNGKey(1), 8))
    lp0, _ = pm.log_prob(LensSimulator(phys, cfg, bs=8), z0)
    z1 = seq.MAP(optax.adam(1e-2), start=z0, n_samples=8, num_steps=25)
    lp1, _ = pm.log_prob(LensSimulator(phys, cfg, bs=8), z1)
    assert float(jnp.mean(lp1)) > float(jnp.mean(lp0))


def test_survey_backward_matches_single_scene():
    """SurveyBackwardProbModel: scene-batched lstsq stats == per-scene
    BackwardProbModel, per-scene noise arrays included."""
    from gigalens_tpu.model import SurveyBackwardProbModel

    prior, phys, cfg = _setup()
    phys_amp = PhysicalModel([SIE()], [], [SersicEllipse(use_lstsq=False)])
    truths = prior.sample(jax.random.PRNGKey(5), 2)
    truths["source_light"][0]["Ie"] = jnp.asarray([60.0, 110.0])
    sim_t = LensSimulator(phys_amp, cfg, bs=2)
    obs = np.asarray(jax.jit(sim_t.simulate)(truths))

    bkgs, exps = np.asarray([0.1, 0.25]), np.asarray([100.0, 60.0])
    spm = SurveyBackwardProbModel(prior, obs, background_rms=bkgs, exp_time=exps)
    K = 3
    z = prior.unconstrain(prior.sample(jax.random.PRNGKey(1), 2 * K))
    sim = LensSimulator(phys, cfg, bs=2 * K)
    lp, chi = jax.jit(lambda z: spm.log_prob(sim, z))(z)
    assert np.isfinite(np.asarray(lp)).all()

    sim_k = LensSimulator(phys, cfg, bs=K)
    for s in range(2):
        pm = BackwardProbModel(prior, obs[s], background_rms=float(bkgs[s]),
                               exp_time=float(exps[s]))
        lp_one, chi_one = jax.jit(lambda z: pm.log_prob(sim_k, z))(
            z[s * K : (s + 1) * K]
        )
        np.testing.assert_allclose(
            np.asarray(lp[s * K : (s + 1) * K]), np.asarray(lp_one),
            rtol=1e-5, atol=1e-2,
        )
        np.testing.assert_allclose(
            np.asarray(chi[s * K : (s + 1) * K]), np.asarray(chi_one),
            rtol=1e-4,
        )

    # drives through SurveySequence (MAP on the lstsq path)
    from gigalens_tpu.inference.survey import SurveySequence

    seq = SurveySequence(phys, spm, cfg)
    z_map = seq.MAP(optax.adam(2e-3), n_starts=8, num_steps=10, seed=0)
    best = seq.best_per_scene(z_map)
    assert best.shape == (2, prior.d)
    assert np.isfinite(np.asarray(best)).all()
