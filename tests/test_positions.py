"""Multiple-image position likelihood + convenience renders."""
import jax
import jax.numpy as jnp
import numpy as np

from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.model import ForwardProbModel
from gigalens_tpu.prob import Prior
from gigalens_tpu.prob import distributions as gld
from gigalens_tpu.profiles.light.sersic import SersicEllipse
from gigalens_tpu.profiles.mass.sie import SIS
from gigalens_tpu.simulator import LensSimulator


def _point_source_prior():
    return Prior(
        dict(lens_mass=[dict(theta_E=gld.LogNormal(0.0, 0.2),
                             center_x=gld.Normal(0, 0.1),
                             center_y=gld.Normal(0, 0.1))])
    )


def _sis_images(theta_E, beta):
    """SIS with source at (beta, 0): images at beta +/- theta_E on the x-axis."""
    return np.array([beta + theta_E, beta - theta_E]), np.array([0.0, 0.0])


def test_positions_likelihood_peaks_at_truth():
    prior = _point_source_prior()
    theta_true = 1.0
    img_x, img_y = _sis_images(theta_true, 0.15)
    pm = ForwardProbModel(
        prior,
        centroids_x=[img_x],
        centroids_y=[img_y],
        centroids_errors_x=[np.full(2, 0.01)],
        centroids_errors_y=[np.full(2, 0.01)],
        include_pixels=False,
        include_positions=True,
    )
    assert pm.n_position == 4
    phys = PhysicalModel([SIS()], [], [])
    cfg = SimulatorConfig(delta_pix=0.1, num_pix=8)
    sim = LensSimulator(phys, cfg, bs=5)

    thetas = np.array([0.8, 0.9, 1.0, 1.1, 1.2], np.float32)
    x = dict(lens_mass=[dict(theta_E=jnp.asarray(thetas),
                             center_x=jnp.zeros(5), center_y=jnp.zeros(5))])
    z = prior.unconstrain(x)
    lp, red_chi2 = pm.log_prob(sim, z)
    # the true Einstein radius maps both images to the same source position
    assert int(jnp.argmax(lp)) == 2, np.asarray(lp)
    assert float(red_chi2[2]) < 1e-3


def test_positions_plus_pixels_combined(demo_prior, demo_physmodel, small_sim_config):
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
    assert pm.include_pixels and pm.include_positions
    sim = LensSimulator(demo_physmodel, small_sim_config, bs=3)
    z = demo_prior.unconstrain(demo_prior.sample(jax.random.PRNGKey(0), 3))
    lp, chi2 = pm.log_prob(sim, z)
    assert lp.shape == (3,) and np.isfinite(np.asarray(lp)).all()


def test_convenience_renders(demo_prior, demo_physmodel):
    cfg = SimulatorConfig(delta_pix=0.065, num_pix=32, supersample=2)
    sim = LensSimulator(demo_physmodel, cfg, bs=1)
    x = demo_prior.sample(jax.random.PRNGKey(1), 1)
    full = np.asarray(sim.simulate(x))
    lens_only = np.asarray(sim.simulate_lens_light(x))
    lensed_src = np.asarray(sim.simulate_images(x))
    unlensed_src = np.asarray(sim.simulate_source(x))
    np.testing.assert_allclose(lens_only + lensed_src, full, rtol=1e-4, atol=1e-4)
    assert not np.allclose(lensed_src, unlensed_src)
