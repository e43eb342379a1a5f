"""Point-source (lensed quasar) modeling: lensing potentials (AD-checked
against deriv), Fermat potentials / time delays (SIS analytic oracle +
D_dt recovery), and magnification-ratio flux likelihoods. All beyond the
reference — see docs/pointsource.md."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.model import ForwardProbModel, _TD_DAYS
from gigalens_tpu.prob import Prior
from gigalens_tpu.prob import distributions as gld
from gigalens_tpu.profiles.mass.epl import EPL
from gigalens_tpu.profiles.mass.nfw import NFW
from gigalens_tpu.profiles.mass.point import MassSheet, PointMass
from gigalens_tpu.profiles.mass.shear import Shear
from gigalens_tpu.profiles.mass.sie import NIE, SIE, SIS
from gigalens_tpu.simulator import LensSimulator
from gigalens_tpu.utils.images import find_images

PROFILE_CASES = [
    (SIS(), dict(theta_E=1.1, center_x=0.05, center_y=-0.02)),
    (SIE(), dict(theta_E=1.0, e1=0.08, e2=-0.06, center_x=0.02, center_y=0.01)),
    (NIE(), dict(theta_E=1.0, e1=0.08, e2=-0.06, s_scale=0.15,
                 center_x=0.02, center_y=0.01)),
    (EPL(niter=30), dict(theta_E=1.0, gamma=2.2, e1=0.08, e2=-0.06,
                         center_x=0.02, center_y=0.01)),
    (Shear(), dict(gamma1=0.05, gamma2=-0.03)),
    (PointMass(), dict(theta_E=0.7, center_x=0.1, center_y=-0.1)),
    (MassSheet(), dict(kappa=0.08, center_x=0.0, center_y=0.0)),
    (NFW(), dict(Rs=1.0, alpha_Rs=0.6, center_x=0.0, center_y=0.0)),
]


@pytest.mark.parametrize(
    "profile,params", PROFILE_CASES, ids=[p[0].name for p in PROFILE_CASES]
)
def test_potential_gradient_is_deflection(profile, params):
    """grad(psi) == deriv, the defining property of the lensing potential."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0.4, 1.6, 40) * rng.choice([-1, 1], 40))
    y = jnp.asarray(rng.uniform(0.4, 1.6, 40) * rng.choice([-1, 1], 40))
    p = {k: jnp.float32(v) for k, v in params.items()}

    gx = jax.grad(lambda xx, yy: jnp.sum(profile.potential(xx, yy, **p)), 0)
    gy = jax.grad(lambda xx, yy: jnp.sum(profile.potential(xx, yy, **p)), 1)
    fx, fy = profile.deriv(x, y, **p)
    np.testing.assert_allclose(np.asarray(gx(x, y)), np.asarray(fx),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gy(x, y)), np.asarray(fy),
                               rtol=2e-4, atol=2e-5)


def test_sis_time_delay_analytic():
    """SIS, source at (beta, 0): images at beta +- theta_E, and the Fermat
    difference is exactly 2 * theta_E * beta."""
    theta_E, beta = 1.2, 0.15
    pm = PhysicalModel([SIS()], [], [])
    sim = LensSimulator(pm, SimulatorConfig(0.1, 8), bs=1)
    p = [dict(theta_E=jnp.array([theta_E]), center_x=jnp.array([0.0]),
              center_y=jnp.array([0.0]))]
    x = jnp.array([beta + theta_E, beta - theta_E])
    y = jnp.zeros(2)
    bx, by = sim.beta(x, y, p)
    np.testing.assert_allclose(np.asarray(bx), beta, atol=1e-6)
    tau = sim.fermat_potential(x, y, p, bx, by)
    dtau = float(tau[0, 0] - tau[0, 1])
    np.testing.assert_allclose(dtau, -2.0 * theta_E * beta, rtol=1e-5)


def _quad_setup():
    """A quad from an SIE+Shear truth: image positions, delays, fluxes."""
    pm = PhysicalModel([SIE(), Shear()], [], [])
    sim = LensSimulator(pm, SimulatorConfig(delta_pix=0.06, num_pix=60), bs=1)
    truth = [
        dict(theta_E=jnp.array([1.1]), e1=jnp.array([0.1]),
             e2=jnp.array([-0.05]), center_x=jnp.array([0.0]),
             center_y=jnp.array([0.0])),
        dict(gamma1=jnp.array([0.03]), gamma2=jnp.array([0.02])),
    ]
    src = (0.06, -0.04)
    ix, iy, mag = find_images(sim, truth, *src)
    assert len(ix) >= 4, f"expected a quad, got {len(ix)} images"
    ix, iy, mag = ix[:4], iy[:4], mag[:4]
    d_dt_true = 4200.0  # Mpc
    bx, by = sim.beta(jnp.asarray(ix), jnp.asarray(iy), truth)
    tau = np.asarray(
        sim.fermat_potential(
            jnp.asarray(ix), jnp.asarray(iy), truth,
            jnp.mean(bx, -1, keepdims=True), jnp.mean(by, -1, keepdims=True),
        )
    )[0]
    delays = _TD_DAYS * d_dt_true * (tau[1:] - tau[0])
    fluxes = 3.0 * np.abs(mag)
    return pm, sim, truth, ix, iy, delays, fluxes, d_dt_true


def test_time_delay_likelihood_recovers_d_dt():
    pm, sim, truth, ix, iy, delays, fluxes, d_dt_true = _quad_setup()
    prior = Prior(
        dict(
            lens_mass=[
                dict(theta_E=gld.LogNormal(np.log(1.1), 0.05)),
                dict(gamma1=gld.Normal(0.03, 0.01)),
            ],
            cosmo=[dict(D_dt=gld.LogNormal(np.log(4000.0), 0.5))],
        )
    )
    # lens params pinned to truth via constants; only theta_E/gamma1 vary
    pm_fit = PhysicalModel(
        [SIE(), Shear()], [], [],
        lenses_constants=[
            dict(e1=0.1, e2=-0.05, center_x=0.0, center_y=0.0),
            dict(gamma2=0.02),
        ],
    )
    sim_fit = LensSimulator(pm_fit, SimulatorConfig(0.06, 60), bs=11)
    model = ForwardProbModel(
        prior,
        centroids_x=[np.asarray(ix)], centroids_y=[np.asarray(iy)],
        centroids_errors_x=[np.full(len(ix), 0.004, np.float32)],
        centroids_errors_y=[np.full(len(ix), 0.004, np.float32)],
        delays=delays, delay_errors=np.full(len(delays), 0.5, np.float32),
    )
    assert model.time_delay_distance is None  # sampled via the cosmo group

    # profile the posterior along D_dt at the true lens params: the
    # maximum-likelihood D_dt must sit at the truth
    d_grid = np.linspace(3000.0, 5500.0, 11).astype(np.float32)
    x = dict(
        lens_mass=[
            dict(theta_E=jnp.full(11, 1.1)),
            dict(gamma1=jnp.full(11, 0.03)),
        ],
        cosmo=[dict(D_dt=jnp.asarray(d_grid))],
    )
    ll, _ = jax.jit(lambda p: model.stats_time_delays(sim_fit, p))(x)
    best = float(d_grid[int(np.argmax(np.asarray(ll)))])
    np.testing.assert_allclose(best, d_dt_true, rtol=0.07)


def test_flux_ratio_likelihood():
    pm, sim, truth, ix, iy, delays, fluxes, d_dt_true = _quad_setup()
    prior = Prior(dict(lens_mass=[
        dict(theta_E=gld.LogNormal(np.log(1.1), 0.05)),
        dict(gamma1=gld.Normal(0.03, 0.01)),
    ]))
    pm_fit = PhysicalModel(
        [SIE(), Shear()], [], [],
        lenses_constants=[
            dict(e1=0.1, e2=-0.05, center_x=0.0, center_y=0.0),
            dict(gamma2=0.02),
        ],
    )
    sim_fit = LensSimulator(pm_fit, SimulatorConfig(0.06, 60), bs=2)
    model = ForwardProbModel(
        prior,
        centroids_x=[np.asarray(ix)], centroids_y=[np.asarray(iy)],
        centroids_errors_x=[np.full(len(ix), 0.004, np.float32)],
        centroids_errors_y=[np.full(len(ix), 0.004, np.float32)],
        image_fluxes=fluxes,
        image_flux_errors=0.05 * fluxes,
    )
    x = dict(lens_mass=[
        dict(theta_E=jnp.array([1.1, 0.9])),
        dict(gamma1=jnp.array([0.03, 0.0])),
    ])
    ll, chi2 = jax.jit(lambda p: model.stats_fluxes(sim_fit, p))(x)
    chi2 = np.asarray(chi2)
    assert chi2[0] < 1e-3  # exact magnifications -> exact ratio fit
    assert chi2[1] > 10 * max(chi2[0], 1e-6)  # wrong lens -> bad ratios


def test_joint_pointsource_posterior_runs():
    """positions + delays + fluxes jointly through log_prob and MAP."""
    import optax

    from gigalens_tpu.inference import ModellingSequence

    pm, sim, truth, ix, iy, delays, fluxes, d_dt_true = _quad_setup()
    prior = Prior(
        dict(
            lens_mass=[
                dict(theta_E=gld.LogNormal(np.log(1.1), 0.05),
                     e1=gld.Normal(0.1, 0.02), e2=gld.Normal(-0.05, 0.02),
                     center_x=gld.Normal(0, 0.02),
                     center_y=gld.Normal(0, 0.02)),
                dict(gamma1=gld.Normal(0.03, 0.01),
                     gamma2=gld.Normal(0.02, 0.01)),
            ],
            cosmo=[dict(D_dt=gld.LogNormal(np.log(4000.0), 0.3))],
        )
    )
    model = ForwardProbModel(
        prior,
        centroids_x=[np.asarray(ix)], centroids_y=[np.asarray(iy)],
        centroids_errors_x=[np.full(len(ix), 0.004, np.float32)],
        centroids_errors_y=[np.full(len(ix), 0.004, np.float32)],
        delays=delays, delay_errors=np.full(len(delays), 0.5, np.float32),
        image_fluxes=fluxes, image_flux_errors=0.05 * fluxes,
    )
    phys = PhysicalModel([SIE(), Shear()], [], [])
    cfg = SimulatorConfig(0.06, 60)
    seq = ModellingSequence(phys, model, cfg)
    assert model.event_size(seq._sim(8)) == 2 * len(ix) + len(delays) + len(ix)

    z0 = prior.unconstrain(prior.sample(jax.random.PRNGKey(0), 8))
    z = seq.MAP(optax.adam(5e-3), start=z0, n_samples=8, num_steps=10, seed=0)
    zs = np.asarray(z)
    assert np.all(np.isfinite(zs))
    assert np.max(np.abs(zs - np.asarray(z0))) > 1e-4
