"""Pixelated source inversion: float64 numpy oracle for the marginal
likelihood, end-to-end recovery on a simulated lens, gradient/jit health,
and pipeline integration (the model family is beyond the reference — see
gigalens_tpu/inversion.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.inversion import (
    PixelatedSourceProbModel,
    SourceGrid,
    gradient_regularizer,
)
from gigalens_tpu.prob import Prior
from gigalens_tpu.prob import distributions as gld
from gigalens_tpu.profiles.light.sersic import SersicEllipse
from gigalens_tpu.profiles.mass.sie import SIE
from gigalens_tpu.profiles.mass.shear import Shear
from gigalens_tpu.simulator import LensSimulator


def _conv_same_np(img, kernel):
    """float64 true convolution (flipped kernel), 'SAME' size."""
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    pad = np.pad(img, ((ph, ph), (pw, pw)))
    out = np.zeros_like(img, np.float64)
    kf = kernel[::-1, ::-1]
    for i in range(img.shape[0]):
        for j in range(img.shape[1]):
            out[i, j] = np.sum(pad[i : i + kh, j : j + kw] * kf)
    return out


def _tiny_setup(n_side=8, lam=2.0):
    rng = np.random.default_rng(0)
    kern = rng.uniform(0.1, 1.0, (5, 5))
    kern = (kern / kern.sum()).astype(np.float32)
    cfg = SimulatorConfig(
        delta_pix=0.1, num_pix=20, supersample=1, kernel=kern, psf_mode="direct"
    )
    prior = Prior(
        dict(
            lens_mass=[
                dict(
                    theta_E=gld.LogNormal(np.log(0.7), 0.1),
                    e1=gld.Normal(0, 0.1),
                    e2=gld.Normal(0, 0.1),
                    center_x=gld.Normal(0, 0.05),
                    center_y=gld.Normal(0, 0.05),
                ),
                dict(gamma1=gld.Normal(0, 0.05), gamma2=gld.Normal(0, 0.05)),
            ]
        )
    )
    phys = PhysicalModel([SIE(), Shear()], [], [])
    obs = rng.normal(0.0, 1.0, (20, 20)).astype(np.float32)
    grid = SourceGrid(n_side=n_side, extent=0.5)
    model = PixelatedSourceProbModel(
        prior, obs, background_rms=0.3, exp_time=100.0, grid=grid, lam=lam
    )
    return phys, cfg, prior, model, obs, kern, grid


def _oracle_log_marginal(model, sim, obs, kern, grid, lens_params, lam):
    """float64 brute-force marginal likelihood (one sample)."""
    bx, by = jax.jit(lambda lp: sim.beta(sim.img_x, sim.img_y, lp))(lens_params)
    bx = np.asarray(bx, np.float64).reshape(-1)
    by = np.asarray(by, np.float64).reshape(-1)
    cx = np.asarray(grid.centers_x, np.float64)
    cy = np.asarray(grid.centers_y, np.float64)
    delta = grid.delta
    n = grid.n_side
    npix = bx.size

    wx = np.maximum(0.0, 1.0 - np.abs(bx[:, None] - cx) / delta)
    wy = np.maximum(0.0, 1.0 - np.abs(by[:, None] - cy) / delta)
    A = (wy[:, :, None] * wx[:, None, :]).reshape(npix, n * n)

    H_img = sim.sim_config.num_pix
    conv_factor = float(np.asarray(sim.conversion_factor))
    C = np.zeros((n * n, H_img * H_img), np.float64)
    for j in range(n * n):
        img = A[:, j].reshape(H_img, H_img)  # supersample=1
        C[j] = (_conv_same_np(img, np.asarray(kern, np.float64)) * conv_factor).reshape(-1)

    err = np.asarray(model.error_map, np.float64)
    w = (1.0 / err**2).reshape(-1)
    d = np.asarray(obs, np.float64).reshape(-1)

    H_reg, logdet_H = gradient_regularizer(n)
    H_reg = np.asarray(H_reg, np.float64)
    F = (C * w) @ C.T + lam * H_reg
    b = (C * w) @ d
    s = np.linalg.solve(F, b)
    sign, logdet_F = np.linalg.slogdet(F)
    assert sign > 0
    quad = d @ (w * d) - b @ s
    norm = np.sum(np.log(2 * np.pi * err**2))
    k = n * n
    return -0.5 * (quad + logdet_F - k * np.log(lam) - logdet_H + norm)


def test_marginal_likelihood_matches_float64_oracle():
    lam = 2.0
    phys, cfg, prior, model, obs, kern, grid = _tiny_setup(lam=lam)
    sim = LensSimulator(phys, cfg, bs=1)
    params = prior.sample(jax.random.PRNGKey(3), 1)

    got = float(jax.jit(lambda p: model.stats_pixels(sim, p)[0])(params)[0])
    want = _oracle_log_marginal(
        model, sim, obs, kern, grid, params["lens_mass"], lam
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=0.2)


def test_source_recovery_on_simulated_lens():
    """Inverting at the true lens params reproduces the data (chi2 ~ 1) and
    puts the reconstructed source light where the true source is."""
    rng = np.random.default_rng(1)
    kern = np.exp(
        -((np.arange(7) - 3) ** 2 + (np.arange(7)[:, None] - 3) ** 2) / 3.0
    )
    kern = (kern / kern.sum()).astype(np.float32)
    cfg = SimulatorConfig(delta_pix=0.05, num_pix=40, supersample=2, kernel=kern)

    truth_phys = PhysicalModel([SIE(), Shear()], [], [SersicEllipse()])
    truth_params = dict(
        lens_mass=[
            dict(
                theta_E=jnp.array([0.8]),
                e1=jnp.array([0.05]),
                e2=jnp.array([-0.03]),
                center_x=jnp.array([0.0]),
                center_y=jnp.array([0.0]),
            ),
            dict(gamma1=jnp.array([0.01]), gamma2=jnp.array([-0.02])),
        ],
        source_light=[
            dict(
                R_sersic=jnp.array([0.12]),
                n_sersic=jnp.array([1.5]),
                e1=jnp.array([0.1]),
                e2=jnp.array([0.0]),
                center_x=jnp.array([0.08]),
                center_y=jnp.array([-0.05]),
                Ie=jnp.array([20.0]),
            )
        ],
    )
    sim_t = LensSimulator(truth_phys, cfg, bs=1)
    truth_img = np.asarray(jax.jit(sim_t.simulate)(truth_params))
    bkg = 0.1
    obs = truth_img + rng.normal(size=truth_img.shape).astype(np.float32) * bkg

    prior = Prior(
        dict(
            lens_mass=[
                dict(
                    theta_E=gld.LogNormal(np.log(0.8), 0.1),
                    e1=gld.Normal(0, 0.1),
                    e2=gld.Normal(0, 0.1),
                    center_x=gld.Normal(0, 0.05),
                    center_y=gld.Normal(0, 0.05),
                ),
                dict(gamma1=gld.Normal(0, 0.05), gamma2=gld.Normal(0, 0.05)),
            ]
        )
    )
    phys = PhysicalModel([SIE(), Shear()], [], [])
    grid = SourceGrid(n_side=16, extent=0.35)
    model = PixelatedSourceProbModel(
        prior, obs, background_rms=bkg, exp_time=1e8, grid=grid, lam=5.0
    )
    sim = LensSimulator(phys, cfg, bs=1)
    out = jax.jit(lambda p: model.solve(sim, p))(
        dict(lens_mass=truth_params["lens_mass"])
    )
    red_chi2 = float(out["red_chi2"][0])
    assert 0.7 < red_chi2 < 1.3, red_chi2

    src = np.asarray(out["source"][0])
    iy, ix = np.unravel_index(np.argmax(src), src.shape)
    peak_x = grid.centers_x[ix]
    peak_y = grid.centers_y[iy]
    # peak within one source pixel of the true source centre
    assert abs(peak_x - 0.08) <= 1.5 * grid.delta
    assert abs(peak_y - (-0.05)) <= 1.5 * grid.delta


def test_gradients_and_sampled_lam():
    phys, cfg, prior_fixed, _, obs, kern, grid = _tiny_setup()
    prior = Prior(
        dict(
            lens_mass=prior_fixed.tree["lens_mass"],
            source_pixelated=[dict(lam=gld.LogNormal(0.0, 1.0))],
        )
    )
    model = PixelatedSourceProbModel(
        prior, obs, background_rms=0.3, exp_time=100.0, grid=grid, lam=None
    )
    sim = LensSimulator(phys, cfg, bs=2)
    z = prior.unconstrain(prior.sample(jax.random.PRNGKey(0), 2))

    def loss(z):
        lp, _ = model.log_prob(sim, z)
        return jnp.sum(lp)

    g = jax.jit(jax.grad(loss))(z)
    assert np.all(np.isfinite(np.asarray(g)))
    # the lam column must carry gradient (it enters the evidence analytically)
    lam_col = prior.column_names().index("source_pixelated/0/lam")
    assert np.all(np.abs(np.asarray(g)[:, lam_col]) > 0)


def test_map_pipeline_moves_params():
    import optax

    from gigalens_tpu.inference import ModellingSequence

    phys, cfg, prior, model, obs, kern, grid = _tiny_setup()
    seq = ModellingSequence(phys, model, cfg)
    z0 = prior.unconstrain(prior.sample(jax.random.PRNGKey(1), 8))
    z = seq.MAP(optax.adam(0.0), start=z0, n_samples=8, num_steps=2, seed=0)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z0), atol=1e-6)
    z = seq.MAP(optax.adam(1e-2), start=z0, n_samples=8, num_steps=2, seed=0)
    assert np.max(np.abs(np.asarray(z) - np.asarray(z0))) > 1e-4


def test_event_size_and_position_stats_raise():
    phys, cfg, prior, model, obs, kern, grid = _tiny_setup()
    sim = LensSimulator(phys, cfg, bs=1)
    assert model.event_size(sim) == sim.n_live_pix
    with pytest.raises(NotImplementedError):
        model.stats_positions(sim, {})


def test_sharded_inversion_matches_single_device():
    """8-device mesh MAP on the inversion model matches 1-device numerics
    (the mapping-matrix build + Gram + Cholesky all shard over samples)."""
    import optax

    from gigalens_tpu.inference import ModellingSequence
    from gigalens_tpu.parallel import default_mesh

    phys, cfg, prior, model, obs, kern, grid = _tiny_setup()
    start = prior.unconstrain(prior.sample(jax.random.PRNGKey(2), 8))
    seq_m = ModellingSequence(phys, model, cfg, mesh=default_mesh())
    z_m = seq_m.MAP(optax.adam(1e-3), start=start, n_samples=8, num_steps=3)
    seq_s = ModellingSequence(phys, model, cfg,
                              mesh=default_mesh(jax.devices()[:1]))
    z_s = seq_s.MAP(optax.adam(1e-3), start=start, n_samples=8, num_steps=3)
    np.testing.assert_allclose(np.asarray(z_m), np.asarray(z_s), rtol=1e-4,
                               atol=1e-5)


def test_hmc_smoke_on_inversion_model():
    """The HMC driver runs on the marginal posterior (short chain)."""
    from gigalens_tpu.inference import ModellingSequence
    from gigalens_tpu.prob.distributions import MultivariateNormalTriL

    phys, cfg, prior, model, obs, kern, grid = _tiny_setup()
    seq = ModellingSequence(phys, model, cfg)
    d = prior.d
    q = MultivariateNormalTriL(jnp.zeros(d), 0.05 * jnp.eye(d))
    res = seq.HMC(q, n_hmc=8, num_burnin_steps=10, num_results=10,
                  max_leapfrog_steps=4, seed=0)
    assert res.samples.shape == (10, 8, d)
    assert np.all(np.isfinite(np.asarray(res.samples)))
