"""Simulator: PSF paths, pooling, masking, flux conservation, lstsq."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.ops.psf import PSFConv, average_pool, subgrid_kernel
from gigalens_tpu.profiles.light.sersic import SersicEllipse
from gigalens_tpu.profiles.mass.sie import SIE
from gigalens_tpu.profiles.mass.shear import Shear
from gigalens_tpu.simulator import LensSimulator


def _gauss_psf(n=15, s=4.0):
    g = np.exp(-((np.arange(n) - n // 2) ** 2 + (np.arange(n)[:, None] - n // 2) ** 2) / s)
    return (g / g.sum()).astype(np.float32)


def test_fft_matches_direct_conv(rng):
    k = _gauss_psf(15)
    img = rng.normal(size=(3, 40, 40)).astype(np.float32)
    fft = PSFConv(k, (40, 40), mode="fft")(jnp.asarray(img))
    direct = PSFConv(k, (40, 40), mode="direct")(jnp.asarray(img))
    np.testing.assert_allclose(fft, direct, rtol=1e-4, atol=1e-4)


def test_fft_conv_even_kernel(rng):
    k = rng.random((8, 8)).astype(np.float32)
    k /= k.sum()
    img = rng.normal(size=(2, 33, 33)).astype(np.float32)
    fft = PSFConv(k, (33, 33), mode="fft")(jnp.asarray(img))
    direct = PSFConv(k, (33, 33), mode="direct")(jnp.asarray(img))
    np.testing.assert_allclose(fft, direct, rtol=1e-4, atol=1e-4)


def test_dft_matches_fft_conv(rng):
    k = _gauss_psf(15)
    img = rng.normal(size=(3, 40, 40)).astype(np.float32)
    fft = PSFConv(k, (40, 40), mode="fft")(jnp.asarray(img))
    dft = PSFConv(k, (40, 40), mode="dft")(jnp.asarray(img))
    np.testing.assert_allclose(dft, fft, rtol=1e-4, atol=1e-4)


def test_dft_pool_folding_matches_fft_then_pool(rng):
    k = _gauss_psf(15)
    img = rng.normal(size=(3, 40, 40)).astype(np.float32)
    want = average_pool(PSFConv(k, (40, 40), mode="fft")(jnp.asarray(img)), 2)
    got = PSFConv(k, (40, 40), mode="dft", pool=2)(jnp.asarray(img))
    assert got.shape == (3, 20, 20)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dft_hi_matches_fft(rng):
    k = _gauss_psf(15)
    img = rng.normal(size=(3, 40, 40)).astype(np.float32)
    want = average_pool(PSFConv(k, (40, 40), mode="fft")(jnp.asarray(img)), 2)
    got = PSFConv(k, (40, 40), mode="dft_hi", pool=2)(jnp.asarray(img))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_average_pool():
    x = jnp.arange(16.0).reshape(1, 4, 4)
    got = average_pool(x, 2)
    want = np.array([[[2.5, 4.5], [10.5, 12.5]]])
    np.testing.assert_allclose(got, want)


def test_subgrid_kernel_flux_conserving():
    k = _gauss_psf(15)
    for ss in [2, 3]:
        fine = subgrid_kernel(k, ss, odd=True)
        assert np.isclose(fine.sum(), 1.0, atol=1e-5)
        assert fine.shape[0] >= ss * 15 - 1
        # block-summing the fine kernel back must reproduce the original
        from gigalens_tpu.ops.psf import _downsample_sum

        coarse = _downsample_sum(fine.astype(np.float64), ss)
        t = (coarse.shape[0] - 15) // 2
        coarse = coarse[t : t + 15, t : t + 15]
        np.testing.assert_allclose(coarse, k, atol=5e-3)


@pytest.fixture(scope="module")
def simple_setup():
    phys = PhysicalModel([SIE(), Shear()], [SersicEllipse()], [SersicEllipse()])
    params = dict(
        lens_mass=[
            dict(theta_E=jnp.array([1.2]), e1=jnp.array([0.05]), e2=jnp.array([-0.03]),
                 center_x=jnp.array([0.0]), center_y=jnp.array([0.0])),
            dict(gamma1=jnp.array([0.02]), gamma2=jnp.array([0.01])),
        ],
        lens_light=[
            dict(R_sersic=jnp.array([1.0]), n_sersic=jnp.array([3.0]),
                 e1=jnp.array([0.1]), e2=jnp.array([0.0]),
                 center_x=jnp.array([0.0]), center_y=jnp.array([0.0]),
                 Ie=jnp.array([100.0])),
        ],
        source_light=[
            dict(R_sersic=jnp.array([0.25]), n_sersic=jnp.array([1.5]),
                 e1=jnp.array([0.0]), e2=jnp.array([0.0]),
                 center_x=jnp.array([0.05]), center_y=jnp.array([0.0]),
                 Ie=jnp.array([50.0])),
        ],
    )
    return phys, params


def test_simulate_shapes_and_finiteness(simple_setup):
    phys, params = simple_setup
    cfg = SimulatorConfig(delta_pix=0.065, num_pix=48, supersample=2, kernel=_gauss_psf())
    sim = LensSimulator(phys, cfg, bs=1)
    img = sim.simulate(params)
    assert img.shape == (48, 48)
    assert np.isfinite(np.asarray(img)).all()
    assert float(img.min()) >= -1e-3  # light is non-negative (FFT ringing tol)


def test_supersample_converges(simple_setup):
    """ss=2 and ss=4 renders agree to ~pixel-integration accuracy."""
    phys, params = simple_setup
    imgs = {}
    for ss in [2, 4]:
        cfg = SimulatorConfig(delta_pix=0.1, num_pix=32, supersample=ss)
        imgs[ss] = np.asarray(LensSimulator(phys, cfg, bs=1).simulate(params))
    rel = np.abs(imgs[2] - imgs[4]).max() / imgs[4].max()
    assert rel < 0.02, rel


def test_pix_region_mask(simple_setup):
    phys, params = simple_setup
    mask = np.zeros((32, 32), bool)
    mask[4:28, 4:28] = True
    cfg_m = SimulatorConfig(delta_pix=0.1, num_pix=32, supersample=2, pix_region=mask)
    cfg_f = SimulatorConfig(delta_pix=0.1, num_pix=32, supersample=2)
    img_m = np.asarray(LensSimulator(phys, cfg_m, bs=1).simulate(params))
    img_f = np.asarray(LensSimulator(phys, cfg_f, bs=1).simulate(params))
    # inside the mask the renders agree; outside the masked render is zero
    np.testing.assert_allclose(img_m[mask], img_f[mask], rtol=1e-5, atol=1e-5)
    assert np.all(img_m[~mask] == 0)


def test_flux_conservation_psf(simple_setup):
    """PSF convolution preserves total flux away from boundaries."""
    phys, params = simple_setup
    cfg_k = SimulatorConfig(delta_pix=0.065, num_pix=64, supersample=1, kernel=_gauss_psf(11))
    cfg_n = SimulatorConfig(delta_pix=0.065, num_pix=64, supersample=1)
    f_k = float(np.asarray(LensSimulator(phys, cfg_k, bs=1).simulate(params)).sum())
    f_n = float(np.asarray(LensSimulator(phys, cfg_n, bs=1).simulate(params)).sum())
    assert abs(f_k - f_n) / f_n < 0.02


def test_magnification_matches_beta_jacobian(simple_setup):
    """1/mu must equal det(d beta / d theta) from AD of the ray-shoot map."""
    phys, params = simple_setup
    cfg = SimulatorConfig(delta_pix=0.1, num_pix=16)
    sim = LensSimulator(phys, cfg, bs=1)
    pts = jnp.array([0.9, -0.7, 0.33]), jnp.array([0.1, 0.6, -0.55])
    mu = sim.magnification(pts[0], pts[1], params["lens_mass"])

    def beta_xy(xy):
        bx, by = sim.beta(xy[0], xy[1], params["lens_mass"])
        return jnp.stack([jnp.sum(bx), jnp.sum(by)])

    for i in range(3):
        J = jax.jacfwd(beta_xy)(jnp.array([pts[0][i], pts[1][i]]))
        det = float(J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0])
        np.testing.assert_allclose(1.0 / float(mu[0, i]), det, rtol=1e-3)


def test_lstsq_recovers_amplitudes(simple_setup):
    """lstsq_simulate must recover the amplitudes of a noiseless render."""
    phys, params = simple_setup
    cfg = SimulatorConfig(delta_pix=0.065, num_pix=32, supersample=2)
    sim = LensSimulator(phys, cfg, bs=1)
    observed = sim.simulate(params)

    phys_l = PhysicalModel(
        phys.lenses,
        [SersicEllipse(use_lstsq=True)],
        [SersicEllipse(use_lstsq=True)],
    )
    params_l = jax.tree_util.tree_map(lambda x: x, params)
    params_l["lens_light"] = [
        {k: v for k, v in params["lens_light"][0].items() if k != "Ie"}
    ]
    params_l["source_light"] = [
        {k: v for k, v in params["source_light"][0].items() if k != "Ie"}
    ]
    sim_l = LensSimulator(phys_l, cfg, bs=1)
    err = jnp.ones_like(observed) * 0.1
    coeffs = sim_l.lstsq_simulate(params_l, observed, err, return_coeffs=True)
    np.testing.assert_allclose(
        np.asarray(coeffs)[0], [100.0, 50.0], rtol=1e-3
    )
    fitted = sim_l.lstsq_simulate(params_l, observed, err)
    np.testing.assert_allclose(fitted, observed, rtol=1e-3, atol=1e-3)
