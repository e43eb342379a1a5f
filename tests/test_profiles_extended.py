"""NFW / TNFW / dPIE family and shapelets: oracle parity + consistency."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracles
from gigalens_tpu.profiles.base import MassProfile
from gigalens_tpu.profiles.light.shapelets import Shapelets
from gigalens_tpu.profiles.mass.dpie import DPIE, DPIEP, DPIS
from gigalens_tpu.profiles.mass.nfw import NFW, NFW_ELLIPSE, TNFW

RTOL, ATOL = 1e-4, 1e-4


def _coords(rng, n=5000, scale=2.0):
    return (
        (rng.normal(size=n) * scale).astype(np.float32),
        (rng.normal(size=n) * scale).astype(np.float32),
    )


def test_nfw_oracle(rng):
    x, y = _coords(rng)
    for kw in [dict(Rs=1.5, alpha_Rs=0.8), dict(Rs=0.7, alpha_Rs=1.2)]:
        got = NFW().deriv(x=x, y=y, center_x=0.1, center_y=-0.05, **kw)
        want = oracles.nfw_deriv(
            x.astype(np.float64), y.astype(np.float64), kw["Rs"], kw["alpha_Rs"], 0.1, -0.05
        )
        # float32 acosh/log near x ~ 1 costs ~1 decimal digit vs the f64 oracle
        np.testing.assert_allclose(got[0], want[0], rtol=1e-3, atol=2e-4)
        np.testing.assert_allclose(got[1], want[1], rtol=1e-3, atol=2e-4)


def test_nfw_hessian_vs_autodiff(rng):
    x, y = _coords(rng, 400)
    kw = dict(Rs=1.5, alpha_Rs=0.8, center_x=0.0, center_y=0.0)
    got = NFW().hessian(x, y, **kw)
    want = MassProfile.hessian(NFW(), x, y, **kw)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=5e-3, atol=5e-4)


def test_nfw_ellipse_reduces_to_nfw(rng):
    x, y = _coords(rng, 1000)
    kw = dict(Rs=1.2, alpha_Rs=0.9, center_x=0.0, center_y=0.0)
    got = NFW_ELLIPSE().deriv(x=x, y=y, e1=0.0, e2=0.0, **kw)
    want = NFW().deriv(x=x, y=y, **kw)
    np.testing.assert_allclose(got[0], want[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[1], want[1], rtol=1e-4, atol=1e-4)


def test_tnfw_approaches_nfw_at_large_truncation(rng):
    x, y = _coords(rng, 1000, scale=0.5)
    kw = dict(Rs=1.0, alpha_Rs=0.8, center_x=0.0, center_y=0.0)
    got = TNFW().deriv(x=x, y=y, r_trunc=1000.0, **kw)
    want = NFW().deriv(x=x, y=y, **kw)
    np.testing.assert_allclose(got[0], want[0], rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(got[1], want[1], rtol=5e-3, atol=5e-4)


def test_dpis_oracle(rng):
    x, y = _coords(rng)
    kw = dict(theta_E=1.1, r_core=0.2, r_cut=2.0)
    got = DPIS().deriv(x=x, y=y, center_x=0.0, center_y=0.0, **kw)
    want = oracles.dpis_deriv(
        x.astype(np.float64), y.astype(np.float64),
        kw["theta_E"], kw["r_core"], kw["r_cut"], 0.0, 0.0,
    )
    np.testing.assert_allclose(got[0], want[0], rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(got[1], want[1], rtol=RTOL, atol=ATOL)


def test_dpis_hessian_vs_autodiff(rng):
    x, y = _coords(rng, 400)
    kw = dict(theta_E=1.1, r_core=0.2, r_cut=2.0, center_x=0.0, center_y=0.0)
    got = DPIS().hessian(x, y, **kw)
    want = MassProfile.hessian(DPIS(), x, y, **kw)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=5e-3, atol=5e-4)


def test_dpie_oracle(rng):
    x, y = _coords(rng)
    for kw in [
        dict(theta_E=1.1, r_core=0.2, r_cut=2.0, e1=0.1, e2=-0.05),
        dict(theta_E=0.7, r_core=0.05, r_cut=1.0, e1=0.3, e2=0.2),
    ]:
        got = DPIE().deriv(x=x, y=y, center_x=0.05, center_y=-0.02, **kw)
        want = oracles.dpie_deriv(
            x.astype(np.float64), y.astype(np.float64),
            kw["theta_E"], kw["r_core"], kw["r_cut"], kw["e1"], kw["e2"], 0.05, -0.02,
        )
        np.testing.assert_allclose(got[0], want[0], rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(got[1], want[1], rtol=RTOL, atol=ATOL)


def test_dpie_reduces_to_dpis(rng):
    x, y = _coords(rng, 1000)
    kw = dict(theta_E=1.1, r_core=0.2, r_cut=2.0)
    got = DPIE().deriv(x=x, y=y, e1=1e-5, e2=0.0, center_x=0.0, center_y=0.0, **kw)
    want = DPIS().deriv(x=x, y=y, center_x=0.0, center_y=0.0, **kw)
    np.testing.assert_allclose(got[0], want[0], rtol=5e-3, atol=2e-3)
    np.testing.assert_allclose(got[1], want[1], rtol=5e-3, atol=2e-3)


def test_dpie_convergence_consistency(rng):
    """Analytic convergence == (f_xx + f_yy)/2 from the AD hessian."""
    x, y = _coords(rng, 300)
    kw = dict(theta_E=1.1, r_core=0.2, r_cut=2.0, e1=0.1, e2=-0.05,
              center_x=0.0, center_y=0.0)
    analytic = DPIE().convergence(x, y, **kw)
    f_xx, _, _, f_yy = MassProfile.hessian(DPIE(), x, y, **kw)
    np.testing.assert_allclose(analytic, (f_xx + f_yy) / 2, rtol=5e-3, atol=1e-3)


def test_dpiep_reduces_to_dpis(rng):
    x, y = _coords(rng, 1000)
    got = DPIEP().deriv(x=x, y=y, theta_E=1.0, Ra=0.2, Rs=2.0,
                        e1=0.0, e2=0.0, center_x=0.0, center_y=0.0)
    want = DPIS().deriv(x=x, y=y, theta_E=1.0, r_core=0.2, r_cut=2.0,
                        center_x=0.0, center_y=0.0)
    np.testing.assert_allclose(got[0], want[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[1], want[1], rtol=1e-4, atol=1e-4)


def test_shapelets_oracle(rng):
    n_max = 5
    shp = Shapelets(n_max=n_max, use_lstsq=False)
    amps = rng.normal(size=shp.n_layers).astype(np.float32)
    amp_dict = {k: a for k, a in zip(shp._amp_names, amps)}
    x = rng.normal(size=(200,)).astype(np.float32)
    y = rng.normal(size=(200,)).astype(np.float32)
    got = shp.light(x=x, y=y, beta=1.0, center_x=0.0, center_y=0.0, **amp_dict)

    want = np.zeros(200)
    for a, n1, n2 in zip(amps, shp._n1, shp._n2):
        want += a * oracles.hermite_phi(n1, x.astype(np.float64)) * oracles.hermite_phi(
            n2, y.astype(np.float64)
        )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_shapelets_lstsq_depth(rng):
    shp = Shapelets(n_max=3, use_lstsq=True)
    assert shp.depth == 10
    assert "amp00" not in shp.params
    x = rng.normal(size=(4, 16)).astype(np.float32)
    basis = shp.light(x=x, y=x, beta=1.0, center_x=0.0, center_y=0.0)
    assert basis.shape == (10, 4, 16)


def test_shapelets_param_names():
    shp = Shapelets(n_max=5, use_lstsq=False)
    assert shp.n_layers == 21
    assert shp._amp_names[0] == "amp00" and shp._amp_names[-1] == "amp20"
    assert all(a in shp.params for a in shp._amp_names)


def test_point_mass_and_sheet(rng):
    """PointMass/MassSheet (beyond the reference): analytic hessian matches
    AD; point-mass convergence vanishes off-center; sheet kappa is uniform;
    the mass-sheet transform's deflection identity holds."""
    from gigalens_tpu.profiles.mass.point import MassSheet, PointMass

    x, y = _coords(rng, n=2000)
    kw = dict(theta_E=1.3, center_x=0.1, center_y=-0.2)
    got = PointMass().hessian(x, y, **kw)
    want = MassProfile.hessian(PointMass(), x, y, **kw)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-3, atol=1e-4)
    # kappa = (f_xx + f_yy)/2 = 0 away from the point
    np.testing.assert_allclose(
        np.asarray(PointMass().convergence(x, y, **kw)), 0.0, atol=1e-4
    )

    sh = MassSheet()
    skw = dict(kappa=0.17, center_x=0.0, center_y=0.0)
    got = sh.hessian(x, y, **skw)
    want = MassProfile.hessian(sh, x, y, **skw)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sh.convergence(x, y, **skw)), 0.17,
                               rtol=1e-5)
    # batched params broadcast like every other profile
    kb = dict(theta_E=np.asarray([[1.0], [1.5]], np.float32),
              center_x=0.0, center_y=0.0)
    ax, ay = PointMass().deriv(x[None, :], y[None, :], **kb)
    assert ax.shape == (2, x.size)
    np.testing.assert_allclose(
        np.asarray(ax[1]) / np.asarray(ax[0]), (1.5 / 1.0) ** 2, rtol=1e-4
    )
