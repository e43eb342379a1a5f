"""Profile numerics: float64-oracle parity + internal consistency.

Mirrors the reference's lenstronomy-parity strategy
(``tests/test_profiles.py``) at the same float32 tolerances
(rtol=1e-5, atol=1e-4), using the independent numpy oracles in
``tests/oracles.py``; plus AD-consistency checks the reference lacks
(analytic hessians vs forward-mode AD of ``deriv``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracles
from gigalens_tpu.profiles.light.sersic import SersicEllipse
from gigalens_tpu.profiles.mass.epl import EPL
from gigalens_tpu.profiles.mass.shear import Shear
from gigalens_tpu.profiles.mass.sie import SIE, SIS

RTOL, ATOL = 1e-5, 1e-4


def _coords(rng, n=10000):
    return (
        rng.normal(size=n).astype(np.float32),
        rng.normal(size=n).astype(np.float32),
    )


def test_sis(rng):
    x, y = _coords(rng)
    for theta_E in [1.0, 1.2]:
        got = SIS().deriv(x=x, y=y, theta_E=theta_E, center_x=0.0, center_y=0.0)
        want = oracles.sis_deriv(x.astype(np.float64), y.astype(np.float64), theta_E, 0.0, 0.0)
        np.testing.assert_allclose(got[0], want[0], rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(got[1], want[1], rtol=RTOL, atol=ATOL)


def test_shear(rng):
    x, y = _coords(rng)
    for g1, g2 in [(0.0, 0.0), (0.1, 0.1), (-0.05, 0.02)]:
        got = Shear().deriv(x=x, y=y, gamma1=g1, gamma2=g2)
        want = oracles.shear_deriv(x.astype(np.float64), y.astype(np.float64), g1, g2)
        np.testing.assert_allclose(got[0], want[0], rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(got[1], want[1], rtol=RTOL, atol=ATOL)


def test_sie(rng):
    x, y = _coords(rng)
    for kw in [
        dict(theta_E=1.0, e1=1e-3, e2=1e-3),
        dict(theta_E=1.2, e1=0.1, e2=-0.1),
        dict(theta_E=0.8, e1=-0.2, e2=0.15),
    ]:
        got = SIE().deriv(x=x, y=y, center_x=0.0, center_y=0.0, **kw)
        want = oracles.sie_deriv(
            x.astype(np.float64), y.astype(np.float64),
            kw["theta_E"], kw["e1"], kw["e2"], 0.0, 0.0,
        )
        np.testing.assert_allclose(got[0], want[0], rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(got[1], want[1], rtol=RTOL, atol=ATOL)


def test_epl(rng):
    x, y = _coords(rng)
    for kw in [
        dict(theta_E=1.0, gamma=2.0, e1=0.0, e2=0.0),
        dict(theta_E=1.2, gamma=2.2, e1=-0.1, e2=0.1),
        dict(theta_E=0.9, gamma=1.7, e1=0.2, e2=0.05),
    ]:
        got = EPL(niter=100).deriv(x=x, y=y, center_x=0.0, center_y=0.0, **kw)
        want = oracles.epl_deriv(
            x.astype(np.float64), y.astype(np.float64),
            kw["theta_E"], kw["gamma"], kw["e1"], kw["e2"], 0.0, 0.0,
        )
        np.testing.assert_allclose(got[0], want[0], rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(got[1], want[1], rtol=RTOL, atol=ATOL)


def test_epl_reduces_to_sis(rng):
    x, y = _coords(rng, 1000)
    got = EPL(niter=50).deriv(
        x=x, y=y, theta_E=1.3, gamma=2.0, e1=0.0, e2=0.0, center_x=0.0, center_y=0.0
    )
    want = SIS().deriv(x=x, y=y, theta_E=1.3, center_x=0.0, center_y=0.0)
    np.testing.assert_allclose(got[0], want[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[1], want[1], rtol=1e-4, atol=1e-4)


def test_recommended_niter():
    assert EPL.recommended_niter(0.8) < EPL.recommended_niter(0.2)
    # at q=0.5, f=1/3: |f|^n < 1e-12 needs n ~ 26
    n = EPL.recommended_niter(0.5)
    f = (1 - 0.5) / (1 + 0.5)
    assert f ** (n - 2) < 1e-12 <= f ** (n - 3)


def test_sersic_ellipse(rng):
    se = SersicEllipse(use_lstsq=False)
    # half-light amplitude sanity (reference tests/test_profiles.py:25-26)
    v = se.light(x=0.0, y=1.0, R_sersic=1.0, n_sersic=2.0, center_x=0.0,
                 center_y=0.0, e1=0.0, e2=0.0, Ie=5.0)
    assert np.isclose(float(v), 5.0)

    x, y = _coords(rng, 1000)
    kw = dict(R_sersic=1.0, n_sersic=2.0, center_x=0.0, center_y=0.0, e1=0.1, e2=-0.2)
    got = se.light(x=x, y=y, Ie=5.0, **kw)
    want = oracles.sersic_ellipse_light(
        x.astype(np.float64), y.astype(np.float64),
        kw["R_sersic"], kw["n_sersic"], kw["e1"], kw["e2"], 0.0, 0.0, 5.0,
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "profile,params",
    [
        (SIS(), dict(theta_E=1.1, center_x=0.02, center_y=-0.03)),
        (Shear(), dict(gamma1=0.05, gamma2=-0.03)),
    ],
)
def test_analytic_hessian_matches_autodiff(profile, params, rng):
    """Closed-form hessians must agree with forward-mode AD of deriv."""
    x, y = _coords(rng, 500)
    got = profile.hessian(x, y, **params)
    from gigalens_tpu.profiles.base import MassProfile

    want = MassProfile.hessian(profile, x, y, **params)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.broadcast_to(g, np.shape(w)), w, rtol=1e-3, atol=1e-4
        )


def test_hessian_symmetry_epl(rng):
    """f_xy == f_yx for the AD-default hessian (deflections are gradients)."""
    x, y = _coords(rng, 200)
    f_xx, f_xy, f_yx, f_yy = EPL(30).hessian(
        x, y, theta_E=1.2, gamma=2.1, e1=0.1, e2=-0.05, center_x=0.0, center_y=0.0
    )
    np.testing.assert_allclose(f_xy, f_yx, rtol=1e-3, atol=1e-4)


def test_batched_broadcasting(rng):
    """Profiles broadcast (bs, 1) params against (npix,) coords -> (bs, npix)."""
    x, y = _coords(rng, 64)
    theta_E = jnp.array([[1.0], [1.2], [0.9]])
    fx, fy = SIS().deriv(x, y, theta_E=theta_E, center_x=0.0, center_y=0.0)
    assert fx.shape == (3, 64)
    for i, te in enumerate([1.0, 1.2, 0.9]):
        ref = SIS().deriv(x, y, theta_E=te, center_x=0.0, center_y=0.0)
        np.testing.assert_allclose(fx[i], ref[0], rtol=1e-6)
