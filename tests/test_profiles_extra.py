"""Hernquist / Multipole / Gaussian / Moffat: the beyond-reference profiles.

Oracle strategy: Hernquist is checked against numerical integrals of the 3-D
Hernquist density (line-of-sight projection for kappa, cumulative-mass
integral for alpha) — fully independent of the closed forms under test.
Multipole is checked against autodiff of its defining potential. Light
profiles are checked against direct float64 numpy and their analytic total
fluxes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import integrate

from gigalens_tpu.profiles.base import MassProfile
from gigalens_tpu.profiles.light.gaussian import Gaussian, Moffat
from gigalens_tpu.profiles.mass.hernquist import Hernquist, HernquistEllipse
from gigalens_tpu.profiles.mass.multipole import Multipole


@pytest.fixture
def rng():
    return np.random.default_rng(11)


# ---------------------------------------------------------------- Hernquist
def _hern_sigma(R, Rs=1.0):
    """Projected surface density of rho = 1/((r/Rs)(1+r/Rs)^3), per rho0."""

    def integrand(z, R):
        r = np.hypot(R, z)
        return 1.0 / ((r / Rs) * (1 + r / Rs) ** 3)

    return np.array(
        [2 * integrate.quad(integrand, 0, np.inf, args=(R_,))[0] for R_ in R]
    )


def test_hernquist_kappa_vs_density_integral():
    # kappa = sigma0 * shape(x) must equal the LOS integral of the Hernquist
    # density with sigma0 = rho0 * Rs
    R = np.array([0.3, 0.7, 0.97, 1.0, 1.02, 1.5, 3.0, 8.0])
    want = _hern_sigma(R)  # per rho0, Rs = 1 -> kappa / sigma0
    got = Hernquist().convergence(
        x=jnp.asarray(R, jnp.float32), y=jnp.zeros(len(R), jnp.float32),
        sigma0=1.0, Rs=1.0, center_x=0.0, center_y=0.0,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-6)


def test_hernquist_alpha_vs_mass_integral():
    # alpha(R) = (2/R) int_0^R kappa(r) r dr for a circular lens
    R = np.array([0.4, 0.9, 1.0, 1.1, 2.5, 6.0])

    def alpha_num(R_):
        val, _ = integrate.quad(lambda r: _hern_sigma(np.array([r]))[0] * r, 0, R_)
        return 2.0 * val / R_

    want = np.array([alpha_num(R_) for R_ in R])
    fx, fy = Hernquist().deriv(
        x=jnp.asarray(R, jnp.float32), y=jnp.zeros(len(R), jnp.float32),
        sigma0=1.0, Rs=1.0, center_x=0.0, center_y=0.0,
    )
    np.testing.assert_allclose(np.asarray(fx), want, rtol=3e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fy), 0.0, atol=1e-7)


def test_hernquist_hessian_vs_autodiff(rng):
    x = (rng.normal(size=400) * 2).astype(np.float32)
    y = (rng.normal(size=400) * 2).astype(np.float32)
    kw = dict(sigma0=0.8, Rs=1.3, center_x=0.05, center_y=-0.1)
    got = Hernquist().hessian(x, y, **kw)
    want = MassProfile.hessian(Hernquist(), x, y, **kw)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-3, atol=2e-4)


def test_hernquist_branch_point_smooth():
    # the series patch must join the closed forms smoothly across x = 1
    x = jnp.linspace(0.9, 1.1, 2001)
    a = Hernquist().deriv(x, jnp.zeros_like(x), 1.0, 1.0, 0.0, 0.0)[0]
    assert bool(jnp.all(jnp.isfinite(a)))
    # monotone and smooth across the patch boundary: second differences tiny
    d2 = jnp.diff(np.asarray(a), n=2)
    assert float(jnp.max(jnp.abs(d2))) < 5e-5
    g = jax.grad(lambda xx: Hernquist().deriv(xx, 0.0, 1.0, 1.0, 0.0, 0.0)[0])(1.0)
    assert bool(jnp.isfinite(g))


def test_hernquist_ellipse_reduces_to_sphere(rng):
    x = (rng.normal(size=300) * 2).astype(np.float32)
    y = (rng.normal(size=300) * 2).astype(np.float32)
    got = HernquistEllipse().deriv(
        x, y, sigma0=0.7, Rs=1.2, e1=0.0, e2=0.0, center_x=0.1, center_y=0.0
    )
    want = Hernquist().deriv(x, y, sigma0=0.7, Rs=1.2, center_x=0.1, center_y=0.0)
    np.testing.assert_allclose(got[0], want[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got[1], want[1], rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------- Multipole
def _multipole_potential(x, y, m, a_m, phi_m):
    r = jnp.sqrt(x * x + y * y)
    phi = jnp.arctan2(y, x)
    return r * a_m / (1.0 - m * m) * jnp.cos(m * (phi - phi_m))


@pytest.mark.parametrize("m", [2, 3, 4])
def test_multipole_deriv_is_potential_gradient(rng, m):
    xs = (rng.normal(size=200) * 1.5).astype(np.float32)
    ys = (rng.normal(size=200) * 1.5).astype(np.float32)
    prof = Multipole(m=m)
    fx, fy = prof.deriv(xs, ys, a_m=0.05, phi_m=0.3, center_x=0.0, center_y=0.0)
    gfun = jax.vmap(
        jax.grad(lambda x, y: _multipole_potential(x, y, m, 0.05, 0.3), argnums=(0, 1))
    )
    gx, gy = gfun(jnp.asarray(xs), jnp.asarray(ys))
    np.testing.assert_allclose(np.asarray(fx), np.asarray(gx), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(fy), np.asarray(gy), rtol=2e-4, atol=2e-6)


def test_multipole_hessian_vs_autodiff(rng):
    xs = (rng.normal(size=200) * 1.5).astype(np.float32)
    ys = (rng.normal(size=200) * 1.5).astype(np.float32)
    prof = Multipole(m=4)
    kw = dict(a_m=0.05, phi_m=-0.4, center_x=0.02, center_y=0.01)
    got = prof.hessian(xs, ys, **kw)
    want = MassProfile.hessian(prof, xs, ys, **kw)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-3, atol=1e-5)


def test_multipole_convergence_from_trace(rng):
    xs = (rng.normal(size=100) * 1.5).astype(np.float32)
    ys = (rng.normal(size=100) * 1.5).astype(np.float32)
    prof = Multipole(m=3)
    kw = dict(a_m=0.08, phi_m=0.1, center_x=0.0, center_y=0.0)
    f_xx, _, _, f_yy = prof.hessian(xs, ys, **kw)
    np.testing.assert_allclose(
        np.asarray(0.5 * (f_xx + f_yy)),
        np.asarray(prof.convergence(xs, ys, **kw)),
        rtol=1e-5, atol=1e-7,
    )


def test_multipole_m1_rejected():
    with pytest.raises(ValueError):
        Multipole(m=1)


# ------------------------------------------------------------- light profiles
def test_gaussian_values_and_flux(rng):
    xs = (rng.normal(size=500) * 2).astype(np.float32)
    ys = (rng.normal(size=500) * 2).astype(np.float32)
    got = Gaussian().light(
        xs, ys, sigma=0.7, e1=0.0, e2=0.0, center_x=0.1, center_y=-0.2, amp=3.0
    )
    want = 3.0 * np.exp(
        -((xs - 0.1) ** 2 + (ys + 0.2) ** 2) / (2 * 0.7**2)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    # the axis-ratio scaling (sqrt(q), 1/sqrt(q)) preserves area: total flux
    # = 2 pi sigma^2 amp independent of ellipticity
    d = 0.02
    g = np.arange(-6, 6, d, dtype=np.float32)
    X, Y = np.meshgrid(g, g)
    img = Gaussian().light(
        X.ravel(), Y.ravel(), sigma=0.5, e1=0.2, e2=-0.1,
        center_x=0.0, center_y=0.0, amp=2.0,
    )
    flux = float(np.sum(np.asarray(img))) * d * d
    np.testing.assert_allclose(flux, 2.0 * 2 * np.pi * 0.5**2, rtol=1e-3)


def test_moffat_values_and_lstsq(rng):
    xs = (rng.normal(size=300)).astype(np.float32)
    ys = (rng.normal(size=300)).astype(np.float32)
    got = Moffat().light(
        xs, ys, rd=0.8, beta=2.5, e1=0.0, e2=0.0, center_x=0.0, center_y=0.0, amp=1.5
    )
    want = 1.5 * (1.0 + (xs**2 + ys**2) / 0.8**2) ** (-2.5)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    m = Moffat(use_lstsq=True)
    basis = m.light(xs, ys, rd=0.8, beta=2.5, e1=0.0, e2=0.0, center_x=0.0, center_y=0.0)
    assert basis.shape == (1, 300)
    assert "amp" not in m.params


def test_gaussian_param_contract():
    g = Gaussian()
    assert g.params == ["sigma", "e1", "e2", "center_x", "center_y", "amp"]
    g2 = Gaussian(use_lstsq=True)
    assert g2.params == ["sigma", "e1", "e2", "center_x", "center_y"]


# ---------------------------------------------------------------------- NIE
def test_nie_reduces_to_sie(rng):
    from gigalens_tpu.profiles.mass.sie import NIE, SIE

    x = (rng.normal(size=400) * 2).astype(np.float32)
    y = (rng.normal(size=400) * 2).astype(np.float32)
    kw = dict(theta_E=1.3, e1=0.15, e2=-0.08, center_x=0.05, center_y=0.0)
    got = NIE().deriv(x, y, s_scale=0.0, **kw)
    want = SIE().deriv(x, y, **kw)
    np.testing.assert_allclose(got[0], want[0], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(got[1], want[1], rtol=1e-6, atol=1e-7)


def test_nie_core_behavior(rng):
    # a cored profile must be finite with vanishing deflection at the center,
    # and match SIE far outside the core
    from gigalens_tpu.profiles.mass.sie import NIE, SIE

    kw = dict(theta_E=1.0, e1=0.1, e2=0.05, center_x=0.0, center_y=0.0)
    fx0, fy0 = NIE().deriv(jnp.asarray([1e-5]), jnp.asarray([1e-5]), s_scale=0.3, **kw)
    assert abs(float(fx0[0])) < 1e-3 and abs(float(fy0[0])) < 1e-3

    r = rng.uniform(4.0, 10.0, size=200)
    th = rng.uniform(0, 2 * np.pi, size=200)
    x = (r * np.cos(th)).astype(np.float32)
    y = (r * np.sin(th)).astype(np.float32)
    got = NIE().deriv(x, y, s_scale=0.05, **kw)
    want = SIE().deriv(x, y, **kw)
    # the core deficit falls off as ~s/r: < 1.5% beyond r = 4 at s = 0.05
    np.testing.assert_allclose(got[0], want[0], rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(got[1], want[1], rtol=2e-2, atol=2e-3)


def test_nie_gradients_finite(rng):
    from gigalens_tpu.profiles.mass.sie import NIE

    def f(p):
        fx, fy = NIE().deriv(0.7, -0.4, **p)
        return fx + fy

    g = jax.grad(f)(dict(theta_E=1.2, e1=0.0, e2=0.0, s_scale=0.2,
                         center_x=0.0, center_y=0.0))
    assert all(bool(jnp.isfinite(v)) for v in g.values())
