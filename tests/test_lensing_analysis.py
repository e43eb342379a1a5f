"""Critical curves / caustics / Einstein radius (utils.lensing).

Analytic oracles: for SIS(theta_E) the tangential critical curve is the
circle r = theta_E and the tangential caustic degenerates to the origin;
for an SIE the tangential caustic is a finite astroid strictly inside the
critical curve. Effective Einstein radius = theta_E exactly for circular
isothermal mass.
"""
import numpy as np
import pytest

from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.profiles.light.sersic import SersicEllipse
from gigalens_tpu.profiles.mass.sie import SIE, SIS
from gigalens_tpu.simulator import LensSimulator
from gigalens_tpu.utils import lensing


def _sim(mass_profile):
    phys = PhysicalModel([mass_profile], [], [SersicEllipse()])
    cfg = SimulatorConfig(delta_pix=0.1, num_pix=60, supersample=1)
    return LensSimulator(phys, cfg, bs=1)


SIS_PARAMS = [dict(theta_E=1.3, center_x=0.05, center_y=-0.02)]


def test_sis_tangential_critical_curve_is_einstein_ring():
    sim = _sim(SIS())
    curves = lensing.critical_curves(sim, SIS_PARAMS, n=300, which="tangential")
    assert curves, "no tangential critical curve found"
    c = max(curves, key=len)
    r = np.hypot(c[:, 0] - 0.05, c[:, 1] + 0.02)
    np.testing.assert_allclose(r, 1.3, atol=0.02)
    # closed curve covering all position angles
    ang = np.arctan2(c[:, 1] + 0.02, c[:, 0] - 0.05)
    assert ang.max() - ang.min() > 5.5


def test_sis_tangential_caustic_degenerates_to_center():
    sim = _sim(SIS())
    caus = lensing.caustics(sim, SIS_PARAMS, n=300, which="tangential")
    c = max(caus, key=len)
    r = np.hypot(c[:, 0] - 0.05, c[:, 1] + 0.02)
    assert r.max() < 0.05  # point caustic up to grid resolution


def test_det_matches_eigenvalue_product():
    sim = _sim(SIE())
    params = [dict(theta_E=1.2, e1=0.12, e2=-0.06, center_x=0.0, center_y=0.0)]
    x = np.linspace(-2, 2, 31, dtype=np.float32)
    lam_t, lam_r = lensing.jacobian_eigenvalues(sim, params, x, 0.3 * x + 0.1)
    det, _, _, _ = lensing._fields(
        sim, lensing._scalarize(params), x, (0.3 * x + 0.1).astype(np.float32)
    )
    np.testing.assert_allclose(np.asarray(lam_t) * np.asarray(lam_r),
                               np.asarray(det), rtol=2e-5, atol=2e-6)


def test_sie_caustic_inside_critical_curve():
    sim = _sim(SIE())
    params = [dict(theta_E=1.2, e1=0.15, e2=0.0, center_x=0.0, center_y=0.0)]
    crit = max(lensing.critical_curves(sim, params, n=400, which="tangential"),
               key=len)
    caus = max(lensing.caustics(sim, params, n=400, which="tangential"), key=len)
    r_crit = np.hypot(crit[:, 0], crit[:, 1])
    r_caus = np.hypot(caus[:, 0], caus[:, 1])
    assert 0.9 < r_crit.mean() < 1.5
    assert r_caus.max() < r_crit.min()  # astroid strictly inside the ring
    # astroid has 4-fold structure: non-degenerate but much smaller than ring
    assert 0.005 < r_caus.max() < 0.5


@pytest.mark.parametrize("theta_E", [0.8, 1.3])
def test_effective_einstein_radius_sis(theta_E):
    sim = _sim(SIS())
    est = lensing.einstein_radius(
        sim, [dict(theta_E=theta_E, center_x=0.0, center_y=0.0)], n=500
    )
    np.testing.assert_allclose(est, theta_E, rtol=0.02)


def test_einstein_radius_nan_when_subcritical():
    sim = _sim(SIS())
    est = lensing.einstein_radius(
        sim, [dict(theta_E=1e-4, center_x=0.0, center_y=0.0)], n=200
    )
    assert np.isnan(est)


def test_marching_squares_circle():
    # regression: xs contains exactly +-1.0 and 0, so the unit circle passes
    # exactly through grid nodes — zero-valued corners used to fragment the
    # contour into 9 polylines
    xs = np.linspace(-2, 2, 201)
    ys = np.linspace(-2, 2, 201)
    X, Y = np.meshgrid(xs, ys, indexing="xy")
    curves = lensing.marching_squares(X**2 + Y**2 - 1.0, xs, ys)
    assert len(curves) == 1
    c = curves[0]
    np.testing.assert_allclose(np.hypot(c[:, 0], c[:, 1]), 1.0, atol=1e-3)
    # closed: endpoints coincide
    np.testing.assert_allclose(c[0], c[-1], atol=1e-9)


def test_marching_squares_contour_exactly_on_node_row():
    # the contour is the straight line y=0, lying entirely ON grid nodes
    xs = np.linspace(-1, 1, 21)
    ys = np.linspace(-1, 1, 21)
    _, Y = np.meshgrid(xs, ys, indexing="xy")
    curves = lensing.marching_squares(Y.copy(), xs, ys)
    assert len(curves) == 1
    c = curves[0]
    np.testing.assert_allclose(c[:, 1], 0.0, atol=1e-10)
    assert c[:, 0].min() == pytest.approx(-1.0, abs=0.11)
    assert c[:, 0].max() == pytest.approx(1.0, abs=0.11)


def test_marching_squares_constant_field_no_contours():
    xs = np.linspace(-1, 1, 11)
    assert lensing.marching_squares(np.zeros((11, 11)), xs, xs) == []


def test_einstein_radius_center_on_grid_node():
    # lens center exactly on a node -> kappa=inf at one pixel; previously the
    # cumulative mean went inf everywhere and returned a spurious NaN. n odd
    # and even extent put (0, 0) exactly on the grid.
    sim = _sim(SIS())
    est = lensing.einstein_radius(
        sim, [dict(theta_E=1.0, center_x=0.0, center_y=0.0)], n=501
    )
    np.testing.assert_allclose(est, 1.0, rtol=0.02)


def test_fields_jit_cached_per_sim():
    sim = _sim(SIS())
    x = np.linspace(-2, 2, 16, dtype=np.float32)
    lensing.jacobian_eigenvalues(sim, SIS_PARAMS, x, x)
    fn = sim._lensing_fields_fn
    lensing.jacobian_eigenvalues(sim, SIS_PARAMS, x, x)
    assert sim._lensing_fields_fn is fn
