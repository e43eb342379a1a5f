"""Independent float64 numpy reference implementations (the numerics oracle).

The reference repo tests profiles against lenstronomy
(``tests/test_profiles.py``); lenstronomy is not available in this
environment, so these oracles are written directly from the published
formulas (Tessore & Metcalf 2015 for EPL; Kormann 1994 for SIE; standard
closed forms otherwise) in float64 numpy, entirely independent of the JAX
implementations under test.
"""
import numpy as np
from scipy.special import hyp2f1


def _polar(e1, e2):
    phi = np.arctan2(e2, e1) / 2.0
    c = np.minimum(np.sqrt(e1**2 + e2**2), 0.9999)
    q = (1 - c) / (1 + c)
    return q, phi


def _rotate(x, y, phi):
    c, s = np.cos(phi), np.sin(phi)
    return x * c + y * s, -x * s + y * c


def sis_deriv(x, y, theta_E, cx, cy):
    dx, dy = x - cx, y - cy
    r = np.sqrt(dx**2 + dy**2)
    with np.errstate(divide="ignore", invalid="ignore"):
        a = np.where(r == 0, 0.0, theta_E / r)
    return a * dx, a * dy


def shear_deriv(x, y, g1, g2):
    return g1 * x + g2 * y, g2 * x - g1 * y


def sie_deriv(x, y, theta_E, e1, e2, cx, cy):
    q, phi = _polar(e1, e2)
    b = theta_E * np.sqrt(2 * q / (1 + q**2)) * np.sqrt((1 + q**2) / 2)
    x, y = _rotate(x - cx, y - cy, phi)
    psi = np.sqrt(q**2 * x**2 + y**2)
    root = np.sqrt(1 - q**2)
    fx = b / root * np.arctan(root * x / psi)
    fy = b / root * np.arctanh(root * y / psi)
    return _rotate(fx, fy, -phi)


def epl_deriv(x, y, theta_E, gamma, e1, e2, cx, cy):
    """Tessore & Metcalf (2015) eq. 29 via the Gauss hypergeometric function."""
    q, phi = _polar(e1, e2)
    b = theta_E * np.sqrt(q)  # intermediate-axis convention
    t = gamma - 1.0
    x, y = _rotate(x - cx, y - cy, phi)
    z = q * x + 1j * y
    R = np.abs(z)
    ang = np.angle(z)
    f = (1 - q) / (1 + q)
    # complex deflection in the rotated frame
    alpha = (
        2 * b / (1 + q) * (b / R) ** (t - 1)
        * np.exp(1j * ang)
        * hyp2f1(1.0, t / 2.0, 2.0 - t / 2.0, -f * np.exp(2j * ang))
    )
    fx, fy = alpha.real, alpha.imag
    return _rotate(fx, fy, -phi)


def sersic_ellipse_light(x, y, R_sersic, n_sersic, e1, e2, cx, cy, Ie):
    phi = np.arctan2(e2, e1) / 2.0
    c = np.sqrt(e1**2 + e2**2)
    q = (1 - c) / (1 + c)
    dx, dy = x - cx, y - cy
    cp, sp = np.cos(phi), np.sin(phi)
    xt1 = (cp * dx + sp * dy) * np.sqrt(q)
    xt2 = (-sp * dx + cp * dy) / np.sqrt(q)
    R = np.sqrt(xt1**2 + xt2**2)
    bn = 1.9992 * n_sersic - 0.3271
    return Ie * np.exp(-bn * ((R / R_sersic) ** (1.0 / n_sersic) - 1.0))


def nfw_deriv(x, y, Rs, alpha_Rs, cx, cy):
    """Wright & Brainerd (2000) spherical NFW deflection."""
    rho0 = alpha_Rs / (4.0 * Rs**2 * (1.0 - np.log(2.0)))
    dx, dy = x - cx, y - cy
    R = np.maximum(np.sqrt(dx**2 + dy**2), 1e-7)
    xx = np.maximum(R / Rs, 1e-6)
    g = np.empty_like(xx)
    lo = xx < 1
    hi = xx > 1
    g[lo] = np.log(xx[lo] / 2.0) + np.arccosh(1.0 / xx[lo]) / np.sqrt(1 - xx[lo] ** 2)
    g[hi] = np.log(xx[hi] / 2.0) + np.arccos(1.0 / xx[hi]) / np.sqrt(xx[hi] ** 2 - 1)
    g[~lo & ~hi] = 1.0 + np.log(0.5)
    a = 4 * rho0 * Rs * g / xx**2
    return a * dx, a * dy


def dpis_deriv(x, y, theta_E, r_core, r_cut, cx, cy):
    """Eliasdottir (2007) A20 dual pseudo-isothermal sphere."""
    dx, dy = x - cx, y - cy
    r2 = dx**2 + dy**2
    scale = theta_E * r_cut / (r_cut - r_core)
    f = np.sqrt(r2 + r_core**2) - r_core - np.sqrt(r2 + r_cut**2) + r_cut
    a = scale / r2 * f
    return a * dx, a * dy


def dpie_deriv(x, y, theta_E, r_core, r_cut, e1, e2, cx, cy):
    """Kassiola & Kovner (1993) 4.1.2 elliptical dPIE with complex arithmetic,
    done directly in numpy complex128."""
    phi = np.arctan2(e2, e1) / 2.0
    e = np.minimum(np.sqrt(e1**2 + e2**2), 0.9999)
    q = (1 - e) / (1 + e)
    x, y = _rotate(x - cx, y - cy, phi)
    sqe = np.sqrt(e)
    rem2 = x**2 / (1 + e) ** 2 + y**2 / (1 - e) ** 2

    def I_w(w):
        num = q * x + 1j * (2 * sqe * np.sqrt(w**2 + rem2) - y / q)
        den = x + 1j * (2 * w * sqe - y)
        return num / den

    zr = np.log(I_w(r_core) / I_w(r_cut))
    scale_c = -0.5 * (1 - e**2) / sqe
    fx = -scale_c * zr.imag
    fy = scale_c * zr.real
    scale = theta_E * r_cut / (r_cut - r_core)
    return _rotate(scale * fx, scale * fy, -phi)


def hermite_phi(n, x):
    """1-D dimensionless shapelet basis phi_n(x) (Refregier 2003)."""
    from numpy.polynomial.hermite import hermval
    from scipy.special import gammaln

    coef = np.zeros(n + 1)
    coef[n] = 1.0
    norm = 1.0 / np.sqrt(2**n * np.sqrt(np.pi) * np.exp(gammaln(n + 1)))
    return norm * hermval(x, coef) * np.exp(-(x**2) / 2.0)
