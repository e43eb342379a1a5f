"""EPL O(1)-memory custom VJP: exactness against independent gradients."""
import jax
import jax.numpy as jnp
import numpy as np

from gigalens_tpu.profiles.mass.epl import EPL


def test_epl_custom_vjp_matches_fd(rng):
    """Gradient through the angular series matches central finite differences.

    float32 FD of a smooth functional at step 1e-3 carries ~1e-3 relative
    noise; the custom VJP must sit inside that band for all 6 parameters.
    """
    epl = EPL(40)
    x = (rng.normal(size=200) * 1.5).astype(np.float32)
    y = (rng.normal(size=200) * 1.5).astype(np.float32)
    kw0 = dict(theta_E=1.2, gamma=2.2, e1=0.12, e2=-0.07, center_x=0.03, center_y=-0.02)

    def loss(kw):
        fx, fy = epl.deriv(x, y, **kw)
        return jnp.mean(jnp.sin(fx) + fy**2)

    g = jax.grad(loss)({k: jnp.float32(v) for k, v in kw0.items()})
    eps = 1e-3
    for k in kw0:
        kp = dict(kw0); kp[k] = kw0[k] + eps
        km = dict(kw0); km[k] = kw0[k] - eps
        fd = (float(loss({a: jnp.float32(b) for a, b in kp.items()}))
              - float(loss({a: jnp.float32(b) for a, b in km.items()}))) / (2 * eps)
        assert abs(float(g[k]) - fd) < 5e-3 * max(abs(fd), 1.0), (k, float(g[k]), fd)


def test_epl_custom_vjp_batched_shapes(rng):
    """Cotangent reduction handles (bs,1)-broadcast parameters."""
    epl = EPL(20)
    x = (rng.normal(size=64)).astype(np.float32)
    y = (rng.normal(size=64)).astype(np.float32)
    kw = dict(
        theta_E=jnp.array([[1.0], [1.3]]),
        gamma=jnp.array([[2.0], [1.8]]),
        e1=jnp.array([[0.1], [-0.2]]),
        e2=jnp.array([[0.0], [0.1]]),
        center_x=jnp.zeros((2, 1)),
        center_y=jnp.zeros((2, 1)),
    )

    def loss(kw):
        fx, fy = epl.deriv(x, y, **kw)
        return jnp.sum(fx**2 + fy**2)

    g = jax.grad(loss)(kw)
    for k, v in kw.items():
        assert g[k].shape == v.shape
        assert np.isfinite(np.asarray(g[k])).all()

    # batched grads equal per-sample grads
    for b in range(2):
        kw_b = {k: jnp.float32(v[b, 0]) for k, v in kw.items()}
        g_b = jax.grad(lambda kk: loss({k: jnp.reshape(vv, (1, 1)) for k, vv in kk.items()}))(kw_b)
        for k in kw:
            np.testing.assert_allclose(g[k][b, 0], g_b[k], rtol=2e-4, atol=1e-4)


def test_epl_hessian_matches_convergence(rng):
    """(f_xx + f_yy)/2 equals the known EPL convergence (2-t)/2 (b/R)^t."""
    epl = EPL(60)
    x = (rng.normal(size=100) * 1.5).astype(np.float32)
    y = (rng.normal(size=100) * 1.5).astype(np.float32)
    theta_E, gamma, e1, e2 = 1.1, 2.1, 0.1, -0.05
    kappa = np.asarray(
        epl.convergence(x, y, theta_E=theta_E, gamma=gamma, e1=e1, e2=e2,
                        center_x=0.0, center_y=0.0)
    )
    from gigalens_tpu.profiles.base import ellipticity_to_polar, rotate

    _, q, phi = ellipticity_to_polar(jnp.float32(e1), jnp.float32(e2))
    q = float(q); phi = float(phi)
    xr, yr = rotate(jnp.asarray(x), jnp.asarray(y), phi)
    b = theta_E * np.sqrt(q)
    t = gamma - 1
    R = np.sqrt((q * np.asarray(xr)) ** 2 + np.asarray(yr) ** 2)
    want = (2 - t) / 2 * (b / R) ** t
    np.testing.assert_allclose(kappa, want, rtol=1e-3, atol=1e-4)
