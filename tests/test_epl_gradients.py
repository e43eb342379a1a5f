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


def test_bench_niter_workload_equivalence():
    """Pin the bench's adaptive EPL depth to the full-depth workload.

    bench.py runs the published scene with ``recommended_niter(q_min=0.43,
    tol=1e-8)`` instead of the demo's pinned niter=50, on the measured claim
    (scripts/bench_epl_niter.py) that the truncated series terms fall below
    float32 epsilon on prior draws — logL and gradients agree to the ulp.
    This test pins that claim so a future profile/series edit cannot silently
    turn the bench into a different (cheaper) workload. Reference anchor for
    adaptive depth: tf/profiles/mass/epl.py:37-54.
    """
    from __graft_entry__ import _demo_setup
    from gigalens_tpu import PhysicalModel
    from gigalens_tpu.profiles.light.sersic import SersicEllipse
    from gigalens_tpu.profiles.mass.epl import EPL
    from gigalens_tpu.profiles.mass.shear import Shear
    from gigalens_tpu.simulator import LensSimulator

    bs = 8
    prior, _, cfg, pm, _ = _demo_setup(num_pix=80, bs=bs)
    z = prior.unconstrain(prior.sample(jax.random.PRNGKey(3), bs))

    niter_bench = EPL.recommended_niter(q_min=0.43, tol=1e-8)
    assert 18 <= niter_bench <= 30  # the bench's claimed regime

    outs = {}
    for niter in (niter_bench, 50):
        phys = PhysicalModel(
            [EPL(niter), Shear()], [SersicEllipse()], [SersicEllipse()]
        )
        sim = LensSimulator(phys, cfg, bs=bs)

        def lp_sum(zz, sim=sim):
            lp, _ = pm.log_prob(sim, zz)
            return jnp.sum(lp)

        lp, g = jax.jit(jax.value_and_grad(lp_sum))(z)
        outs[niter] = (np.asarray(lp), np.asarray(g))

    lp_a, g_a = outs[niter_bench]
    lp_b, g_b = outs[50]
    # <= 1 ulp in float32: nextafter-based bound
    def assert_ulp(a, b, n=1, what=""):
        a64, b64 = np.float64(a), np.float64(b)
        tol = n * np.abs(np.nextafter(np.float32(a), np.float32(np.inf))
                         .astype(np.float64) - a64)
        bad = np.abs(a64 - b64) > np.maximum(tol, 0)
        assert not np.any(bad), (what, np.abs(a64 - b64).max())

    assert_ulp(lp_a, lp_b, what="logL")
    assert_ulp(g_a, g_b, what="grad")
