"""Probability layer: distributions vs scipy, bijectors, prior packing."""
import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as st

from gigalens_tpu.prob import Prior
from gigalens_tpu.prob import bijectors as bj
from gigalens_tpu.prob import distributions as gld


def test_normal_logprob():
    d = gld.Normal(1.5, 2.0)
    x = np.linspace(-5, 8, 50, dtype=np.float32)
    np.testing.assert_allclose(
        d.log_prob(x), st.norm.logpdf(x, 1.5, 2.0), rtol=1e-5, atol=1e-6
    )


def test_lognormal_logprob():
    d = gld.LogNormal(0.25, 0.5)
    x = np.linspace(0.1, 5, 50, dtype=np.float32)
    np.testing.assert_allclose(
        d.log_prob(x),
        st.lognorm.logpdf(x, 0.5, scale=np.exp(0.25)),
        rtol=1e-5,
        atol=1e-5,
    )


def test_uniform_logprob():
    d = gld.Uniform(2.0, 6.0)
    assert np.isclose(float(d.log_prob(3.0)), -np.log(4.0))
    assert float(d.log_prob(7.0)) == -np.inf


def test_truncated_normal_logprob_and_sampling():
    loc, scale, lo, hi = 2.0, 0.25, 1.0, 3.0
    d = gld.TruncatedNormal(loc, scale, lo, hi)
    x = np.linspace(1.05, 2.95, 40, dtype=np.float32)
    a, b = (lo - loc) / scale, (hi - loc) / scale
    np.testing.assert_allclose(
        d.log_prob(x),
        st.truncnorm.logpdf(x, a, b, loc, scale),
        rtol=1e-4,
        atol=1e-4,
    )
    s = d.sample(jax.random.PRNGKey(0), (20000,))
    assert float(s.min()) >= lo and float(s.max()) <= hi
    np.testing.assert_allclose(
        float(s.mean()), st.truncnorm.mean(a, b, loc, scale), atol=0.01
    )


def test_truncated_normal_sampling_is_reparameterized():
    def mean_of_samples(loc):
        d = gld.TruncatedNormal(loc, 0.25, 1.0, 3.0)
        return jnp.mean(d.sample(jax.random.PRNGKey(0), (256,)))

    g = jax.grad(mean_of_samples)(2.0)
    assert np.isfinite(float(g)) and float(g) > 0.5


def test_sampling_moments():
    key = jax.random.PRNGKey(1)
    n = 200_000
    assert np.isclose(float(gld.Normal(2, 3).sample(key, (n,)).mean()), 2.0, atol=0.05)
    ln = gld.LogNormal(0.5, 0.25).sample(key, (n,))
    assert np.isclose(float(jnp.log(ln).mean()), 0.5, atol=0.01)
    u = gld.Uniform(-1, 3).sample(key, (n,))
    assert np.isclose(float(u.mean()), 1.0, atol=0.02)


def test_bijector_fldj_matches_autodiff():
    for b in [
        bj.Identity(),
        bj.Exp(),
        bj.Softplus(),
        bj.Sigmoid(-2.0, 5.0),
        bj.Scale(2.5),
        bj.Chain([bj.Sigmoid(0.0, 2.0), bj.Scale(0.5)]),
    ]:
        for z in [-1.5, 0.0, 0.7]:
            want = np.log(abs(float(jax.grad(lambda t: b.forward(t))(z))))
            got = float(b.forward_log_det_jacobian(jnp.float32(z)))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
            # inverse round trip
            np.testing.assert_allclose(
                float(b.inverse(b.forward(jnp.float32(z)))), z, rtol=1e-4, atol=1e-5
            )


def test_fill_triangular_roundtrip():
    d = 5
    vec = jnp.arange(1.0, 1.0 + d * (d + 1) // 2)
    m = bj.fill_triangular(vec, d)
    assert m.shape == (d, d)
    assert np.allclose(np.triu(np.asarray(m), 1), 0)
    np.testing.assert_allclose(bj.fill_triangular_inverse(m), vec)


def test_fill_scale_tril():
    d = 4
    b = bj.FillScaleTriL(d, diag_shift=1e-6)
    key = jax.random.PRNGKey(2)
    z = jax.random.normal(key, (d * (d + 1) // 2,))
    m = b.forward(z)
    assert np.all(np.diagonal(np.asarray(m)) > 0)
    np.testing.assert_allclose(b.inverse(m), z, rtol=1e-4, atol=1e-5)


def test_prior_roundtrip(demo_prior):
    x = demo_prior.sample(jax.random.PRNGKey(0), 5)
    z = demo_prior.unconstrain(x)
    assert z.shape == (5, demo_prior.d)
    x2 = demo_prior.constrain(z)
    for a, b in zip(jax.tree_util.tree_leaves(x), jax.tree_util.tree_leaves(x2)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)


def test_prior_fldj_shape_and_autodiff(demo_prior):
    z = demo_prior.unconstrain(demo_prior.sample(jax.random.PRNGKey(0), 5))
    ld = demo_prior.fldj(z)
    assert ld.shape == (5,)

    # spot-check against autodiff of the full constrain map (diagonal Jacobian)
    def constrained_vec(zi):
        x = demo_prior.constrain(zi[None, :])
        return jnp.concatenate(
            [jnp.ravel(l) for l in jax.tree_util.tree_leaves(x)]
        )

    J = jax.jacfwd(constrained_vec)(z[0])
    want = float(jnp.sum(jnp.log(jnp.abs(jnp.diagonal(J)))))
    np.testing.assert_allclose(float(ld[0]), want, rtol=1e-4, atol=1e-4)


def test_prior_log_prob_z_consistency(demo_prior):
    """Monte-Carlo change of variables: samples of z from prior pushforward
    must score with finite density and integrate consistently (IS identity)."""
    key = jax.random.PRNGKey(3)
    x = demo_prior.sample(key, 1000)
    z = demo_prior.unconstrain(x)
    lp_z = demo_prior.log_prob_z(z)
    assert np.isfinite(np.asarray(lp_z)).all()
    # density in z-space must differ from x-space by the Jacobian exactly
    np.testing.assert_allclose(
        lp_z, demo_prior.log_prob(x) + demo_prior.fldj(z), rtol=1e-5, atol=1e-4
    )


def test_mvn_tril():
    key = jax.random.PRNGKey(4)
    d = 3
    A = jax.random.normal(key, (d, d))
    tril = jnp.tril(A) + d * jnp.eye(d)
    mvn = gld.MultivariateNormalTriL(jnp.arange(3.0), tril)
    x = mvn.sample(key, (50000,))
    np.testing.assert_allclose(np.mean(np.asarray(x), 0), [0, 1, 2], atol=0.1)
    np.testing.assert_allclose(
        np.cov(np.asarray(x).T), np.asarray(mvn.covariance()), atol=0.5
    )
    want = st.multivariate_normal.logpdf(
        np.asarray(x[:100]), np.arange(3.0), np.asarray(mvn.covariance())
    )
    np.testing.assert_allclose(mvn.log_prob(x[:100]), want, rtol=1e-3, atol=1e-3)
