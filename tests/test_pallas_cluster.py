"""Pallas dPIE cluster kernel: interpret-mode parity + gradient exactness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigalens_tpu.ops.pallas.dpie_cluster import (
    dpie_cluster_deriv,
    make_galaxy_table,
)
from gigalens_tpu.profiles.mass.dpie_subhalo import DPIESubhalo

POWERS = {"theta_E": 0.5, "r_core": 0.5, "r_cut": 0.5}


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    G, P, bs = 13, 300, 3
    cat = dict(
        lum=rng.uniform(0.3, 3.0, G).astype(np.float32),
        center_x=rng.normal(0, 2.0, G).astype(np.float32),
        center_y=rng.normal(0, 2.0, G).astype(np.float32),
        e1=rng.uniform(-0.3, 0.3, G).astype(np.float32),
        e2=rng.uniform(-0.3, 0.3, G).astype(np.float32),
    )
    table = jnp.asarray(make_galaxy_table(cat, 1.0, POWERS))
    x = jnp.asarray((rng.normal(size=P) * 3).astype(np.float32))
    y = jnp.asarray((rng.normal(size=P) * 3).astype(np.float32))
    scales = jnp.asarray(
        np.stack(
            [rng.uniform(0.5, 1.5, bs), np.full(bs, 0.08), np.full(bs, 1.6)], axis=1
        ).astype(np.float32)
    )
    return cat, table, x, y, scales


def test_kernel_matches_xla(setup):
    cat, table, x, y, scales = setup
    ax, ay = dpie_cluster_deriv(scales, table, x, y, True)
    ref = DPIESubhalo(lum_star=1.0, galaxy_catalogue=cat)
    wx, wy = ref.deriv(
        x, y, theta_E=scales[:, 0:1], r_core=scales[:, 1:2], r_cut=scales[:, 2:3]
    )
    np.testing.assert_allclose(ax, wx, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ay, wy, rtol=1e-4, atol=1e-4)


def test_kernel_gradients_match_xla(setup):
    cat, table, x, y, scales = setup
    ref = DPIESubhalo(lum_star=1.0, galaxy_catalogue=cat)

    def loss_kernel(s):
        ax, ay = dpie_cluster_deriv(s, table, x, y, True)
        return jnp.sum(jnp.sin(ax) + ay**2)

    def loss_xla(s):
        ax, ay = ref.deriv(
            x, y, theta_E=s[:, 0:1], r_core=s[:, 1:2], r_cut=s[:, 2:3]
        )
        return jnp.sum(jnp.sin(ax) + ay**2)

    g_k = jax.grad(loss_kernel)(scales)
    g_x = jax.grad(loss_xla)(scales)
    np.testing.assert_allclose(g_k, g_x, rtol=2e-3, atol=2e-3)


def test_profile_class_fallback(setup):
    """On CPU the profile class falls back to XLA and matches the kernel."""
    cat, table, x, y, scales = setup
    from gigalens_tpu.profiles.mass.dpie_subhalo import DPIESubhaloPallas

    prof = DPIESubhaloPallas(lum_star=1.0, galaxy_catalogue=cat)
    assert not prof.use_kernel  # tests run on CPU
    fx, fy = prof.deriv(
        x, y, theta_E=scales[:, 0:1], r_core=scales[:, 1:2], r_cut=scales[:, 2:3]
    )
    ax, ay = dpie_cluster_deriv(scales, table, x, y, True)
    np.testing.assert_allclose(fx, ax, rtol=1e-4, atol=1e-4)
