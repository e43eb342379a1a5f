"""Test config: CPU platform with 8 virtual devices for mesh/sharding tests.

Must run before jax is first used anywhere; the axon TPU plugin registers
itself via sitecustomize, so the platform is forced back to CPU here.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import pytest

from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.prob import Prior
from gigalens_tpu.prob import distributions as gld
from gigalens_tpu.profiles.light.sersic import SersicEllipse
from gigalens_tpu.profiles.mass.epl import EPL
from gigalens_tpu.profiles.mass.shear import Shear


@pytest.fixture(scope="session")
def demo_prior():
    """The canonical EPL+Shear / SersicEllipse prior of the reference demo
    (reference tests/conftest.py:20-73), expressed as a gigalens_tpu Prior."""
    return Prior(
        dict(
            lens_mass=[
                dict(
                    theta_E=gld.LogNormal(jnp.log(1.25), 0.25),
                    gamma=gld.TruncatedNormal(2, 0.25, 1, 3),
                    e1=gld.Normal(0, 0.1),
                    e2=gld.Normal(0, 0.1),
                    center_x=gld.Normal(0, 0.05),
                    center_y=gld.Normal(0, 0.05),
                ),
                dict(gamma1=gld.Normal(0, 0.05), gamma2=gld.Normal(0, 0.05)),
            ],
            lens_light=[
                dict(
                    R_sersic=gld.LogNormal(jnp.log(1.0), 0.15),
                    n_sersic=gld.Uniform(2, 6),
                    e1=gld.TruncatedNormal(0, 0.1, -0.3, 0.3),
                    e2=gld.TruncatedNormal(0, 0.1, -0.3, 0.3),
                    center_x=gld.Normal(0, 0.05),
                    center_y=gld.Normal(0, 0.05),
                    Ie=gld.LogNormal(jnp.log(500.0), 0.3),
                )
            ],
            source_light=[
                dict(
                    R_sersic=gld.LogNormal(jnp.log(0.25), 0.15),
                    n_sersic=gld.Uniform(0.5, 4),
                    e1=gld.TruncatedNormal(0, 0.15, -0.5, 0.5),
                    e2=gld.TruncatedNormal(0, 0.15, -0.5, 0.5),
                    center_x=gld.Normal(0, 0.25),
                    center_y=gld.Normal(0, 0.25),
                    Ie=gld.LogNormal(jnp.log(150.0), 0.5),
                )
            ],
        )
    )


@pytest.fixture(scope="session")
def demo_physmodel():
    return PhysicalModel([EPL(30), Shear()], [SersicEllipse()], [SersicEllipse()])


@pytest.fixture(scope="session")
def small_sim_config():
    return SimulatorConfig(delta_pix=0.1, num_pix=20)


@pytest.fixture(scope="session")
def demo_data():
    return np.zeros((20, 20), np.float32), 0.1, 100.0  # image, bkg_rms, exp_time


@pytest.fixture
def rng():
    return np.random.default_rng(0)
