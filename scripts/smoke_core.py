"""Dev smoke test: prior -> simulator -> log_prob on CPU."""
import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import os

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.model import ForwardProbModel
from gigalens_tpu.prob import Prior
from gigalens_tpu.prob import distributions as tfd
from gigalens_tpu.profiles.light.sersic import SersicEllipse
from gigalens_tpu.profiles.mass.epl import EPL
from gigalens_tpu.profiles.mass.shear import Shear
from gigalens_tpu.simulator import LensSimulator


def demo_prior():
    lens_prior = [
        dict(
            theta_E=tfd.LogNormal(jnp.log(1.25), 0.25),
            gamma=tfd.TruncatedNormal(2, 0.25, 1, 3),
            e1=tfd.Normal(0, 0.1),
            e2=tfd.Normal(0, 0.1),
            center_x=tfd.Normal(0, 0.05),
            center_y=tfd.Normal(0, 0.05),
        ),
        dict(gamma1=tfd.Normal(0, 0.05), gamma2=tfd.Normal(0, 0.05)),
    ]
    lens_light_prior = [
        dict(
            R_sersic=tfd.LogNormal(jnp.log(1.0), 0.15),
            n_sersic=tfd.Uniform(2, 6),
            e1=tfd.TruncatedNormal(0, 0.1, -0.3, 0.3),
            e2=tfd.TruncatedNormal(0, 0.1, -0.3, 0.3),
            center_x=tfd.Normal(0, 0.05),
            center_y=tfd.Normal(0, 0.05),
            Ie=tfd.LogNormal(jnp.log(500.0), 0.3),
        )
    ]
    source_light_prior = [
        dict(
            R_sersic=tfd.LogNormal(jnp.log(0.25), 0.15),
            n_sersic=tfd.Uniform(0.5, 4),
            e1=tfd.TruncatedNormal(0, 0.15, -0.5, 0.5),
            e2=tfd.TruncatedNormal(0, 0.15, -0.5, 0.5),
            center_x=tfd.Normal(0, 0.25),
            center_y=tfd.Normal(0, 0.25),
            Ie=tfd.LogNormal(jnp.log(150.0), 0.5),
        )
    ]
    return Prior(
        dict(
            lens_mass=lens_prior,
            lens_light=lens_light_prior,
            source_light=source_light_prior,
        )
    )


prior = demo_prior()
print("d =", prior.d)
print(prior.column_names())

key = jax.random.PRNGKey(0)
x = prior.sample(key, 4)
lp = prior.log_prob(x)
print("prior sample log_prob:", lp)

z = prior.unconstrain(x)
print("z shape", z.shape)
x2 = prior.constrain(z)
flat1 = jax.tree_util.tree_leaves(x)
flat2 = jax.tree_util.tree_leaves(x2)
for a, b in zip(flat1, flat2):
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)
print("bijector round-trip OK")
print("log_prob_z:", prior.log_prob_z(z))

phys = PhysicalModel([EPL(50), Shear()], [SersicEllipse()], [SersicEllipse()])

rng = np.random.default_rng(0)
psf = np.exp(-((np.arange(25) - 12) ** 2 + (np.arange(25)[:, None] - 12) ** 2) / 8.0)
psf /= psf.sum()

cfg = SimulatorConfig(delta_pix=0.065, num_pix=60, supersample=2, kernel=psf)
sim = LensSimulator(phys, cfg, bs=4)
img = sim.simulate(x)
print("sim image", img.shape, float(img.min()), float(img.max()))
assert img.shape == (4, 60, 60)
assert np.isfinite(np.asarray(img)).all()

obs = np.asarray(img[0]) + rng.normal(size=(60, 60)) * 0.2
pm = ForwardProbModel(prior, obs, background_rms=0.2, exp_time=100)
ll, rc = pm.log_prob(sim, z)
print("log_prob:", ll, "red_chi2:", rc)
assert np.isfinite(np.asarray(ll)).all()

g = jax.grad(lambda zz: -jnp.mean(pm.log_prob(sim, zz)[0]))(z)
print("grad finite:", np.isfinite(np.asarray(g)).all(), "norm:", float(jnp.linalg.norm(g)))
print("SMOKE OK")
