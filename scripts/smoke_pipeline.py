"""Dev smoke: full MAP -> SVI -> HMC -> SMC pipeline on CPU, tiny config."""
import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.inference import ModellingSequence
from gigalens_tpu.model import ForwardProbModel
from gigalens_tpu.prob import Prior
from gigalens_tpu.prob import distributions as tfd
from gigalens_tpu.profiles.light.sersic import SersicEllipse
from gigalens_tpu.profiles.mass.epl import EPL
from gigalens_tpu.profiles.mass.shear import Shear
from gigalens_tpu.simulator import LensSimulator


def demo_prior():
    return Prior(
        dict(
            lens_mass=[
                dict(
                    theta_E=tfd.LogNormal(jnp.log(1.25), 0.25),
                    gamma=tfd.TruncatedNormal(2, 0.25, 1, 3),
                    e1=tfd.Normal(0, 0.1),
                    e2=tfd.Normal(0, 0.1),
                    center_x=tfd.Normal(0, 0.05),
                    center_y=tfd.Normal(0, 0.05),
                ),
                dict(gamma1=tfd.Normal(0, 0.05), gamma2=tfd.Normal(0, 0.05)),
            ],
            lens_light=[
                dict(
                    R_sersic=tfd.LogNormal(jnp.log(1.0), 0.15),
                    n_sersic=tfd.Uniform(2, 6),
                    e1=tfd.TruncatedNormal(0, 0.1, -0.3, 0.3),
                    e2=tfd.TruncatedNormal(0, 0.1, -0.3, 0.3),
                    center_x=tfd.Normal(0, 0.05),
                    center_y=tfd.Normal(0, 0.05),
                    Ie=tfd.LogNormal(jnp.log(500.0), 0.3),
                )
            ],
            source_light=[
                dict(
                    R_sersic=tfd.LogNormal(jnp.log(0.25), 0.15),
                    n_sersic=tfd.Uniform(0.5, 4),
                    e1=tfd.TruncatedNormal(0, 0.15, -0.5, 0.5),
                    e2=tfd.TruncatedNormal(0, 0.15, -0.5, 0.5),
                    center_x=tfd.Normal(0, 0.25),
                    center_y=tfd.Normal(0, 0.25),
                    Ie=tfd.LogNormal(jnp.log(150.0), 0.5),
                )
            ],
        )
    )


prior = demo_prior()
phys = PhysicalModel([EPL(30), Shear()], [SersicEllipse()], [SersicEllipse()])
psf = np.exp(-((np.arange(9) - 4) ** 2 + (np.arange(9)[:, None] - 4) ** 2) / 4.0)
psf /= psf.sum()
cfg = SimulatorConfig(delta_pix=0.065, num_pix=40, supersample=2, kernel=psf)

# ground truth
truth = prior.sample(jax.random.PRNGKey(42), 1)
sim1 = LensSimulator(phys, cfg, bs=1)
truth_img = sim1.simulate(truth)
rng = np.random.default_rng(1)
bkg, exp_time = 0.2, 100.0
noise = rng.normal(size=truth_img.shape) * np.sqrt(
    bkg**2 + np.clip(np.asarray(truth_img), 0, None) / exp_time
)
obs = np.asarray(truth_img) + noise

prob_model = ForwardProbModel(prior, obs, background_rms=bkg, exp_time=exp_time)
seq = ModellingSequence(phys, prob_model, cfg)

t0 = time.time()
schedule = optax.polynomial_schedule(-1e-2, -1e-2 / 3, 0.5, 80)
opt = optax.chain(optax.scale_by_adam(), optax.scale_by_schedule(schedule))
z_map = seq.MAP(opt, n_samples=50, num_steps=80, seed=0)
t_map = time.time() - t0
sim_b = LensSimulator(phys, cfg, bs=50)
lps, chi2 = prob_model.log_prob(sim_b, z_map)
print(f"MAP done {t_map:.1f}s best chi2={float(jnp.nanmin(chi2)):.3f}")
# 80 steps is deliberately under-converged for smoke speed; full convergence
# to chi2 ~ 1.04 at 300 steps is covered in tests/test_inference.py.
assert float(jnp.nanmin(chi2)) < 2.5, "MAP should make progress toward chi2 ~ 1"

best = seq.best_map_start(z_map)
t0 = time.time()
schedule = optax.polynomial_schedule(-1e-6, -3e-3, 2, 60)
opt = optax.chain(optax.scale_by_adam(), optax.scale_by_schedule(schedule))
q_z, losses = seq.SVI(best, opt, n_vi=32, num_steps=100, seed=1)
t_svi = time.time() - t0
print(f"SVI done {t_svi:.1f}s elbo[0]={float(losses[0]):.1f} elbo[-1]={float(losses[-1]):.1f}")
assert float(losses[-1]) < float(losses[0])

t0 = time.time()
res = seq.HMC(q_z, n_hmc=8, num_burnin_steps=30, num_results=50, seed=2)
t_hmc = time.time() - t0
print(
    f"HMC done {t_hmc:.1f}s samples={res.samples.shape} "
    f"accept={float(res.accept_rate[-20:].mean()):.2f} eps={float(res.step_size):.4f}"
)
assert res.samples.shape == (50, 8, 22)
acc = float(res.accept_rate[-20:].mean())
assert 0.2 < acc <= 1.0, f"accept rate {acc}"

# posterior should cover truth roughly: compare posterior mean chi2
z_post = res.samples.reshape(-1, 22)[-50:]
sim_p = LensSimulator(phys, cfg, bs=50)
_, chi2_post = prob_model.log_prob(sim_p, z_post)
print("posterior chi2 mean:", float(jnp.mean(chi2_post)))

# SMC smoke: start particles from the MAP cloud so tempering has a warm
# start; assert mechanics (stage progress, finite particles, beta advanced).
t0 = time.time()
smc = seq.SMC(start=z_map, num_particles=50, num_ensembles=1,
              num_leapfrog_steps=5, post_sampling_steps=5, max_stage=15,
              target="pixels", auxiliar="none", seed=3)
t_smc = time.time() - t0
print(
    f"SMC done {t_smc:.1f}s stages={int(smc.num_stages)} "
    f"beta={float(smc.final_beta[0]):.4f} particles={smc.particles.shape}"
)
assert np.isfinite(np.asarray(smc.particles)).all()
assert float(smc.final_beta[0]) > 0.0
sim_s = LensSimulator(phys, cfg, bs=50)
_, chi2_smc = prob_model.log_prob(sim_s, smc.particles.reshape(50, 22))
print("SMC chi2 mean:", float(jnp.mean(chi2_smc)))

print("PIPELINE SMOKE OK")
