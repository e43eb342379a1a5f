"""Fit the reference package's shipped demo observation end-to-end.

Loads the 60x60 observed image and HST F140W PSF that furcelay/gigalens
ships (``src/gigalens/assets/{demo,psf}.npy``, read-only) and runs the full
MAP -> SVI -> HMC pipeline with the demo notebooks' model family and
priors (``jax-demo.ipynb`` cells 2-8): EPL+Shear lens, SersicEllipse lens
light + source, background_rms=0.2, exp_time=100.

This is the closest thing the reference has to a real-data acceptance
test: a user switching from GIGA-Lens should reproduce their demo fit
(reduced chi2 ~ 1, R-hat ~ 1) with this script.

Usage: python examples/demo_reference_data.py [--cpu] [--quick]
"""
import argparse
import os
import sys
import time

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--quick", action="store_true",
                    help="small sample counts for a fast smoke run")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
else:
    from gigalens_tpu.utils.aot import setup_compilation_cache
    setup_compilation_cache()

import jax.numpy as jnp
import optax

from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.inference import ModellingSequence
from gigalens_tpu.model import ForwardProbModel
from gigalens_tpu.prob import Prior
from gigalens_tpu.prob import distributions as gld
from gigalens_tpu.profiles.light.sersic import SersicEllipse
from gigalens_tpu.profiles.mass.epl import EPL
from gigalens_tpu.profiles.mass.shear import Shear
from gigalens_tpu.utils import effective_sample_size, potential_scale_reduction

# location of the reference package's demo assets; override with
# GIGALENS_ASSETS=/path/to/gigalens/src/gigalens/assets
ASSETS = os.environ.get(
    "GIGALENS_ASSETS", "/root/reference/src/gigalens/assets"
)
if not os.path.exists(os.path.join(ASSETS, "demo.npy")):
    raise SystemExit(
        f"demo assets not found under {ASSETS}; set GIGALENS_ASSETS to the "
        "gigalens package's assets directory (contains demo.npy, psf.npy)"
    )

obs = np.load(os.path.join(ASSETS, "demo.npy")).astype(np.float32)
psf = np.load(os.path.join(ASSETS, "psf.npy")).astype(np.float32)

# the demo notebooks' priors (jax-demo.ipynb cell 2)
prior = Prior(
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

phys = PhysicalModel([EPL(50), Shear()], [SersicEllipse()], [SersicEllipse()])
cfg = SimulatorConfig(delta_pix=0.065, num_pix=60, supersample=2, kernel=psf)
pm = ForwardProbModel(prior, obs, background_rms=0.2, exp_time=100.0)
seq = ModellingSequence(phys, pm, cfg)

n_map, s_map = (64, 100) if args.quick else (500, 350)
n_vi, s_vi = (64, 100) if args.quick else (1000, 1500)
burn, res_n = (50, 100) if args.quick else (250, 750)

t0 = time.time()
sched = optax.polynomial_schedule(-1e-2, -1e-2 / 3, 0.5, s_map)
opt = optax.chain(optax.scale_by_adam(), optax.scale_by_schedule(sched))
z_map = seq.MAP(opt, n_samples=n_map, num_steps=s_map, seed=0,
                segment_steps=max(s_map // 2, 1))
sim_b = seq._sim(z_map.shape[0])
lps, chi2 = jax.jit(lambda z: pm.log_prob(sim_b, z))(z_map)
print(f"MAP {time.time()-t0:.1f}s: best reduced chi2 "
      f"{float(jnp.nanmin(chi2)):.4f}")

t0 = time.time()
best = seq.best_map_start(z_map)
sched = optax.polynomial_schedule(-1e-6, -3e-3, 2, max(s_vi // 5, 1))
opt = optax.chain(optax.scale_by_adam(), optax.scale_by_schedule(sched))
q_z, losses = seq.SVI(best, opt, n_vi=n_vi, num_steps=s_vi, seed=1,
                      segment_steps=max(s_vi // 10, 1))
print(f"SVI {time.time()-t0:.1f}s: ELBO {float(losses[-1]):.1f}")

t0 = time.time()
hmc = seq.HMC(q_z, n_hmc=50, num_burnin_steps=burn, num_results=res_n,
              seed=2, segment_steps=max((burn + res_n) // 4, 1))
samples = hmc.samples
ess = np.asarray(effective_sample_size(samples))
rhat = np.asarray(potential_scale_reduction(samples))
print(f"HMC {time.time()-t0:.1f}s: accept "
      f"{float(np.asarray(hmc.accept_rate)[-50:].mean()):.2f} "
      f"min ESS {ess.min():.0f} max R-hat {rhat.max():.4f}")

flat = samples.reshape(-1, samples.shape[-1])
sim_post = seq._sim(flat.shape[0], exact=True)
_, chi2_post = jax.jit(lambda z: pm.log_prob(sim_post, z))(flat)
print(f"posterior mean reduced chi2: {float(jnp.nanmean(chi2_post)):.4f}")

p = prior.constrain(flat)
te = np.asarray(p["lens_mass"][0]["theta_E"])
print(f"theta_E posterior: {te.mean():.4f} +- {te.std():.4f}")
