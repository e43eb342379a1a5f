"""Composite (stars + dark halo) lens model demo.

The decomposition precision lens modeling actually uses: a Hernquist
profile for the stellar mass (sharing its center/ellipticity story with
the lens light), an elliptical NFW halo for the dark matter, an m=4
multipole for boxy/disky isophote structure, and external shear — i.e.
the profiles this framework adds beyond the reference's EPL-only demos.
Simulates a truth, runs MAP -> Laplace-initialized SVI -> HMC, and checks
posterior recovery of the stellar/halo split.

Usage:
    python examples/demo_composite.py [--cpu] [--quick]
"""
import argparse
import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)
import time

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true", help="force CPU backend")
parser.add_argument("--quick", action="store_true", help="small, fast config")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.inference import ModellingSequence
from gigalens_tpu.model import ForwardProbModel
from gigalens_tpu.prob import Prior
from gigalens_tpu.prob import distributions as gld
from gigalens_tpu.profiles.light.sersic import SersicEllipse
from gigalens_tpu.profiles.mass import NFW_ELLIPSE, Hernquist, Multipole, Shear
from gigalens_tpu.simulator import LensSimulator
from gigalens_tpu.utils import effective_sample_size, potential_scale_reduction

quick = args.quick
num_pix = 48 if quick else 64

prior = Prior(
    dict(
        lens_mass=[
            # stellar component: Hernquist sphere at the light's center
            dict(
                sigma0=gld.LogNormal(jnp.log(0.6), 0.3),
                Rs=gld.LogNormal(jnp.log(0.8), 0.2),
                center_x=gld.Normal(0, 0.05),
                center_y=gld.Normal(0, 0.05),
            ),
            # dark halo: elliptical NFW
            dict(
                Rs=gld.LogNormal(jnp.log(3.0), 0.2),
                alpha_Rs=gld.LogNormal(jnp.log(0.8), 0.3),
                e1=gld.Normal(0, 0.1),
                e2=gld.Normal(0, 0.1),
                center_x=gld.Normal(0, 0.05),
                center_y=gld.Normal(0, 0.05),
            ),
            # boxy/disky m=4 multipole
            dict(
                a_m=gld.Normal(0, 0.02),
                phi_m=gld.Normal(0, 0.5),
                center_x=gld.Normal(0, 0.05),
                center_y=gld.Normal(0, 0.05),
            ),
            dict(gamma1=gld.Normal(0, 0.05), gamma2=gld.Normal(0, 0.05)),
        ],
        lens_light=[
            dict(
                R_sersic=gld.LogNormal(jnp.log(0.8), 0.15),
                n_sersic=gld.Uniform(2, 6),
                e1=gld.TruncatedNormal(0, 0.1, -0.3, 0.3),
                e2=gld.TruncatedNormal(0, 0.1, -0.3, 0.3),
                center_x=gld.Normal(0, 0.05),
                center_y=gld.Normal(0, 0.05),
                Ie=gld.LogNormal(jnp.log(400.0), 0.3),
            )
        ],
        source_light=[
            dict(
                R_sersic=gld.LogNormal(jnp.log(0.25), 0.15),
                n_sersic=gld.Uniform(0.5, 4),
                e1=gld.TruncatedNormal(0, 0.15, -0.5, 0.5),
                e2=gld.TruncatedNormal(0, 0.15, -0.5, 0.5),
                center_x=gld.Normal(0, 0.2),
                center_y=gld.Normal(0, 0.2),
                Ie=gld.LogNormal(jnp.log(150.0), 0.5),
            )
        ],
    )
)

phys = PhysicalModel(
    [Hernquist(), NFW_ELLIPSE(), Multipole(m=4), Shear()],
    [SersicEllipse()],
    [SersicEllipse()],
)
g = np.exp(-((np.arange(13) - 6) ** 2 + (np.arange(13)[:, None] - 6) ** 2) / 6.0)
cfg = SimulatorConfig(
    delta_pix=0.08, num_pix=num_pix, supersample=2,
    kernel=(g / g.sum()).astype(np.float32),
)

truth = prior.sample(jax.random.PRNGKey(3), 1)
sim1 = LensSimulator(phys, cfg, bs=1)
timg = np.asarray(jax.jit(sim1.simulate)(truth))
rng = np.random.default_rng(0)
bkg, exp_time = 0.2, 100.0
obs = timg + rng.normal(size=timg.shape).astype(np.float32) * np.sqrt(
    bkg**2 + np.clip(timg, 0, None) / exp_time
)

pm = ForwardProbModel(prior, obs, background_rms=bkg, exp_time=exp_time)
seq = ModellingSequence(phys, pm, cfg)

map_n, map_steps = (64, 120) if quick else (256, 250)
vi_n, vi_steps = (32, 120) if quick else (200, 300)
hmc_n, burnin, results = (8, 40, 80) if quick else (16, 150, 400)

t0 = time.time()
sched = optax.polynomial_schedule(-1e-2, -1e-2 / 3, 0.5, map_steps)
opt = optax.chain(optax.scale_by_adam(), optax.scale_by_schedule(sched))
z_map = seq.MAP(opt, n_samples=map_n, num_steps=map_steps, seed=0)
best = seq.best_map_start(z_map)
sim_b = LensSimulator(phys, cfg, bs=z_map.shape[0])
_, chi2 = jax.jit(lambda z: pm.log_prob(sim_b, z))(z_map)
print(f"MAP {time.time()-t0:.1f}s best red-chi2 {float(jnp.nanmin(chi2)):.3f}",
      flush=True)

t0 = time.time()
L0 = seq.laplace_scale_tril(best)
sched = optax.polynomial_schedule(-1e-6, -3e-3, 2, max(vi_steps // 5, 1))
opt = optax.chain(optax.scale_by_adam(), optax.scale_by_schedule(sched))
q_z, losses = seq.SVI(best, opt, n_vi=vi_n, num_steps=vi_steps,
                      init_scales=np.asarray(L0), seed=1)
print(f"SVI {time.time()-t0:.1f}s elbo {float(losses[0]):.1f} -> "
      f"{float(losses[-1]):.1f}", flush=True)

t0 = time.time()
res = seq.HMC(q_z, n_hmc=hmc_n, num_burnin_steps=burnin, num_results=results,
              seed=2)
ess = np.asarray(effective_sample_size(res.samples))
rhat = np.asarray(potential_scale_reduction(res.samples))
print(f"HMC {time.time()-t0:.1f}s accept "
      f"{float(np.asarray(res.accept_rate)[-50:].mean()):.2f} "
      f"min ESS {ess.min():.0f} max rhat {rhat.max():.3f}", flush=True)

# posterior recovery of the component split
summary = seq.summarize(res)
post = prior.constrain(res.samples.reshape(-1, res.samples.shape[-1]))
for name, path in [
    ("stellar sigma0", ("lens_mass", 0, "sigma0")),
    ("halo alpha_Rs", ("lens_mass", 1, "alpha_Rs")),
    ("multipole a_m", ("lens_mass", 2, "a_m")),
]:
    node_post = post[path[0]][path[1]][path[2]]
    node_true = float(np.asarray(truth[path[0]][path[1]][path[2]])[0])
    print(f"{name}: true {node_true:.4f}  posterior "
          f"{float(np.mean(np.asarray(node_post))):.4f} +- "
          f"{float(np.std(np.asarray(node_post))):.4f}", flush=True)

sim_p = LensSimulator(phys, cfg, bs=res.samples.shape[1])
_, chi2_post = jax.jit(lambda z: pm.log_prob(sim_p, z))(res.samples[-1])
print(f"posterior mean red-chi2 {float(jnp.mean(chi2_post)):.4f}", flush=True)
print("COMPOSITE DEMO OK", flush=True)
