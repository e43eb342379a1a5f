"""Cluster-scale demo: NFW halo + scaled dPIE members + shapelet source.

The BASELINE.json config #5 scene ("Cluster-scale: NFW halo + multiple
members + shapelet source, supersampled render + PSF"), demonstrating the
cluster machinery end-to-end: a smooth halo, a luminosity-scaled member
population (direct or Taylor-series accelerated), multiple-image position
likelihood, and a short MAP fit.

Usage: python examples/demo_cluster.py [--cpu] [--series]
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
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--series", action="store_true",
                    help="use the jet Taylor-series member stack")
parser.add_argument("--galaxies", type=int, default=20)
parser.add_argument("--full", action="store_true",
                    help="run the full MAP -> SVI -> HMC pipeline (longer)")
parser.add_argument("--burnin", type=int, default=500,
                    help="HMC burn-in steps for --full (cluster posteriors "
                    "mix slower than galaxy-scale ones; 250 is often short)")
parser.add_argument("--smc", action="store_true",
                    help="sample with tempered SMC (positions as the "
                    "auxiliary likelihood) instead of SVI->HMC; the robust "
                    "choice for multimodal cluster posteriors, and the "
                    "workflow the reference's cluster branch added SMC for")
parser.add_argument("--particles", type=int, default=512)
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
from gigalens_tpu.profiles.light.shapelets import Shapelets
from gigalens_tpu.profiles.mass.dpie_subhalo import DPIESubhalo, DPIESubhaloSeries
from gigalens_tpu.profiles.mass.nfw import NFW_ELLIPSE
from gigalens_tpu.simulator import LensSimulator

rng = np.random.default_rng(0)
G = args.galaxies
catalogue = dict(
    lum=rng.uniform(0.3, 3.0, G).astype(np.float32),
    center_x=rng.normal(0, 8.0, G).astype(np.float32),
    center_y=rng.normal(0, 8.0, G).astype(np.float32),
    e1=rng.uniform(-0.2, 0.2, G).astype(np.float32),
    e2=rng.uniform(-0.2, 0.2, G).astype(np.float32),
)

if args.series:
    members = DPIESubhaloSeries(lum_star=1.0, galaxy_catalogue=catalogue, order=3)
else:
    members = DPIESubhalo(lum_star=1.0, galaxy_catalogue=catalogue,
                          chunk_size=min(G, 16))

n_max = 4
shapelet = Shapelets(n_max=n_max)
phys_model = PhysicalModel([NFW_ELLIPSE(), members], [], [shapelet])

# priors: halo + member scalings + shapelet amplitudes
amp_priors = {a: gld.Normal(0, 5.0) for a in shapelet._amp_names}
if args.series:
    member_prior = dict(theta_E=gld.LogNormal(np.log(0.3), 0.3),
                        r_cut=gld.LogNormal(np.log(1.5), 0.2))
else:
    member_prior = dict(theta_E=gld.LogNormal(np.log(0.3), 0.3),
                        r_core=gld.LogNormal(np.log(0.08), 0.2),
                        r_cut=gld.LogNormal(np.log(1.5), 0.2))
prior = Prior(dict(
    lens_mass=[
        dict(Rs=gld.LogNormal(np.log(10.0), 0.2),
             alpha_Rs=gld.LogNormal(np.log(4.0), 0.3),
             e1=gld.Normal(0, 0.1), e2=gld.Normal(0, 0.1),
             center_x=gld.Normal(0, 0.5), center_y=gld.Normal(0, 0.5)),
        member_prior,
    ],
    source_light=[dict(beta=gld.LogNormal(np.log(0.4), 0.2),
                       center_x=gld.Normal(0, 0.3), center_y=gld.Normal(0, 0.3),
                       **amp_priors)],
))

g = np.exp(-((np.arange(9) - 4) ** 2 + (np.arange(9)[:, None] - 4) ** 2) / 4.0)
psf = (g / g.sum()).astype(np.float32)
sim_config = SimulatorConfig(delta_pix=0.2, num_pix=48, supersample=2, kernel=psf)

if args.series:
    # precompute Taylor coefficients at the prior-mean expansion point
    sim_probe = LensSimulator(phys_model, sim_config, bs=1)
    members.set_constants(dict(r_cut=1.5, r_core=0.08))
    members.set_grid(sim_probe.img_x, sim_probe.img_y)
    t0 = time.time()
    members.set_deriv()
    jax.block_until_ready(members._deriv_coefs)
    print(f"series precompute: {time.time()-t0:.1f}s "
          f"(coefs {members._deriv_coefs.shape})")

truth = prior.sample(jax.random.PRNGKey(5), 1)
sim1 = LensSimulator(phys_model, sim_config, bs=1)
truth_img = np.asarray(jax.jit(sim1.simulate)(truth))
bkg, exp_time = 0.1, 500.0
obs = truth_img + rng.normal(size=truth_img.shape).astype(np.float32) * np.sqrt(
    bkg**2 + np.clip(truth_img, 0, None) / exp_time
)

# multiple-image positions of the TRUE source center, found by ray-tracing
# the truth lens over the image grid and keeping local minima of the
# source-plane distance (the images of the lens equation). Using positions
# consistent with the pixel data is essential: arbitrary points make the
# position likelihood contradict the pixel likelihood and the joint
# posterior multimodal (measured: HMC split-R-hat ~3 with fixed synthetic
# points vs ~1 with traced images on this scene).
from gigalens_tpu.utils import find_images

src_cx = float(np.asarray(truth["source_light"][0]["center_x"])[0])
src_cy = float(np.asarray(truth["source_light"][0]["center_y"])[0])
# grid-scan candidates Newton-refined on the lens equation (the shared
# utility; only machine-accurate images are consistent with the position
# likelihood's magnification-scaled errors)
img_pos_x, img_pos_y, _ = find_images(
    sim1, truth["lens_mass"], src_cx, src_cy, search_window=4.0
)
print(f"traced {len(img_pos_x)} multiple images of the true source "
      "(Newton-refined to <1e-4\" src-plane residual): "
      + ", ".join(f"({px:+.2f},{py:+.2f})" for px, py in zip(img_pos_x, img_pos_y)))

if len(img_pos_x) >= 2:
    prob_model = ForwardProbModel(
        prior, obs, background_rms=bkg, exp_time=exp_time,
        centroids_x=[img_pos_x],
        centroids_y=[img_pos_y],
        centroids_errors_x=[np.full(len(img_pos_x), 0.1, np.float32)],
        centroids_errors_y=[np.full(len(img_pos_y), 0.1, np.float32)],
    )
else:  # singly-imaged truth: the position term carries no information
    prob_model = ForwardProbModel(
        prior, obs, background_rms=bkg, exp_time=exp_time
    )
seq = ModellingSequence(phys_model, prob_model, sim_config)

t0 = time.time()
n_map, s_map = (128, 400) if args.full else (32, 150)
sched = optax.polynomial_schedule(-1e-2, -1e-2 / 3, 0.5, s_map)
opt = optax.chain(optax.scale_by_adam(), optax.scale_by_schedule(sched))
z_map = seq.MAP(opt, n_samples=n_map, num_steps=s_map, seed=0,
                segment_steps=max(s_map // 2, 1))
sim_b = LensSimulator(phys_model, sim_config, bs=n_map)
lps, chi2 = jax.jit(lambda z: prob_model.log_prob(sim_b, z))(z_map)
print(f"cluster MAP ({'series' if args.series else 'direct'}, G={G}): "
      f"{time.time()-t0:.1f}s best red-chi2 {float(jnp.nanmin(chi2)):.3f}")

if args.smc:
    # ---- tempered SMC: prior -> posterior through the pixel likelihood,
    # with the multiple-image position term as the auxiliary (always-on)
    # likelihood — the reference cluster branch's sampling workflow.
    # Combined-likelihood tempering + MAP starts: with positions as the
    # always-on AUXILIARY (the reference's menu), a particle near a critical
    # curve carries a position log-likelihood of ~ -1e9 (magnification-
    # scaled errors), its (like - aux) increment is hugely POSITIVE, and the
    # ensemble collapses onto it at the first reweight (measured: beta crawls
    # at ~1e-4/stage then clone-jumps to 1 with posterior chi2 ~ 2600).
    # Annealing pixels+positions together makes such particles harmless
    # (weight -> 0) — see inference/smc.py::_stats.
    t0 = time.time()
    has_pos = getattr(prob_model, "include_positions", False)
    res = seq.SMC(
        start=z_map, num_particles=args.particles, num_ensembles=1,
        num_leapfrog_steps=10, post_sampling_steps=100, max_stage=200,
        target="pixels+positions" if has_pos else "pixels", auxiliar="none",
        seed=1, segment_stages=5,
        progress=lambda st, b: print(f"  stage {st} beta {b:.4f} "
                                     f"t={time.time()-t0:.0f}s", flush=True),
    )
    jax.block_until_ready(res.particles)
    pts = res.particles.reshape(-1, res.particles.shape[-1])
    sim_p = LensSimulator(phys_model, sim_config, bs=pts.shape[0])
    _, chi2_post = jax.jit(lambda z: prob_model.log_prob(sim_p, z))(pts)
    print(f"cluster SMC: {time.time()-t0:.1f}s stages "
          f"{int(res.num_stages)} final beta {float(res.final_beta.min()):.3f} "
          f"posterior red-chi2 {float(jnp.mean(chi2_post)):.3f}")

if args.full:
    # ---- SVI (Laplace-seeded) -> HMC, as in the galaxy-scale pipeline ----
    from gigalens_tpu.utils import effective_sample_size, potential_scale_reduction

    t0 = time.time()
    best = seq.best_map_start(z_map)
    L0 = np.asarray(seq.laplace_scale_tril(best))
    sched = optax.polynomial_schedule(-1e-6, -3e-3, 2, 60)
    opt = optax.chain(optax.scale_by_adam(), optax.scale_by_schedule(sched))
    q_z, losses = seq.SVI(best, opt, n_vi=256, num_steps=300,
                          init_scales=L0, seed=1, segment_steps=75)
    jax.block_until_ready(losses)
    print(f"cluster SVI: {time.time()-t0:.1f}s "
          f"ELBO {float(losses[0]):.1f} -> {float(losses[-1]):.1f}")

    t0 = time.time()
    res = seq.HMC(q_z, n_hmc=50, num_burnin_steps=args.burnin, num_results=750,
                  seed=2, segment_steps=250)
    jax.block_until_ready(res.samples)
    t_hmc = time.time() - t0
    ess = np.asarray(effective_sample_size(res.samples))
    rhat = np.asarray(potential_scale_reduction(res.samples))
    sim_p = LensSimulator(phys_model, sim_config, bs=res.samples.shape[1])
    _, chi2_post = jax.jit(lambda z: prob_model.log_prob(sim_p, z))(res.samples[-1])
    print(
        f"cluster HMC: {t_hmc:.1f}s accept "
        f"{float(np.asarray(res.accept_rate)[-100:].mean()):.2f} "
        f"min ESS {ess.min():.0f} max split-R-hat {rhat.max():.4f} "
        f"posterior red-chi2 {float(jnp.mean(chi2_post)):.3f}"
    )
