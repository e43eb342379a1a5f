"""Cluster-scale FULL-POSTERIOR benchmark (BASELINE.json config #5).

Scene: NFW_ELLIPSE halo + a luminosity-scaled member population + shapelet
source, supersampled render + PSF, pixel + multiple-image-position
likelihood. Two member stacks, each run through the complete
MAP -> Laplace -> SVI -> HMC pipeline with quality gates:

  * ``sie``    — SIE members via the generic :class:`ScalingRelation`
                 (the literal config-5 wording, "multiple SIE members");
  * ``dpie``   — truncated dPIE members via :class:`DPIESubhaloSeries`
                 (the reference cluster branch's member profile,
                 ``src/gigalens/jax/profiles/mass/dpie.py`` +
                 ``scaling_relation.py:50-108``, series-accelerated —
                 the production path for big catalogues).

Gates (printed + JSON): posterior mean reduced chi2 in [0.85, 1.15],
max split-R-hat <= 1.02 (target 1.01), min ESS and ESS/s recorded.

    python scripts/bench_cluster_posterior.py [--members sie|dpie|both]
        [--galaxies 20] [--hmc 50] [--burnin 500] [--results 750] [--cpu-quick]
"""
import argparse
import json
import os as _os
import sys as _sys
import time

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--members", default="both", choices=["sie", "dpie", "both"])
parser.add_argument("--galaxies", type=int, default=20)
parser.add_argument("--hmc", type=int, default=50)
parser.add_argument("--burnin", type=int, default=500)
parser.add_argument("--results", type=int, default=750)
parser.add_argument("--seed", type=int, default=3)
parser.add_argument("--traj", default="chees", choices=["chees", "static"],
                    help="trajectory adaptation (static uses --init-l leapfrogs)")
parser.add_argument("--init-l", type=int, default=8)
parser.add_argument("--mass-windows", type=int, default=1,
                    help="Stan-style warmup covariance re-estimations")
parser.add_argument("--sampler", default="hmc", choices=["hmc", "smc"],
                    help="posterior sampler; smc is the multimodality-robust "
                         "path (tempered transitions cross the e1/src ridge "
                         "that traps individual HMC chains)")
parser.add_argument("--particles", type=int, default=1000)
parser.add_argument("--source", default="sampled", choices=["sampled", "lstsq"],
                    help="shapelet amplitudes: sampled explicitly (Forward) or "
                         "solved by weighted lstsq (Backward) - the linear "
                         "amps are the slow HMC directions when sampled")
parser.add_argument("--cpu-quick", action="store_true",
                    help="tiny CPU smoke (no gates)")
args = parser.parse_args()

import jax

if args.cpu_quick:
    jax.config.update("jax_platforms", "cpu")
from gigalens_tpu.utils.aot import setup_compilation_cache as _scc; _scc()
import jax.numpy as jnp
import optax

from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.inference import ModellingSequence
from gigalens_tpu.model import BackwardProbModel, ForwardProbModel
from gigalens_tpu.prob import Prior
from gigalens_tpu.prob import distributions as gld
from gigalens_tpu.profiles.light.shapelets import Shapelets
from gigalens_tpu.profiles.mass.dpie_subhalo import DPIESubhaloSeries
from gigalens_tpu.profiles.mass.nfw import NFW_ELLIPSE
from gigalens_tpu.profiles.mass.scaling import ScalingRelation
from gigalens_tpu.profiles.mass.sie import NIE, SIE
from gigalens_tpu.simulator import LensSimulator
from gigalens_tpu.utils import (
    effective_sample_size,
    find_images,
    potential_scale_reduction,
)


def log(msg):
    print(msg, file=_sys.stderr, flush=True)


def build_scene(kind, G, seed):
    rng = np.random.default_rng(0)
    catalogue = dict(
        lum=rng.uniform(0.3, 3.0, G).astype(np.float32),
        center_x=rng.normal(0, 6.0, G).astype(np.float32),
        center_y=rng.normal(0, 6.0, G).astype(np.float32),
        e1=rng.uniform(-0.2, 0.2, G).astype(np.float32),
        e2=rng.uniform(-0.2, 0.2, G).astype(np.float32),
    )
    if kind == "sie":
        # Faber-Jackson: sigma ~ L^(1/4); theta_E ~ sigma^2 ~ L^0.5.
        # Members carry a small fixed core (s_scale, via the NIE form of the
        # isothermal ellipsoid): 20 SINGULAR members inside the field give
        # the posterior a kappa-cusp at every member center — measured 3067
        # divergent chain-steps and R-hat 1.9 with s = 0 — while the
        # reference's own SIE declares an s_scale softening
        # (src/gigalens/jax/profiles/mass/sie.py:11) and real cluster
        # modeling uses cored members (dPIE) for exactly this reason.
        catalogue_sie = dict(catalogue, s_scale=np.full(G, 0.05, np.float32))
        members = ScalingRelation(
            NIE(), ["theta_E"], lum_star=1.0,
            scaling_params_power={"theta_E": 0.5},
            galaxy_catalogue=catalogue_sie, chunk_size=min(G, 16),
        )
        member_prior = dict(theta_E=gld.LogNormal(np.log(0.3), 0.3))
    else:
        members = DPIESubhaloSeries(
            lum_star=1.0, galaxy_catalogue=catalogue, order=3,
            chunk_size=min(G, 16),
        )
        member_prior = dict(theta_E=gld.LogNormal(np.log(0.3), 0.3),
                            r_cut=gld.LogNormal(np.log(1.5), 0.2))

    n_max = 4
    # truth is always generated from explicitly-sampled amplitudes; with
    # --source lstsq the FIT then solves the 15 linear amps by weighted
    # least squares per sample (BackwardProbModel) instead of sampling
    # them — measured on this scene: the sampled amps are exactly the
    # slow HMC directions (every rhat > 1.03 dim is an amp)
    shapelet = Shapelets(n_max=n_max)
    phys = PhysicalModel([NFW_ELLIPSE(), members], [], [shapelet])
    amp_priors = {a: gld.Normal(0, 5.0) for a in shapelet._amp_names}
    halo_prior = dict(Rs=gld.LogNormal(np.log(10.0), 0.2),
                      alpha_Rs=gld.LogNormal(np.log(4.0), 0.3),
                      e1=gld.Normal(0, 0.1), e2=gld.Normal(0, 0.1),
                      center_x=gld.Normal(0, 0.5), center_y=gld.Normal(0, 0.5))
    src_nonlin = dict(beta=gld.LogNormal(np.log(0.4), 0.2),
                      center_x=gld.Normal(0, 0.3),
                      center_y=gld.Normal(0, 0.3))
    prior = Prior(dict(
        lens_mass=[dict(halo_prior), member_prior],
        source_light=[dict(src_nonlin, **amp_priors)],
    ))

    g = np.exp(-((np.arange(9) - 4) ** 2 + (np.arange(9)[:, None] - 4) ** 2) / 4.0)
    psf = (g / g.sum()).astype(np.float32)
    num_pix = 32 if args.cpu_quick else 48
    cfg = SimulatorConfig(delta_pix=0.2, num_pix=num_pix, supersample=2,
                          kernel=psf)

    if kind == "dpie":
        # series path: precompute jet coefficients at the prior-mean point
        probe = LensSimulator(phys, cfg, bs=1)
        members.set_constants(dict(r_cut=1.5, r_core=0.08))
        members.set_grid(probe.img_x, probe.img_y)
        t0 = time.time()
        members.set_deriv()
        jax.block_until_ready(members._deriv_coefs)
        log(f"[{kind}] series precompute {time.time()-t0:.1f}s")

    truth = prior.sample(jax.random.PRNGKey(5), 1)
    sim1 = LensSimulator(phys, cfg, bs=1)
    truth_img = np.asarray(jax.jit(sim1.simulate)(truth))
    bkg, exp_time = 0.1, 500.0
    nrng = np.random.default_rng(seed)
    obs = truth_img + nrng.normal(size=truth_img.shape).astype(np.float32) * np.sqrt(
        bkg**2 + np.clip(truth_img, 0, None) / exp_time
    )

    src_cx = float(np.asarray(truth["source_light"][0]["center_x"])[0])
    src_cy = float(np.asarray(truth["source_light"][0]["center_y"])[0])
    img_x, img_y, _ = find_images(sim1, truth["lens_mass"], src_cx, src_cy,
                                  search_window=4.0)
    log(f"[{kind}] {len(img_x)} multiple images traced")
    kw = {}
    if len(img_x) >= 2:
        kw = dict(
            centroids_x=[img_x], centroids_y=[img_y],
            centroids_errors_x=[np.full(len(img_x), 0.1, np.float32)],
            centroids_errors_y=[np.full(len(img_y), 0.1, np.float32)],
        )
    if args.source == "lstsq":
        shapelet_fit = Shapelets(n_max=n_max, use_lstsq=True)
        phys = PhysicalModel([NFW_ELLIPSE(), members], [], [shapelet_fit])
        prior = Prior(dict(
            lens_mass=[dict(halo_prior), member_prior],
            source_light=[dict(src_nonlin)],
        ))
        pm = BackwardProbModel(prior, obs, background_rms=bkg, exp_time=exp_time)
    else:
        pm = ForwardProbModel(prior, obs, background_rms=bkg, exp_time=exp_time,
                              **kw)
    return phys, prior, pm, cfg, truth


def run_pipeline(kind):
    phys, prior, pm, cfg, truth = build_scene(kind, args.galaxies, args.seed)
    seq = ModellingSequence(phys, pm, cfg)
    row = dict(members=kind, galaxies=args.galaxies)

    quick = args.cpu_quick
    n_map, s_map = (16, 40) if quick else (128, 400)
    n_vi, s_vi = (16, 30) if quick else (256, 400)
    n_hmc = 8 if quick else args.hmc
    burnin = 20 if quick else args.burnin
    results = 30 if quick else args.results

    t0 = time.time()
    sched = optax.polynomial_schedule(-1e-2, -1e-2 / 3, 0.5, s_map)
    opt = optax.chain(optax.scale_by_adam(), optax.scale_by_schedule(sched))
    z_map = seq.MAP(opt, n_samples=n_map, num_steps=s_map, seed=0)
    jax.block_until_ready(z_map)
    row["t_map"] = time.time() - t0
    sim_b = LensSimulator(phys, cfg, bs=n_map)
    lps, _ = jax.jit(lambda z: pm.log_prob(sim_b, z))(z_map)
    _, chi2 = jax.jit(
        lambda z: pm.stats_pixels(sim_b, prior.constrain(z)))(z_map)
    row["map_red_chi2"] = float(jnp.nanmin(chi2))
    log(f"[{kind}] MAP {row['t_map']:.1f}s best red-chi2 {row['map_red_chi2']:.3f}")

    if args.sampler == "smc":
        q_z = None  # SMC tempers from the prior; no surrogate needed
        row["t_svi"] = 0.0
    else:
        t0 = time.time()
        best = z_map[jnp.argmax(jnp.nan_to_num(lps, nan=-jnp.inf))][None, :]
        L0 = seq.laplace_scale_tril(best)
        jax.block_until_ready(L0)
        sched = optax.polynomial_schedule(-1e-6, -3e-3, 2, max(s_vi // 5, 1))
        opt = optax.chain(optax.scale_by_adam(), optax.scale_by_schedule(sched))
        q_z, losses = seq.SVI(best, opt, n_vi=n_vi, num_steps=s_vi,
                              init_scales=np.asarray(L0), seed=1)
        jax.block_until_ready(losses)
        row["t_svi"] = time.time() - t0
        log(f"[{kind}] SVI {row['t_svi']:.1f}s elbo {float(losses[-1]):.1f}")

    t0 = time.time()
    if args.sampler == "smc":
        # tempered SMC: resampling reweights secondary modes by their actual
        # posterior mass instead of trapping whole chains in them
        sres = seq.SMC(num_particles=args.particles, num_ensembles=1,
                       num_leapfrog_steps=10, post_sampling_steps=results,
                       target="pixels", auxiliar="none", seed=args.seed,
                       segment_stages=1)
        jax.block_until_ready(sres.post_samples)
        row["t_hmc"] = time.time() - t0
        row["smc_stages"] = int(np.asarray(sres.num_stages))
        row["log_evidence"] = float(np.asarray(sres.log_evidence)[0])

        class _Res:  # adapt to the HMC-shaped reporting below
            samples = sres.post_samples
            accept_rate = jnp.ones((1,))
            divergences = jnp.zeros((), jnp.int32)
            total_leapfrogs = jnp.zeros((), jnp.int32)

        res = _Res()
    else:
        # segmented dispatches: a monolithic 1250-step chain scan can exceed
        # the axon tunnel's per-dispatch execution cap (round-4 crash root
        # cause, BASELINE.md); 250-step segments are measured overhead-free
        res = seq.HMC(q_z, n_hmc=n_hmc, num_burnin_steps=burnin,
                      num_results=results, seed=args.seed, segment_steps=250,
                      trajectory_adaptation=args.traj, init_l=args.init_l,
                      mass_adaptation=args.mass_windows)
        jax.block_until_ready(res.samples)
        row["t_hmc"] = time.time() - t0

    if _os.environ.get("GIGALENS_CLUSTER_DUMP"):
        np.save(_os.environ["GIGALENS_CLUSTER_DUMP"] + f"_{kind}.npy",
                np.asarray(res.samples))
    ess = np.asarray(effective_sample_size(res.samples))
    rhat = np.asarray(potential_scale_reduction(res.samples))
    row.update(
        min_ess=float(ess.min()), max_rhat=float(rhat.max()),
        ess_per_sec=float(ess.min()) / row["t_hmc"],
        accept=float(np.asarray(res.accept_rate)[-100:].mean()),
        divergent_chain_steps=int(np.asarray(res.divergences).sum()),
        leapfrogs=int(res.total_leapfrogs),
    )
    sim_p = LensSimulator(phys, cfg, bs=res.samples.shape[1])
    # gate on the PIXEL reduced chi2: log_prob's red_chi2 averages the
    # pixel term with the n_img-point position term (whose ~0 value over 2
    # points is statistically meaningless and halves the mean)
    _, chi2_post = jax.jit(
        lambda z: pm.stats_pixels(sim_p, prior.constrain(z)))(res.samples[-1])
    row["posterior_red_chi2"] = float(jnp.mean(chi2_post))
    row["total_s"] = row["t_map"] + row["t_svi"] + row["t_hmc"]

    # truth recovery on the two global member-scaling parameters
    x_post = prior.constrain(res.samples.reshape(-1, res.samples.shape[-1]))
    te_post = np.asarray(x_post["lens_mass"][1]["theta_E"])
    te_true = float(np.asarray(truth["lens_mass"][1]["theta_E"])[0])
    row["theta_E_star"] = dict(
        true=te_true, mean=float(te_post.mean()), std=float(te_post.std())
    )

    gates = dict(
        chi2_ok=0.85 <= row["posterior_red_chi2"] <= 1.15,
        rhat_ok=row["max_rhat"] <= 1.02,
    )
    row["gates"] = gates
    log(f"[{kind}] HMC {row['t_hmc']:.1f}s minESS {row['min_ess']:.0f} "
        f"maxRhat {row['max_rhat']:.3f} post-chi2 "
        f"{row['posterior_red_chi2']:.3f} gates {gates}")
    return row


def main():
    kinds = ["sie", "dpie"] if args.members == "both" else [args.members]
    rows = [run_pipeline(k) for k in kinds]
    out = {
        "metric": "cluster_full_posterior",
        "unit": "s",
        "value": round(float(np.median([r["total_s"] for r in rows])), 2),
        "device": str(jax.devices()[0]),
        "runs": rows,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
