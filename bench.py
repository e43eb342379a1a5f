"""Headline benchmark: full MAP -> SVI -> HMC pipeline wall-clock.

Scene = the reference's demo/benchmark configuration at the driver-specified
size (BASELINE.json): EPL(niter=50)+Shear lens, SersicEllipse lens light +
source, 80x80 px @ 0.065"/px, supersample=2, HST F140W PSF when available
(falls back to a Gaussian), background_rms=0.2, exp_time=100. Phase configs
follow the published GIGA-Lens workload: MAP 500 samples x 350 steps, SVI
n_vi=1000 x 1500 steps, HMC 50 chains x (250 burn-in + 750 results).

Prints ONE JSON line:
  {"metric": "map_svi_hmc_wallclock", "value": <s>, "unit": "s",
   "vs_baseline": <ratio or null>, ...extras}

``vs_baseline`` is published-A100-seconds / ours when GIGALENS_BASELINE_S is
set (the in-repo reference publishes no numbers — BASELINE.md); null otherwise.
Scale down with GIGALENS_BENCH_SCALE=tiny|small for smoke testing.
"""
import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    # Persistent XLA compilation cache: axon remote compiles take minutes per
    # program; cached executables make reruns reflect steady-state cost.
    cache_dir = os.environ.get("GIGALENS_JAX_CACHE", "/root/repo/.jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # older jax without the flags
        log(f"compilation cache unavailable: {e}")

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
    from gigalens_tpu.simulator import LensSimulator
    from gigalens_tpu.utils import effective_sample_size, potential_scale_reduction

    scale = os.environ.get("GIGALENS_BENCH_SCALE", "full")
    cfgs = {
        "tiny": dict(num_pix=40, map_n=32, map_steps=30, vi_n=32, vi_steps=30,
                     hmc_n=8, burnin=20, results=30),
        "small": dict(num_pix=80, map_n=100, map_steps=100, vi_n=100, vi_steps=150,
                      hmc_n=16, burnin=50, results=100),
        "full": dict(num_pix=80, map_n=500, map_steps=350, vi_n=1000, vi_steps=1500,
                     hmc_n=50, burnin=250, results=750),
    }[scale]

    log(f"devices: {jax.devices()}  scale={scale}")

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

    psf_path = "/root/reference/src/gigalens/assets/psf.npy"
    if os.path.exists(psf_path):
        psf = np.load(psf_path).astype(np.float32)
        log(f"using HST PSF {psf.shape}")
    else:
        g = np.exp(-((np.arange(25) - 12) ** 2 + (np.arange(25)[:, None] - 12) ** 2) / 8.0)
        psf = (g / g.sum()).astype(np.float32)

    phys = PhysicalModel([EPL(50), Shear()], [SersicEllipse()], [SersicEllipse()])
    sim_config = SimulatorConfig(
        delta_pix=0.065, num_pix=cfgs["num_pix"], supersample=2, kernel=psf
    )

    # synthetic observation from a known truth (jit: eager ops can hit
    # unimplemented paths on the axon TPU backend)
    truth = prior.sample(jax.random.PRNGKey(42), 1)
    sim1 = LensSimulator(phys, sim_config, bs=1)
    truth_img = np.asarray(jax.jit(sim1.simulate)(truth))
    rng = np.random.default_rng(1)
    bkg, exp_time = 0.2, 100.0
    obs = truth_img + rng.normal(size=truth_img.shape).astype(np.float32) * np.sqrt(
        bkg**2 + np.clip(truth_img, 0, None) / exp_time
    )

    prob_model = ForwardProbModel(prior, obs, background_rms=bkg, exp_time=exp_time)
    seq = ModellingSequence(phys, prob_model, sim_config)

    t_start = time.time()

    # ---- MAP ----------------------------------------------------------
    t0 = time.time()
    schedule = optax.polynomial_schedule(-1e-2, -1e-2 / 3, 0.5, cfgs["map_steps"])
    opt = optax.chain(optax.scale_by_adam(), optax.scale_by_schedule(schedule))
    # segment long scans: the axon tunnel kills single device executions that
    # run for more than a few minutes
    z_map = seq.MAP(opt, n_samples=cfgs["map_n"], num_steps=cfgs["map_steps"],
                    seed=0, segment_steps=max(cfgs["map_steps"] // 2, 1))
    jax.block_until_ready(z_map)
    t_map = time.time() - t0
    sim_b = LensSimulator(phys, sim_config, bs=z_map.shape[0])
    lps, chi2 = jax.jit(lambda z: prob_model.log_prob(sim_b, z))(z_map)
    best_chi2 = float(jnp.nanmin(chi2))
    log(f"MAP: {t_map:.1f}s best red-chi2 {best_chi2:.3f}")

    # ---- SVI ----------------------------------------------------------
    t0 = time.time()
    best = z_map[jnp.argmax(lps)][None, :]
    schedule = optax.polynomial_schedule(-1e-6, -3e-3, 2, max(cfgs["vi_steps"] // 5, 1))
    opt = optax.chain(optax.scale_by_adam(), optax.scale_by_schedule(schedule))
    q_z, losses = seq.SVI(best, opt, n_vi=cfgs["vi_n"], num_steps=cfgs["vi_steps"],
                          seed=1, segment_steps=max(cfgs["vi_steps"] // 10, 1))
    jax.block_until_ready(losses)
    t_svi = time.time() - t0
    log(f"SVI: {t_svi:.1f}s elbo {float(losses[0]):.1f} -> {float(losses[-1]):.1f}")

    # ---- HMC ----------------------------------------------------------
    t0 = time.time()
    res = seq.HMC(
        q_z, n_hmc=cfgs["hmc_n"],
        num_burnin_steps=cfgs["burnin"], num_results=cfgs["results"], seed=2,
        segment_steps=max((cfgs["burnin"] + cfgs["results"]) // 4, 1),
    )
    jax.block_until_ready(res.samples)
    t_hmc = time.time() - t0

    ess = np.asarray(effective_sample_size(res.samples))
    rhat = np.asarray(potential_scale_reduction(res.samples))
    accept = float(np.asarray(res.accept_rate)[-100:].mean())
    log(
        f"HMC: {t_hmc:.1f}s accept {accept:.2f} eps {float(res.step_size):.4f} "
        f"min ESS {ess.min():.0f} max rhat {rhat.max():.3f}"
    )

    total = time.time() - t_start
    sim_p = LensSimulator(phys, sim_config, bs=res.samples.shape[1])
    _, chi2_post = jax.jit(lambda z: prob_model.log_prob(sim_p, z))(res.samples[-1])
    post_chi2 = float(jnp.mean(chi2_post))
    log(f"posterior mean red-chi2 {post_chi2:.3f}")

    baseline_s = os.environ.get("GIGALENS_BASELINE_S")
    vs = float(baseline_s) / total if baseline_s else None

    print(json.dumps({
        "metric": "map_svi_hmc_wallclock",
        "value": round(total, 2),
        "unit": "s",
        "vs_baseline": vs,
        "phase_s": {"map": round(t_map, 2), "svi": round(t_svi, 2), "hmc": round(t_hmc, 2)},
        "ess_per_sec": round(float(ess.min()) / t_hmc, 2),
        "min_ess": round(float(ess.min()), 1),
        "max_rhat": round(float(rhat.max()), 4),
        "best_map_red_chi2": round(best_chi2, 4),
        "posterior_red_chi2": round(post_chi2, 4),
        "accept_rate": round(accept, 3),
        "scale": scale,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
