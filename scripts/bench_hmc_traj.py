"""HMC trajectory-budget experiment on the benchmark scene (TPU).

Runs MAP+SVI once (published workload), then the published HMC workload
(50 chains x 250+750) at several ``max_leapfrog_steps`` caps, reporting
wall-clock, min ESS, ESS/sec, max split-R-hat, and the adapted step size /
trajectory. ChEES maximizes ESS per iteration; capping the trajectory trades
ESS for proportionally fewer gradients — this measures where ESS/sec peaks.

    python scripts/bench_hmc_traj.py [caps ...]   # default: 30 16 10
"""
import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _demo_setup
    from gigalens_tpu.inference import ModellingSequence
    from gigalens_tpu.model import ForwardProbModel
    from gigalens_tpu.simulator import LensSimulator
    from gigalens_tpu.utils import effective_sample_size, potential_scale_reduction

    caps = [int(a) for a in sys.argv[1:]] or [30, 16, 10]

    # benchmark scene with the HST PSF when present
    prior, phys, cfg, _, _ = _demo_setup(num_pix=80, bs=16, psf_size=25)
    psf_path = "/root/reference/src/gigalens/assets/psf.npy"
    if _os.path.exists(psf_path):
        import dataclasses

        cfg = dataclasses.replace(cfg, kernel=np.load(psf_path).astype(np.float32))

    truth = prior.sample(jax.random.PRNGKey(42), 1)
    sim1 = LensSimulator(phys, cfg, bs=1)
    timg = np.asarray(jax.jit(sim1.simulate)(truth))
    rng = np.random.default_rng(1)
    obs = timg + rng.normal(size=timg.shape).astype(np.float32) * np.sqrt(
        0.2**2 + np.clip(timg, 0, None) / 100.0
    )
    pm = ForwardProbModel(prior, obs, background_rms=0.2, exp_time=100.0)
    seq = ModellingSequence(phys, pm, cfg)

    t0 = time.time()
    sched = optax.polynomial_schedule(-1e-2, -1e-2 / 3, 0.5, 350)
    opt = optax.chain(optax.scale_by_adam(), optax.scale_by_schedule(sched))
    z = seq.MAP(opt, n_samples=500, num_steps=350, seed=0, segment_steps=175)
    best = seq.best_map_start(z)
    sched = optax.polynomial_schedule(-1e-6, -3e-3, 2, 300)
    opt = optax.chain(optax.scale_by_adam(), optax.scale_by_schedule(sched))
    q_z, losses = seq.SVI(best, opt, n_vi=1000, num_steps=1500, seed=1,
                          segment_steps=150)
    jax.block_until_ready(losses)
    print(f"MAP+SVI: {time.time()-t0:.1f}s  elbo {float(losses[-1]):.1f}",
          flush=True)

    for cap in caps:
        t0 = time.time()
        res = seq.HMC(q_z, n_hmc=50, num_burnin_steps=250, num_results=750,
                      max_leapfrog_steps=cap, seed=2, segment_steps=250)
        jax.block_until_ready(res.samples)
        dt = time.time() - t0
        ess = np.asarray(effective_sample_size(res.samples))
        rhat = np.asarray(potential_scale_reduction(res.samples))
        acc = float(np.asarray(res.accept_rate)[-100:].mean())
        print(
            f"cap={cap:3d}: {dt:6.1f}s  accept {acc:.2f} "
            f"eps {float(res.step_size):.4f} traj {float(res.trajectory_length):.4f} "
            f"min ESS {ess.min():7.0f}  ESS/s {ess.min()/dt:6.1f}  "
            f"max rhat {rhat.max():.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
