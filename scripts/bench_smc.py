"""SMC benchmark on the published scene (TPU): prior -> beta=1 posterior.

Runs the adaptive-tempering SMC sampler (the cluster-lens branch's
alternative to MAP->SVI->HMC) at the reference's default scale
(1000 particles x 1 ensemble, 10-leapfrog HMC moves, 100 post-SMC steps)
on the 80x80 EPL(50)+Shear benchmark scene, reporting stages, wall-clock,
acceptance of the tempering path (final beta), and posterior quality.

    python scripts/bench_smc.py [particles]
"""
import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import dataclasses
import sys
import time

import numpy as np


def main():
    import jax

    from gigalens_tpu.utils.aot import setup_compilation_cache as _scc; _scc()
    import jax.numpy as jnp

    from __graft_entry__ import _demo_setup
    from gigalens_tpu import PhysicalModel
    from gigalens_tpu.inference import ModellingSequence
    from gigalens_tpu.model import ForwardProbModel
    from gigalens_tpu.profiles.light.sersic import SersicEllipse
    from gigalens_tpu.profiles.mass.epl import EPL
    from gigalens_tpu.profiles.mass.shear import Shear
    from gigalens_tpu.simulator import LensSimulator

    particles = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    ensembles = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    prior, _, cfg, _, _ = _demo_setup(num_pix=80, bs=16, psf_size=25)
    # adaptive series depth, same rule + bitwise-equality evidence as bench.py
    niter = int(_os.environ.get("GIGALENS_EPL_NITER", 0)) or EPL.recommended_niter(
        q_min=0.43, tol=1e-8
    )
    phys = PhysicalModel([EPL(niter), Shear()], [SersicEllipse()], [SersicEllipse()])
    psf_path = "/root/reference/src/gigalens/assets/psf.npy"
    if _os.path.exists(psf_path):
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

    # Preconditioned-move recipe (CPU-measured, BASELINE.md round-2
    # continuation): with the per-ensemble particle-covariance mass,
    # L=3 matches L=5/10 quality at ~1/3 the renders and
    # ess_threshold_ratio=0.6 cuts the stage count ~1.6x at equal
    # chi2/logZ. Env overrides keep the old configuration reachable:
    # GIGALENS_SMC_L=10 GIGALENS_SMC_THR=0.8 restores the reference-like
    # settings used for the round-1/round-2 table entries.
    L = int(_os.environ.get("GIGALENS_SMC_L", 3))
    thr = float(_os.environ.get("GIGALENS_SMC_THR", 0.6))
    t0 = time.time()
    res = seq.SMC(start=None, num_particles=particles,
                  num_ensembles=ensembles,
                  num_leapfrog_steps=L, post_sampling_steps=100,
                  ess_threshold_ratio=thr,
                  max_stage=200, seed=1, segment_stages=5,
                  progress=lambda st, b: print(f"  stage {st} beta {b:.4f} t={time.time()-t0:.0f}s", flush=True))
    jax.block_until_ready(res.particles)
    dt = time.time() - t0

    n_tot = particles * ensembles
    z = res.particles.reshape(n_tot, -1)
    sim_b = LensSimulator(phys, dataclasses.replace(cfg), bs=n_tot)
    _, chi2 = jax.jit(lambda zz: pm.log_prob(sim_b, zz))(z)
    chi2 = np.asarray(chi2)
    print(
        f"SMC: {dt:.1f}s  particles={particles}x{ensembles} stages={int(res.num_stages)} "
        f"final beta={float(res.final_beta[0]):.3f} "
        f"L={L} thr={thr} "
        f"posterior chi2 mean {np.nanmean(chi2):.4f} "
        f"(finite {np.isfinite(chi2).mean():.3f}) "
        f"logZ {np.asarray(res.log_evidence).ravel()}",
        flush=True,
    )
    # posterior spread sanity: truth recovery of theta_E
    p = seq.prob_model.prior.constrain(z)
    te = np.asarray(p["lens_mass"][0]["theta_E"]).ravel()
    te_true = float(np.asarray(truth["lens_mass"][0]["theta_E"])[0])
    print(f"theta_E: true {te_true:.4f}  posterior {te.mean():.4f} "
          f"+- {te.std():.4f}", flush=True)


if __name__ == "__main__":
    main()
