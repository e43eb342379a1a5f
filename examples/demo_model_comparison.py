"""Bayesian model comparison via SMC evidence: EPL vs SIE on EPL truth.

Simulates a strongly non-isothermal lens (EPL, gamma = 2.4), then computes
the SMC log-evidence of two competing mass models — the correct EPL family
and an (isothermal) SIE — each under its own prior. The Bayes factor
decisively favors the true family: measured on CPU with the default
covariance-preconditioned moves at P=256 x 2 ensembles,
logZ_EPL = 90.7/90.5 vs logZ_SIE = 82.1/82.2 — BF +8.4 with a 0.2-nat
ensemble spread.

This is the capability `SMCResult.log_evidence` exists for; the reference
has no evidence machinery. Requires prior-initialized SMC (`start=None`).

Estimator quality notes (all measured on this problem):
- With identity-mass moves (``precondition_moves=False``) the estimator is
  both noisy and biased LOW at small P — P=128: 20-30 nat ensemble spread;
  P=256: 1-6 nats and logZ_EPL ~ 78; P=512: logZ_EPL ~ 85-89 (Jensen bias
  shrinking as weight degeneracy eases).
- The default covariance-preconditioned moves largely remove both effects:
  P=256 gives 0.2-nat spread at logZ values matching/exceeding the
  unpreconditioned P=512 run, in ~25% less wall.
- Always run >= 2 ensembles and treat their spread as the error bar; a
  |log BF| smaller than the spread is noise.

Usage:
    python examples/demo_model_comparison.py [--cpu] [--particles 256]
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
parser.add_argument("--particles", type=int, default=256)
parser.add_argument("--ensembles", type=int, default=2)
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.inference import ModellingSequence
from gigalens_tpu.model import ForwardProbModel
from gigalens_tpu.prob import Prior
from gigalens_tpu.prob import distributions as gld
from gigalens_tpu.profiles.light.sersic import SersicEllipse
from gigalens_tpu.profiles.mass.epl import EPL
from gigalens_tpu.profiles.mass.sie import SIE
from gigalens_tpu.profiles.mass.shear import Shear
from gigalens_tpu.simulator import LensSimulator


def src_prior():
    return dict(
        R_sersic=gld.LogNormal(jnp.log(0.25), 0.15),
        n_sersic=gld.Uniform(0.5, 4),
        e1=gld.TruncatedNormal(0, 0.15, -0.5, 0.5),
        e2=gld.TruncatedNormal(0, 0.15, -0.5, 0.5),
        center_x=gld.Normal(0, 0.25),
        center_y=gld.Normal(0, 0.25),
        Ie=gld.LogNormal(jnp.log(150.0), 0.5),
    )


lens_common = dict(
    theta_E=gld.LogNormal(jnp.log(1.25), 0.25),
    e1=gld.Normal(0, 0.1),
    e2=gld.Normal(0, 0.1),
    center_x=gld.Normal(0, 0.05),
    center_y=gld.Normal(0, 0.05),
)
shear_prior = dict(gamma1=gld.Normal(0, 0.05), gamma2=gld.Normal(0, 0.05))
prior_epl = Prior(
    dict(
        lens_mass=[dict(gamma=gld.TruncatedNormal(2, 0.25, 1, 3), **lens_common),
                   dict(shear_prior)],
        source_light=[src_prior()],
    )
)
prior_sie = Prior(
    dict(lens_mass=[dict(**lens_common), dict(shear_prior)],
         source_light=[src_prior()])
)
phys_epl = PhysicalModel([EPL(EPL.recommended_niter(0.43, 1e-8)), Shear()], [],
                         [SersicEllipse()])
phys_sie = PhysicalModel([SIE(), Shear()], [], [SersicEllipse()])
cfg = SimulatorConfig(delta_pix=0.065, num_pix=32, supersample=1)

# truth: strongly non-isothermal EPL
truth = prior_epl.sample(jax.random.PRNGKey(3), 1)
truth["lens_mass"][0]["gamma"] = jnp.full_like(truth["lens_mass"][0]["gamma"], 2.4)
sim1 = LensSimulator(phys_epl, cfg, bs=1)
img = np.asarray(jax.jit(sim1.simulate)(truth))
rng = np.random.default_rng(2)
bkg, exp_t = 0.2, 100.0
obs = img + rng.normal(size=img.shape).astype(np.float32) * np.sqrt(
    bkg**2 + np.clip(img, 0, None) / exp_t
)
print(f"truth: EPL gamma=2.4, {cfg.num_pix}x{cfg.num_pix} observation")

log_z = {}
for name, prior, phys in [("EPL", prior_epl, phys_epl),
                          ("SIE", prior_sie, phys_sie)]:
    pm = ForwardProbModel(prior, obs, background_rms=bkg, exp_time=exp_t)
    seq = ModellingSequence(phys, pm, cfg)
    t0 = time.time()
    res = seq.SMC(
        start=None, num_particles=args.particles, num_ensembles=args.ensembles,
        num_leapfrog_steps=5, post_sampling_steps=0, max_stage=80,
        target="pixels", auxiliar="none", seed=0,
    )
    lz = np.asarray(res.log_evidence)
    log_z[name] = lz
    print(f"{name}: stages={int(res.num_stages)} "
          f"final_beta={np.asarray(res.final_beta)} "
          f"logZ={np.round(lz, 2)} ({time.time() - t0:.0f}s)")
    if float(np.asarray(res.final_beta).min()) < 1.0:
        # a partial bridge is NOT an evidence estimate — refuse to compare
        print(f"{name}: tempering truncated at max_stage (beta < 1); "
              "log_evidence is a partial-bridge quantity. Raise max_stage.")
        _sys.exit(1)

bf = float(log_z["EPL"].mean() - log_z["SIE"].mean())
# per-ensemble spread = the estimator's error bar; a |BF| below it is noise
spread = float(max(np.ptp(log_z["EPL"]), np.ptp(log_z["SIE"])))
print(f"log Bayes factor EPL vs SIE: {bf:+.1f} nats "
      f"(ensemble spread up to {spread:.1f} nats)")
verdict = ("decisively EPL" if bf > max(5, spread) else
           "inconclusive — raise --particles" if abs(bf) <= max(5, spread)
           else "SIE (unexpected)")
print(f"verdict: {verdict}")
print("MODEL COMPARISON", "OK" if bf > max(2, spread / 2) else "UNDERPOWERED")
