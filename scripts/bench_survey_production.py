"""Survey mode at production settings (round-3 ask #8 / round-5 task 6).

S >= 4 scenes with DISTINCT per-scene PSFs (rotated/width-varied HST
F140W), 60x60 @ 0.065"/px supersample 2, scene-batched MAP -> per-scene
Laplace+SVI -> grouped HMC (one device program per phase; per-scene PSF
spectra ride the stacked-kernel path of :class:`gigalens_tpu.ops.psf.PSFConv`).

Gates (printed + JSON): every scene's posterior-mean reduced chi2 in
[0.85, 1.15]; every scene's max split-R-hat <= 1.02.

    python scripts/bench_survey_production.py [--scenes 4] [--cpu-quick]
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
parser.add_argument("--scenes", type=int, default=4)
parser.add_argument("--hmc", type=int, default=16)
parser.add_argument("--burnin", type=int, default=200)
parser.add_argument("--results", type=int, default=500)
parser.add_argument("--traj", default="static", choices=["chees", "static"],
                    help="static avoids the measured ChEES trajectory "
                         "collapse at small per-scene chain counts")
parser.add_argument("--init-l", type=int, default=10)
parser.add_argument("--cpu-quick", action="store_true")
args = parser.parse_args()

import jax

if args.cpu_quick:
    jax.config.update("jax_platforms", "cpu")
from gigalens_tpu.utils.aot import setup_compilation_cache as _scc; _scc()
import jax.numpy as jnp
import optax

from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.inference import SurveySequence
from gigalens_tpu.model import SurveyForwardProbModel
from gigalens_tpu.prob import Prior
from gigalens_tpu.prob import distributions as gld
from gigalens_tpu.profiles.light.sersic import SersicEllipse
from gigalens_tpu.profiles.mass.epl import EPL
from gigalens_tpu.profiles.mass.shear import Shear
from gigalens_tpu.simulator import LensSimulator
from gigalens_tpu.utils import effective_sample_size, potential_scale_reduction


def log(msg):
    print(msg, file=_sys.stderr, flush=True)


def make_psfs(S):
    """Distinct per-scene PSFs: the HST F140W kernel rotated k*90deg and
    width-varied by light Gaussian smoothing (real survey cutouts each have
    their own star-derived PSF)."""
    base_path = "/root/reference/src/gigalens/assets/psf.npy"
    if _os.path.exists(base_path):
        base = np.load(base_path).astype(np.float32)
    else:
        g = np.exp(-((np.arange(13) - 6) ** 2 + (np.arange(13)[:, None] - 6) ** 2) / 5.0)
        base = (g / g.sum()).astype(np.float32)
    out = []
    for s in range(S):
        k = np.rot90(base, k=s % 4).copy()
        sig = 0.5 + 0.35 * s  # scene-dependent extra seeing
        xx = np.arange(-3, 4)
        g1 = np.exp(-(xx**2) / (2 * sig**2))
        g1 /= g1.sum()
        k = np.apply_along_axis(lambda r: np.convolve(r, g1, mode="same"), 0, k)
        k = np.apply_along_axis(lambda r: np.convolve(r, g1, mode="same"), 1, k)
        out.append((k / k.sum()).astype(np.float32))
    return np.stack(out)


S = args.scenes
prior = Prior(dict(
    lens_mass=[
        dict(theta_E=gld.LogNormal(jnp.log(1.25), 0.25),
             gamma=gld.TruncatedNormal(2, 0.25, 1, 3),
             e1=gld.Normal(0, 0.1), e2=gld.Normal(0, 0.1),
             center_x=gld.Normal(0, 0.05), center_y=gld.Normal(0, 0.05)),
        dict(gamma1=gld.Normal(0, 0.05), gamma2=gld.Normal(0, 0.05)),
    ],
    lens_light=[
        dict(R_sersic=gld.LogNormal(jnp.log(1.0), 0.15), n_sersic=gld.Uniform(2, 6),
             e1=gld.TruncatedNormal(0, 0.1, -0.3, 0.3),
             e2=gld.TruncatedNormal(0, 0.1, -0.3, 0.3),
             center_x=gld.Normal(0, 0.05), center_y=gld.Normal(0, 0.05),
             Ie=gld.LogNormal(jnp.log(500.0), 0.3))],
    source_light=[
        dict(R_sersic=gld.LogNormal(jnp.log(0.25), 0.15),
             n_sersic=gld.Uniform(0.5, 4),
             e1=gld.TruncatedNormal(0, 0.15, -0.5, 0.5),
             e2=gld.TruncatedNormal(0, 0.15, -0.5, 0.5),
             center_x=gld.Normal(0, 0.25), center_y=gld.Normal(0, 0.25),
             Ie=gld.LogNormal(jnp.log(150.0), 0.5))],
))

if args.cpu_quick:
    num_pix, ss = 24, 1
    map_n, map_steps = 8, 40
    vi_n, vi_steps = 8, 30
    n_hmc, burnin, results = 4, 20, 40
else:
    num_pix, ss = 60, 2
    map_n, map_steps = 64, 350
    vi_n, vi_steps = 256, 400
    n_hmc, burnin, results = args.hmc, args.burnin, args.results

psfs = make_psfs(S)
niter = EPL.recommended_niter(q_min=0.43, tol=1e-8)
phys = PhysicalModel([EPL(niter), Shear()], [SersicEllipse()], [SersicEllipse()])
cfg = SimulatorConfig(delta_pix=0.065, num_pix=num_pix, supersample=ss,
                      kernel=psfs)

truths = prior.sample(jax.random.PRNGKey(42), S)
sim_s = LensSimulator(phys, cfg, bs=S)
truth_imgs = np.asarray(jax.jit(sim_s.simulate)(truths))
rng = np.random.default_rng(1)
bkg, exp_time = 0.2, 100.0
obs = truth_imgs + rng.normal(size=truth_imgs.shape).astype(np.float32) * np.sqrt(
    bkg**2 + np.clip(truth_imgs, 0, None) / exp_time)
log(f"catalogue: {S} scenes {num_pix}px ss{ss}, distinct PSFs {psfs.shape}")

spm = SurveyForwardProbModel(prior, obs, background_rms=bkg, exp_time=exp_time)
seq = SurveySequence(phys, spm, cfg)

t0 = time.time()
sched = optax.polynomial_schedule(-1e-2, -1e-2 / 3, 0.5, map_steps)
opt = optax.chain(optax.scale_by_adam(), optax.scale_by_schedule(sched))
z = seq.MAP(opt, n_starts=map_n, num_steps=map_steps, seed=0)
best = seq.best_per_scene(z)
jax.block_until_ready(best)
t_map = time.time() - t0
log(f"MAP {t_map:.1f}s")

t0 = time.time()
L0 = seq.laplace_scale_trils(best)
sched = optax.polynomial_schedule(-1e-6, -3e-3, 2, max(vi_steps // 5, 1))
opt2 = optax.chain(optax.scale_by_adam(), optax.scale_by_schedule(sched))
means, trils, losses = seq.SVI(best, opt2, n_vi=vi_n, num_steps=vi_steps,
                               init_scales=L0, seed=1)
jax.block_until_ready(losses)
t_svi = time.time() - t0
log(f"SVI {t_svi:.1f}s")

t0 = time.time()
res = seq.HMC(means, trils, n_hmc=n_hmc, num_burnin_steps=burnin,
              num_results=results, seed=2, segment_steps=250,
              trajectory_adaptation=args.traj, init_l=args.init_l,
              mass_adaptation=2)
jax.block_until_ready(res.samples)
t_hmc = time.time() - t0
log(f"HMC {t_hmc:.1f}s")

if _os.environ.get("GIGALENS_SURVEY_DUMP"):
    np.save(_os.environ["GIGALENS_SURVEY_DUMP"], np.asarray(res.samples))
T, n, d = res.samples.shape
C = n // S
chains = np.asarray(res.samples).reshape(T, S, C, d)
rows = []
for s in range(S):
    zs = chains[:, s]  # (T, C, d) — chain structure preserved for R-hat
    ess = np.asarray(effective_sample_size(zs))
    rhat = np.asarray(potential_scale_reduction(zs))
    rows.append(dict(scene=s, min_ess=float(ess.min()),
                     max_rhat=float(rhat.max())))

post_means = jnp.stack([chains[:, s].reshape(-1, d).mean(0) for s in range(S)])
sim_post = LensSimulator(phys, cfg, bs=S)
_, chi2 = jax.jit(lambda zz: spm.log_prob(sim_post, zz))(post_means)
chi2 = np.asarray(chi2)
for s in range(S):
    rows[s]["posterior_red_chi2"] = float(chi2[s])
    rows[s]["eps"] = float(np.asarray(res.step_size)[s])
    rows[s]["gates"] = dict(
        chi2_ok=bool(0.85 <= chi2[s] <= 1.15),
        rhat_ok=bool(rows[s]["max_rhat"] <= 1.02),
    )
    log(f"scene {s}: chi2 {chi2[s]:.3f} maxRhat {rows[s]['max_rhat']:.3f} "
        f"minESS {rows[s]['min_ess']:.0f} gates {rows[s]['gates']}")

total = t_map + t_svi + t_hmc
all_ok = all(r["gates"]["chi2_ok"] and r["gates"]["rhat_ok"] for r in rows)
print(json.dumps({
    "metric": "survey_production",
    "unit": "s",
    "value": round(total, 2),
    "per_scene_s": round(total / S, 2),
    "phase_s": dict(map=round(t_map, 2), svi=round(t_svi, 2),
                    hmc=round(t_hmc, 2)),
    "scenes": rows,
    "all_gates_pass": all_ok,
    "device": str(jax.devices()[0]),
}))
