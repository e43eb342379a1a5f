"""A/B step-time benchmark: composable fused render vs unfused XLA path.

Measures MAP-style gradient-step cost (value+grad of the pixel likelihood)
for model families the specialized benchmark kernel cannot fuse — the
builder's coverage targets (VERDICT r3 ask #4):

  * shapelet-source family: [EPL, Shear] + SersicEllipse + Shapelets(n_max)
  * lstsq family: [EPL, Shear] + SersicEllipse[lstsq] + Shapelets[lstsq]
    (through lstsq_simulate's stacked component render)

Usage: python scripts/bench_fused_families.py [bs] [reps]
Writes one JSON line per family with fused/unfused ms and the ratio.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("GIGALENS_JAX_CACHE", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import dataclasses

import jax.numpy as jnp

from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.model import ForwardProbModel
from gigalens_tpu.prob import Prior
from gigalens_tpu.prob import distributions as gld
from gigalens_tpu.profiles.light.sersic import SersicEllipse
from gigalens_tpu.profiles.light.shapelets import Shapelets
from gigalens_tpu.profiles.mass.epl import EPL
from gigalens_tpu.profiles.mass.shear import Shear
from gigalens_tpu.simulator import LensSimulator


def shapelet_prior(n_max):
    width = len(str((n_max + 1) * (n_max + 2) // 2))
    amps = {
        f"amp{str(i).zfill(width)}": gld.Normal(0.0, 50.0)
        for i in range((n_max + 1) * (n_max + 2) // 2)
    }
    return Prior(dict(
        lens_mass=[
            dict(theta_E=gld.LogNormal(jnp.log(1.25), 0.25),
                 gamma=gld.TruncatedNormal(2, 0.25, 1, 3),
                 e1=gld.Normal(0, 0.1), e2=gld.Normal(0, 0.1),
                 center_x=gld.Normal(0, 0.05), center_y=gld.Normal(0, 0.05)),
            dict(gamma1=gld.Normal(0, 0.05), gamma2=gld.Normal(0, 0.05)),
        ],
        lens_light=[dict(
            R_sersic=gld.LogNormal(jnp.log(1.0), 0.15),
            n_sersic=gld.Uniform(2, 6),
            e1=gld.TruncatedNormal(0, 0.1, -0.3, 0.3),
            e2=gld.TruncatedNormal(0, 0.1, -0.3, 0.3),
            center_x=gld.Normal(0, 0.05), center_y=gld.Normal(0, 0.05),
            Ie=gld.LogNormal(jnp.log(500.0), 0.3))],
        source_light=[dict(
            beta=gld.LogNormal(jnp.log(0.2), 0.2),
            center_x=gld.Normal(0, 0.25), center_y=gld.Normal(0, 0.25),
            **amps)],
    ))


def time_fn(fn, arg, reps):
    out = fn(arg)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(arg)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps * 1e3


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    psf = np.load("/root/reference/src/gigalens/assets/psf.npy").astype(np.float32)
    obs = np.abs(np.random.default_rng(0).normal(1, 0.5, (80, 80))).astype(np.float32)

    rows = []

    # ---- family 1: shapelet source (sampled amplitudes) -----------------
    n_max = 6
    prior = shapelet_prior(n_max)
    phys = PhysicalModel([EPL(23), Shear()], [SersicEllipse()], [Shapelets(n_max)])
    pm = ForwardProbModel(prior, obs, background_rms=0.2, exp_time=100.0)
    z = prior.unconstrain(prior.sample(jax.random.PRNGKey(0), bs))

    for fused in (True, False):
        cfg = SimulatorConfig(delta_pix=0.065, num_pix=80, supersample=2,
                              kernel=psf, use_fused_render=fused)
        sim = LensSimulator(phys, cfg, bs=bs)
        if fused:
            assert sim._fused_spec is not None, "builder must cover this model"
        fn = jax.jit(jax.grad(lambda zz: jnp.sum(pm.log_prob(sim, zz)[0])))
        ms = time_fn(fn, z, reps)
        rows.append(dict(family=f"shapelets_src_n{n_max}", fused=fused,
                         bs=bs, grad_ms=round(ms, 3)))
        print(json.dumps(rows[-1]), flush=True)

    # ---- family 2: lstsq component stack (linear amplitudes) ------------
    phys2 = PhysicalModel([EPL(23), Shear()], [SersicEllipse(use_lstsq=True)],
                          [Shapelets(4, use_lstsq=True)])
    prior2 = Prior(dict(
        lens_mass=prior.tree["lens_mass"],
        lens_light=[{k: v for k, v in prior.tree["lens_light"][0].items()
                     if k != "Ie"}],
        source_light=[dict(beta=gld.LogNormal(jnp.log(0.2), 0.2),
                           center_x=gld.Normal(0, 0.25),
                           center_y=gld.Normal(0, 0.25))],
    ))
    err = np.full((80, 80), 0.1, np.float32)
    z2 = prior2.unconstrain(prior2.sample(jax.random.PRNGKey(1), bs))

    for fused in (True, False):
        cfg = SimulatorConfig(delta_pix=0.065, num_pix=80, supersample=2,
                              kernel=psf, use_fused_render=fused)
        sim2 = LensSimulator(phys2, cfg, bs=bs)
        if fused:
            assert sim2._fused_spec is not None

        def loss(zz, sim2=sim2):
            params = prior2.constrain(zz)
            out = sim2.lstsq_simulate(params, obs, err)
            return jnp.sum((out - obs[None]) ** 2)

        fn = jax.jit(jax.grad(loss))
        ms = time_fn(fn, z2, reps)
        rows.append(dict(family="lstsq_sersic+shapelets4", fused=fused,
                         bs=bs, grad_ms=round(ms, 3)))
        print(json.dumps(rows[-1]), flush=True)

    for fam in {r["family"] for r in rows}:
        f = next(r for r in rows if r["family"] == fam and r["fused"])
        u = next(r for r in rows if r["family"] == fam and not r["fused"])
        print(json.dumps(dict(family=fam, speedup=round(
            u["grad_ms"] / f["grad_ms"], 2))), flush=True)


if __name__ == "__main__":
    main()
