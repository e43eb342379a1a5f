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

from gigalens_tpu.utils.aot import setup_compilation_cache as _scc; _scc()

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

    # ---- family 3: NFW_ELLIPSE halo + Sersic pair (r4 builder stage) ----
    from gigalens_tpu.profiles.mass.nfw import NFW_ELLIPSE

    prior3 = Prior(dict(
        lens_mass=[
            dict(Rs=gld.LogNormal(jnp.log(10.0), 0.2),
                 alpha_Rs=gld.LogNormal(jnp.log(4.0), 0.3),
                 e1=gld.Normal(0, 0.1), e2=gld.Normal(0, 0.1),
                 center_x=gld.Normal(0, 0.1), center_y=gld.Normal(0, 0.1)),
            dict(gamma1=gld.Normal(0, 0.05), gamma2=gld.Normal(0, 0.05)),
        ],
        lens_light=prior.tree["lens_light"],
        source_light=[dict(
            R_sersic=gld.LogNormal(jnp.log(0.25), 0.15),
            n_sersic=gld.Uniform(0.5, 4),
            e1=gld.TruncatedNormal(0, 0.15, -0.5, 0.5),
            e2=gld.TruncatedNormal(0, 0.15, -0.5, 0.5),
            center_x=gld.Normal(0, 0.25), center_y=gld.Normal(0, 0.25),
            Ie=gld.LogNormal(jnp.log(150.0), 0.5))],
    ))
    phys3 = PhysicalModel([NFW_ELLIPSE(), Shear()], [SersicEllipse()],
                          [SersicEllipse()])
    pm3 = ForwardProbModel(prior3, obs, background_rms=0.2, exp_time=100.0)
    z3 = prior3.unconstrain(prior3.sample(jax.random.PRNGKey(2), bs))
    for fused in (True, False):
        cfg = SimulatorConfig(delta_pix=0.065, num_pix=80, supersample=2,
                              kernel=psf, use_fused_render=fused)
        sim3 = LensSimulator(phys3, cfg, bs=bs)
        if fused:
            assert sim3._fused_spec is not None
        fn = jax.jit(jax.grad(lambda zz: jnp.sum(pm3.log_prob(sim3, zz)[0])))
        ms = time_fn(fn, z3, reps)
        rows.append(dict(family="nfw_ellipse_halo", fused=fused, bs=bs,
                         grad_ms=round(ms, 3)))
        print(json.dumps(rows[-1]), flush=True)

    # ---- family 4: cluster series stack (r4 builder stage) --------------
    from gigalens_tpu.profiles.light.shapelets import Shapelets as _Sh
    from gigalens_tpu.profiles.mass.dpie_subhalo import DPIESubhaloSeries

    rng = np.random.default_rng(7)
    G = 20
    catalogue = dict(
        lum=rng.uniform(0.3, 3.0, G).astype(np.float32),
        center_x=rng.normal(0, 6.0, G).astype(np.float32),
        center_y=rng.normal(0, 6.0, G).astype(np.float32),
        e1=rng.uniform(-0.2, 0.2, G).astype(np.float32),
        e2=rng.uniform(-0.2, 0.2, G).astype(np.float32),
    )
    obs4 = np.abs(np.random.default_rng(3).normal(1, 0.5, (48, 48))).astype(np.float32)
    members = DPIESubhaloSeries(lum_star=1.0, galaxy_catalogue=catalogue,
                                chunk_size=G)
    n_max4 = 4
    sh4 = _Sh(n_max4)
    phys4 = PhysicalModel([NFW_ELLIPSE(), members], [], [sh4])
    width = len(str((n_max4 + 1) * (n_max4 + 2) // 2))
    prior4 = Prior(dict(
        lens_mass=[
            prior3.tree["lens_mass"][0],
            dict(theta_E=gld.LogNormal(np.log(0.3), 0.3),
                 r_cut=gld.LogNormal(np.log(1.5), 0.2)),
        ],
        source_light=[dict(
            beta=gld.LogNormal(np.log(0.4), 0.2),
            center_x=gld.Normal(0, 0.3), center_y=gld.Normal(0, 0.3),
            **{f"amp{str(i).zfill(width)}": gld.Normal(0, 5.0)
               for i in range((n_max4 + 1) * (n_max4 + 2) // 2)})],
    ))
    pm4 = ForwardProbModel(prior4, obs4, background_rms=0.2, exp_time=100.0)
    z4 = prior4.unconstrain(prior4.sample(jax.random.PRNGKey(4), bs))
    members.set_constants(dict(r_cut=1.5, r_core=0.08))
    for fused in (True, False):
        cfg = SimulatorConfig(delta_pix=0.2, num_pix=48, supersample=2,
                              kernel=None, use_fused_render=fused)
        sim4 = LensSimulator(phys4, cfg, bs=bs)
        if fused:
            assert sim4._fused_spec is not None
            members.set_grid(sim4.img_x, sim4.img_y)
            members.set_deriv()
            jax.block_until_ready(members._deriv_coefs)
        fn = jax.jit(jax.grad(lambda zz: jnp.sum(pm4.log_prob(sim4, zz)[0])))
        ms = time_fn(fn, z4, reps)
        rows.append(dict(family=f"cluster_series_G{G}", fused=fused, bs=bs,
                         grad_ms=round(ms, 3)))
        print(json.dumps(rows[-1]), flush=True)

    for fam in sorted({r["family"] for r in rows}):
        f = next(r for r in rows if r["family"] == fam and r["fused"])
        u = next(r for r in rows if r["family"] == fam and not r["fused"])
        print(json.dumps(dict(family=fam, speedup=round(
            u["grad_ms"] / f["grad_ms"], 2))), flush=True)


if __name__ == "__main__":
    main()
