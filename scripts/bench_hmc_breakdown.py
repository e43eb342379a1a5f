"""Per-gradient cost breakdown of the HMC (exact) likelihood path at small
batch, on the real chip.

The round-2 verdict flagged HMC as the dominant warm phase (37 s of 60.6 s)
with bw_frac 0.72 at bs=50 — below the unfused-bytes bandwidth roofline.
This script decomposes one posterior gradient into its pipeline stages to
find where the per-leapfrog 3.81 ms actually goes:

    render fwd | render fwd+bwd | conv fwd | conv fwd+bwd |
    chi2-given-image grad | prior grad | full log_prob grad

Usage: python scripts/bench_hmc_breakdown.py [bs ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from gigalens_tpu.utils.aot import setup_compilation_cache as _scc; _scc()
import jax.numpy as jnp
import numpy as np

from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.model import ForwardProbModel
from gigalens_tpu.prob import Prior
from gigalens_tpu.prob import distributions as gld
from gigalens_tpu.profiles.light.sersic import SersicEllipse
from gigalens_tpu.profiles.mass.epl import EPL
from gigalens_tpu.profiles.mass.shear import Shear
from gigalens_tpu.simulator import LensSimulator


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    bss = [int(a) for a in sys.argv[1:]] or [50]
    from bench import main as _  # noqa: F401  (reuse nothing; priors inline)

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
    psf = np.load("/root/reference/src/gigalens/assets/psf.npy").astype(np.float32)
    niter = EPL.recommended_niter(q_min=0.43, tol=1e-8)
    phys = PhysicalModel([EPL(niter), Shear()], [SersicEllipse()], [SersicEllipse()])
    cfg = SimulatorConfig(delta_pix=0.065, num_pix=80, supersample=2, kernel=psf)

    truth = prior.sample(jax.random.PRNGKey(42), 1)
    sim1 = LensSimulator(phys, cfg, bs=1)
    obs = np.asarray(jax.jit(sim1.simulate)(truth))
    pm = ForwardProbModel(prior, obs, background_rms=0.2, exp_time=100.0)

    for bs in bss:
        sim = LensSimulator(phys, cfg, bs=bs)
        z = prior.unconstrain(prior.sample(jax.random.PRNGKey(1), bs))
        x = prior.constrain(z)

        from gigalens_tpu.ops.pallas.fused_render import fused_render, pack_params

        p = pack_params(x)

        rows = {}
        # 1. fused render forward
        f_fwd = jax.jit(lambda p: fused_render(p, sim.img_x, sim.img_y, niter))
        rows["render_fwd"] = timeit(f_fwd, p)
        # 2. fused render fwd+bwd
        f_fb = jax.jit(jax.grad(lambda p: jnp.sum(
            fused_render(p, sim.img_x, sim.img_y, niter))))
        rows["render_fwd_bwd"] = timeit(f_fb, p)
        # 3. conv forward / fwd+bwd
        img = jnp.zeros((bs, sim.h_ss, sim.w_ss))
        c_fwd = jax.jit(lambda i: sim._conv(i))
        rows["conv_fwd"] = timeit(c_fwd, img)
        c_fb = jax.jit(jax.grad(lambda i: jnp.sum(sim._conv(i))))
        rows["conv_fwd_bwd"] = timeit(c_fb, img)
        # 4. chi2 given native image (grad)
        native = jnp.zeros((bs, cfg.num_pix, cfg.num_pix))

        def chi2_of_img(im_sim):
            err = jnp.sqrt(pm.background_rms**2 + im_sim / pm.exp_time)
            r = (im_sim - pm.observed_image) / err
            return jnp.sum(r**2) + jnp.sum(jnp.log(err**2))

        rows["chi2_grad"] = timeit(jax.jit(jax.grad(chi2_of_img)), native)
        # 5. prior part (constrain + log_prob + fldj) grad
        def prior_part(z):
            xx = pm.prior.constrain(z)
            return jnp.sum(pm.prior.log_prob(xx) + pm.prior.fldj(z))

        rows["prior_grad"] = timeit(jax.jit(jax.grad(prior_part)), z)
        # 6. full posterior gradient (the HMC leapfrog cost)
        def lp(z):
            return jnp.sum(pm.log_prob(sim, z)[0])

        rows["full_grad"] = timeit(jax.jit(jax.grad(lp)), z)
        # 7. full posterior value+grad via vjp (what the chain uses)
        def lp_vjp(z):
            l, vjp = jax.vjp(lambda zz: pm.log_prob(sim, zz)[0], z)
            return l, vjp(jnp.ones_like(l))[0]

        rows["full_val_grad"] = timeit(jax.jit(lp_vjp), z)

        # 8. the EXACT (HMC) path: fft conv instead of dft (see
        # inference/sequence.py phase_simulator — MH needs fft smoothness)
        import dataclasses

        sim_e = LensSimulator(
            phys, dataclasses.replace(cfg, psf_mode="fft"), bs=bs
        )
        ce_fwd = jax.jit(lambda i: sim_e._conv(i))
        rows["conv_fft_fwd"] = timeit(ce_fwd, img)
        ce_fb = jax.jit(jax.grad(lambda i: jnp.sum(sim_e._conv(i))))
        rows["conv_fft_fwd_bwd"] = timeit(ce_fb, img)

        def lp_e_vjp(z):
            l, vjp = jax.vjp(lambda zz: pm.log_prob(sim_e, zz)[0], z)
            return l, vjp(jnp.ones_like(l))[0]

        rows["exact_val_grad"] = timeit(jax.jit(lp_e_vjp), z)

        print(f"bs={bs}")
        for k, v in rows.items():
            print(f"  {k:18s} {v*1e3:8.3f} ms")
        acct = (rows["render_fwd_bwd"] + rows["conv_fwd_bwd"]
                + rows["chi2_grad"] + rows["prior_grad"])
        print(f"  {'sum(parts)':18s} {acct*1e3:8.3f} ms  "
              f"(unaccounted {1e3*(rows['full_grad']-acct):.3f} ms)")


if __name__ == "__main__":
    main()
