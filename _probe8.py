import os, time, sys
os.environ["GIGALENS_AOT_CACHE"] = "0"
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_log_compiles", True)
import jax.numpy as jnp
T0=time.time()
def P(*a): print(f"[{round(time.time()-T0,1)}]", *a, flush=True)
from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.model import ForwardProbModel
from gigalens_tpu.prob import Prior
from gigalens_tpu.prob import distributions as gld
from gigalens_tpu.profiles.light.sersic import SersicEllipse
from gigalens_tpu.profiles.mass.epl import EPL
from gigalens_tpu.profiles.mass.shear import Shear
from gigalens_tpu.simulator import LensSimulator
from gigalens_tpu.inference import hmc as H
import dataclasses

prior = Prior(dict(
    lens_mass=[dict(theta_E=gld.LogNormal(jnp.log(1.25),0.25), gamma=gld.TruncatedNormal(2,0.25,1,3),
                    e1=gld.Normal(0,0.1), e2=gld.Normal(0,0.1), center_x=gld.Normal(0,0.05), center_y=gld.Normal(0,0.05)),
               dict(gamma1=gld.Normal(0,0.05), gamma2=gld.Normal(0,0.05))],
    lens_light=[dict(R_sersic=gld.LogNormal(jnp.log(1.0),0.15), n_sersic=gld.Uniform(2,6),
                     e1=gld.TruncatedNormal(0,0.1,-0.3,0.3), e2=gld.TruncatedNormal(0,0.1,-0.3,0.3),
                     center_x=gld.Normal(0,0.05), center_y=gld.Normal(0,0.05), Ie=gld.LogNormal(jnp.log(500.0),0.3))],
    source_light=[dict(R_sersic=gld.LogNormal(jnp.log(0.25),0.15), n_sersic=gld.Uniform(0.5,4),
                       e1=gld.TruncatedNormal(0,0.15,-0.5,0.5), e2=gld.TruncatedNormal(0,0.15,-0.5,0.5),
                       center_x=gld.Normal(0,0.25), center_y=gld.Normal(0,0.25), Ie=gld.LogNormal(jnp.log(150.0),0.5))]))
psf = np.load("/root/reference/src/gigalens/assets/psf.npy").astype(np.float32)
phys = PhysicalModel([EPL(23), Shear()], [SersicEllipse()], [SersicEllipse()])
cfg = SimulatorConfig(delta_pix=0.065, num_pix=80, supersample=2, kernel=psf)
cfg_exact = dataclasses.replace(cfg, psf_mode="fft")
pm = ForwardProbModel(prior, np.zeros((80,80), np.float32), background_rms=0.2, exp_time=100.0)
P("setup")

def run(G, C, chees, steps=6):
    sim = LensSimulator(phys, cfg_exact, bs=G*C)
    def lp(z): return pm.log_prob(sim, z)[0]
    z0 = prior.unconstrain(prior.sample(jax.random.PRNGKey(0), G*C))
    d = z0.shape[1]
    init_carry, run_segment = H._hmc_programs(
        lp, G*C, d, 0.1, 3, 4, (-1,), False,
        chees, 0.75, "mean", 30, 0.025, None, G, None)
    t0=time.time()
    carry = init_carry(z0, 0.1*jnp.broadcast_to(jnp.eye(d), (G,d,d)))
    jax.block_until_ready(carry[0]); P(f"G={G} C={C} chees={chees}: init done {round(time.time()-t0,1)}s")
    t0=time.time()
    keys = jax.random.split(jax.random.PRNGKey(1), steps)
    hs = jnp.ones(steps) * 0.7
    carry, (zs, acc) = run_segment(carry, keys, hs)
    jax.block_until_ready(zs); P(f"G={G} C={C} chees={chees}: segment({steps}) done {round(time.time()-t0,1)}s acc={float(jnp.mean(acc)):.3f}")

which = sys.argv[1]
if which == "g1": run(1, 50, True)
elif which == "g3nochees": run(3, 50, False)
elif which == "g3": run(3, 50, True)
elif which == "g3small": run(3, 8, True)
