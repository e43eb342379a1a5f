import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
T0=time.time()
def P(*a): print(round(time.time()-T0,1), *a, flush=True)
import os
os.environ["GIGALENS_AOT_CACHE"] = "0"  # isolate: plain jit path
from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.model import ForwardProbModel
from gigalens_tpu.prob import Prior
from gigalens_tpu.prob import distributions as gld
from gigalens_tpu.profiles.light.sersic import SersicEllipse
from gigalens_tpu.profiles.mass.epl import EPL
from gigalens_tpu.profiles.mass.shear import Shear
from gigalens_tpu.simulator import LensSimulator
from gigalens_tpu.inference.hmc import sample_hmc
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
obs = np.zeros((80,80), np.float32)
pm = ForwardProbModel(prior, obs, background_rms=0.2, exp_time=100.0)
P("setup")
G, C, d = 3, 50, 22
sim = LensSimulator(phys, cfg_exact, bs=G*C)
def lp(z): return pm.log_prob(sim, z)[0]
z0 = prior.unconstrain(prior.sample(jax.random.PRNGKey(0), G*C))
d = z0.shape[1]
tril = 0.1*jnp.broadcast_to(jnp.eye(d), (G,d,d))
try:
    res = sample_hmc(lp, z0, jax.random.PRNGKey(1), step_size=0.1,
                     num_burnin_steps=20, num_results=30,
                     momentum_covariance_tril=tril,
                     trajectory_adaptation="chees", n_groups=G)
    jax.block_until_ready(res.samples)
    P("grouped G=3 ok", res.samples.shape, np.asarray(res.step_size).round(4))
except Exception as e:
    P("grouped G=3 FAILED:", type(e).__name__, str(e)[:300])
