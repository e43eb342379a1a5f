import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
T0=time.time()
def P(*a): print(round(time.time()-T0,1), *a, flush=True)
from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.model import ForwardProbModel
from gigalens_tpu.prob import Prior
from gigalens_tpu.prob import distributions as gld
from gigalens_tpu.profiles.light.sersic import SersicEllipse
from gigalens_tpu.profiles.mass.epl import EPL
from gigalens_tpu.profiles.mass.shear import Shear
from gigalens_tpu.simulator import LensSimulator
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
for bs in (50, 150):
    sim = LensSimulator(phys, cfg_exact, bs=bs)
    z = prior.unconstrain(prior.sample(jax.random.PRNGKey(0), bs))
    g = jax.jit(jax.grad(lambda z: jnp.sum(pm.log_prob(sim, z)[0])))
    try:
        out = g(z); jax.block_until_ready(out)
        P(f"bs={bs} grad ok, norm={float(jnp.linalg.norm(out)):.3f}")
        t0=time.time()
        for _ in range(5): out = g(z)
        jax.block_until_ready(out)
        P(f"bs={bs} grad {((time.time()-t0)/5*1e3):.1f} ms")
    except Exception as e:
        P(f"bs={bs} FAILED: {type(e).__name__}: {str(e)[:200]}")
