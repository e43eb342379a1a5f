import time, sys, os
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
def P(*a): print(round(time.time()-T0,1), *a, flush=True)
T0=time.time()
from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.prob import Prior
from gigalens_tpu.prob import distributions as gld
from gigalens_tpu.profiles.light.sersic import SersicEllipse
from gigalens_tpu.profiles.mass.epl import EPL
from gigalens_tpu.profiles.mass.shear import Shear
from gigalens_tpu.simulator import LensSimulator
P("imports done")
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
P("prior built")
psf = np.load("/root/reference/src/gigalens/assets/psf.npy").astype(np.float32)
phys = PhysicalModel([EPL(23), Shear()], [SersicEllipse()], [SersicEllipse()])
P("phys built")
sim_config = SimulatorConfig(delta_pix=0.065, num_pix=40, supersample=2, kernel=psf)
truth = prior.sample(jax.random.PRNGKey(42), 1)
jax.block_until_ready(truth); P("truth sampled")
sim1 = LensSimulator(phys, sim_config, bs=1)
P("sim built")
img = jax.jit(sim1.simulate)(truth)
jax.block_until_ready(img); P("simulated", float(jnp.sum(img)))
