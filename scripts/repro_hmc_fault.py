import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Minimal grouped-HMC fault repro: bench scene, HMC phase only.

Usage: python /tmp/hmc_repro.py <n_hmc> <seed_csv> [burnin] [results]
Env: caller controls GIGALENS_JAX_CACHE / GIGALENS_AOT_CACHE.
"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

from gigalens_tpu.utils.aot import setup_compilation_cache
setup_compilation_cache()

from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.inference import ModellingSequence
from gigalens_tpu.model import ForwardProbModel
from gigalens_tpu.prob import Prior
from gigalens_tpu.prob import distributions as gld
from gigalens_tpu.prob.distributions import MultivariateNormalTriL
from gigalens_tpu.profiles.light.sersic import SersicEllipse
from gigalens_tpu.profiles.mass.epl import EPL
from gigalens_tpu.profiles.mass.shear import Shear
from gigalens_tpu.simulator import LensSimulator

n_hmc = int(sys.argv[1])
seeds = [int(s) for s in sys.argv[2].split(",")]
burnin = int(sys.argv[3]) if len(sys.argv) > 3 else 250
results = int(sys.argv[4]) if len(sys.argv) > 4 else 750

prior = Prior(dict(
    lens_mass=[dict(theta_E=gld.LogNormal(jnp.log(1.25), 0.25),
                    gamma=gld.TruncatedNormal(2, 0.25, 1, 3),
                    e1=gld.Normal(0, 0.1), e2=gld.Normal(0, 0.1),
                    center_x=gld.Normal(0, 0.05), center_y=gld.Normal(0, 0.05)),
               dict(gamma1=gld.Normal(0, 0.05), gamma2=gld.Normal(0, 0.05))],
    lens_light=[dict(R_sersic=gld.LogNormal(jnp.log(1.0), 0.15),
                     n_sersic=gld.Uniform(2, 6),
                     e1=gld.TruncatedNormal(0, 0.1, -0.3, 0.3),
                     e2=gld.TruncatedNormal(0, 0.1, -0.3, 0.3),
                     center_x=gld.Normal(0, 0.05), center_y=gld.Normal(0, 0.05),
                     Ie=gld.LogNormal(jnp.log(500.0), 0.3))],
    source_light=[dict(R_sersic=gld.LogNormal(jnp.log(0.25), 0.15),
                       n_sersic=gld.Uniform(0.5, 4),
                       e1=gld.TruncatedNormal(0, 0.15, -0.5, 0.5),
                       e2=gld.TruncatedNormal(0, 0.15, -0.5, 0.5),
                       center_x=gld.Normal(0, 0.25), center_y=gld.Normal(0, 0.25),
                       Ie=gld.LogNormal(jnp.log(150.0), 0.5))],
))

psf = np.load("/root/reference/src/gigalens/assets/psf.npy").astype(np.float32)
phys = PhysicalModel([EPL(23), Shear()], [SersicEllipse()], [SersicEllipse()])
sim_config = SimulatorConfig(delta_pix=0.065, num_pix=80, supersample=2, kernel=psf)

truth = prior.sample(jax.random.PRNGKey(42), 1)
sim1 = LensSimulator(phys, sim_config, bs=1)
truth_img = np.asarray(jax.jit(sim1.simulate)(truth))
rng = np.random.default_rng(1)
bkg, exp_time = 0.2, 100.0
obs = truth_img + rng.normal(size=truth_img.shape).astype(np.float32) * np.sqrt(
    bkg**2 + np.clip(truth_img, 0, None) / exp_time)

prob_model = ForwardProbModel(prior, obs, background_rms=bkg, exp_time=exp_time)
seq = ModellingSequence(phys, prob_model, sim_config)

# surrogate: truth-centered MVN with a modest diagonal scale — geometry-wise
# a crude preconditioner, but structurally identical to the SVI output
mu = prior.unconstrain(truth)[0]
d = mu.shape[0]
q_z = MultivariateNormalTriL(mu, 0.03 * jnp.eye(d))

seg = int(os.environ.get("REPRO_SEGMENT", "0"))
t0 = time.time()


def prog(done, acc):
    print(f"  t={time.time()-t0:7.1f}s steps={done} accept={acc:.3f}",
          flush=True)


res = seq.HMC(q_z, n_hmc=n_hmc, num_burnin_steps=burnin, num_results=results,
              seeds=seeds if len(seeds) > 1 else None,
              seed=seeds[0], segment_steps=seg,
              progress=prog if seg else None)
jax.block_until_ready(res.samples)
print(f"HMC OK n_hmc={n_hmc} seeds={seeds} wall={time.time()-t0:.1f}s "
      f"samples={res.samples.shape}", flush=True)
