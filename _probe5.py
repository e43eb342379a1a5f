import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from gigalens_tpu.inference.hmc import fit_hmc, sample_hmc

# 3-group grouped sampling on a 2D gaussian
d = 3
cov = np.diag([1.0, 4.0, 0.25]).astype(np.float32)
icov = np.linalg.inv(cov)
def lp(z): return -0.5 * jnp.einsum("nd,de,ne->n", z, icov, z)
G, C = 3, 16
z0 = jax.random.normal(jax.random.PRNGKey(0), (G*C, d))
res = sample_hmc(lp, z0, jax.random.PRNGKey(1), step_size=0.3,
                 num_burnin_steps=150, num_results=400,
                 trajectory_adaptation="chees", n_groups=G)
print("samples", res.samples.shape, "eps", np.asarray(res.step_size).round(3),
      "traj", np.asarray(res.trajectory_length).round(2))
for g in range(G):
    s = np.asarray(res.samples[:, g*C:(g+1)*C]).reshape(-1, d)
    print(f"group {g}: var={s.var(axis=0).round(2)} (want [1, 4, 0.25]) mean={s.mean(axis=0).round(2)}")
