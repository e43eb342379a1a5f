import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
T0=time.time()
def P(*a): print(round(time.time()-T0,1), *a, flush=True)
from gigalens_tpu.ops.psf import subgrid_kernel, PSFConv
psf = np.load("/root/reference/src/gigalens/assets/psf.npy").astype(np.float32)
P("import")
k = subgrid_kernel(psf, 2, odd=True); jax.block_until_ready(k)
P("subgrid_kernel done", k.shape)
conv = PSFConv(k, (80,80), mode="dft", pool=2)
P("PSFConv dft built")
conv2 = PSFConv(k, (80,80), mode="fft", pool=1)
P("PSFConv fft built")
