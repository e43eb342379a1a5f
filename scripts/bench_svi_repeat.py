"""Diagnose the first-call overhead of fit_svi: repeated identical calls
with compile logging, to separate program compiles from steady-state compute.

Usage: python scripts/bench_svi_repeat.py
"""
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from gigalens_tpu.utils.aot import setup_compilation_cache as _scc; _scc()
jax.config.update("jax_log_compiles", True)
logging.basicConfig(level=logging.WARNING)

import numpy as np
import optax

from gigalens_tpu.inference import ModellingSequence
from bench_svi_segments import build  # same scene


def main():
    print("devices:", jax.devices(), flush=True)
    prior, phys, cfg, pm = build()
    seq = ModellingSequence(phys, pm, cfg)
    start = np.asarray(prior.unconstrain(prior.sample(jax.random.PRNGKey(7), 1)))
    L0 = seq.laplace_scale_tril(start)

    schedule = optax.polynomial_schedule(-1e-6, -3e-3, 2, 60)
    opt = optax.chain(optax.scale_by_adam(), optax.scale_by_schedule(schedule))

    for rep in range(4):
        t0 = time.time()
        _, losses = seq.SVI(start, opt, n_vi=1000, num_steps=300,
                            init_scales=L0, seed=1, segment_steps=300)
        jax.block_until_ready(losses)
        dt = time.time() - t0
        print(f"fit_svi rep{rep}: {dt:6.2f}s", flush=True)


if __name__ == "__main__":
    main()
