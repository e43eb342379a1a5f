"""Probe: does the axon TPU backend support compiled-executable serialization?

If jax.experimental.serialize_executable round-trips on this backend, the
AOT cache can ship *executables* (skipping the remote backend compile
entirely in a fresh process), not just StableHLO exports (which only skip
trace+lower).

Run twice:
  python scripts/probe_serialize_exec.py save   # compile + serialize
  python scripts/probe_serialize_exec.py load   # fresh process: deserialize + run
"""
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

PATH = "/tmp/probe_exec.pkl"


def build():
    # moderately big program so compile time is visible
    def f(x, y):
        for _ in range(8):
            x = jnp.tanh(x @ y) + x
        return jnp.sum(x**2), x

    x = jnp.ones((512, 512), jnp.float32)
    y = jnp.ones((512, 512), jnp.float32) * 0.01
    return f, (x, y)


def main():
    mode = sys.argv[1]
    f, args = build()
    if mode == "save":
        t0 = time.time()
        lowered = jax.jit(f).lower(*args)
        print(f"lower: {time.time()-t0:.2f}s", flush=True)
        t0 = time.time()
        compiled = lowered.compile()
        print(f"compile: {time.time()-t0:.2f}s", flush=True)
        t0 = time.time()
        out = compiled(*args)
        jax.block_until_ready(out)
        print(f"run: {time.time()-t0:.2f}s val={float(out[0]):.4f}", flush=True)
        from jax.experimental import serialize_executable as se

        t0 = time.time()
        payload = se.serialize(compiled)
        blob = pickle.dumps(payload)
        open(PATH, "wb").write(blob)
        print(f"serialize: {time.time()-t0:.2f}s {len(blob)/1e6:.2f} MB", flush=True)
    else:
        from jax.experimental import serialize_executable as se

        t0 = time.time()
        payload = pickle.loads(open(PATH, "rb").read())
        compiled = se.deserialize_and_load(*payload)
        print(f"deserialize_and_load: {time.time()-t0:.2f}s", flush=True)
        t0 = time.time()
        out = compiled(*args)
        jax.block_until_ready(out)
        print(f"run: {time.time()-t0:.2f}s val={float(out[0]):.4f}", flush=True)
        # compare against fresh jit for correctness
        ref = jax.jit(f)(*args)
        np.testing.assert_allclose(float(out[0]), float(ref[0]), rtol=1e-6)
        print("MATCHES fresh jit", flush=True)


if __name__ == "__main__":
    main()
