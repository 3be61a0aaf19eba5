"""Probe: does device_put of jnp.int4 arrays survive the axon TPU backend?

bench.py --int4 {full,hybrid} crashed with `RecursionError: Recursively
calling jit` from `_array_shard_arg` → `device_put` on an
`S4[18,16,128,16384]` argument (see docs/PERF.md).  This probes which ranks
/ shapes trigger it, so the int4 XLA path can either be re-laid-out or
documented as fused-kernel-only on this stack.

Run: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/probe_int4_deviceput.py
"""

import jax
import jax.numpy as jnp
import numpy as np


def probe(label, shape):
    try:
        host = np.zeros(shape, np.int8)
        a = jnp.asarray(host).astype(jnp.int4)
        a = jax.device_put(a, jax.devices()[0])

        @jax.jit
        def f(x):
            return jnp.sum(x.astype(jnp.int32))

        r = int(f(a))
        print(f"{label:28s} {shape}: OK (sum={r})")
    except RecursionError as e:
        print(f"{label:28s} {shape}: RECURSION ({str(e)[:60]})")
    except Exception as e:  # noqa: BLE001
        print(f"{label:28s} {shape}: {type(e).__name__} {str(e)[:100]}")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    probe("2-D small", (256, 512))
    probe("2-D odd-K", (2048, 16384))
    probe("3-D stacked", (18, 2048, 1024))
    probe("4-D grouped (crash repro)", (18, 16, 128, 1024))
