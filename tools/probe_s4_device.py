"""Can this backend run XLA-native int4 (S4 dtype) if the arrays are built
ON DEVICE (d2d convert), never host-transferred?

Round-3 finding: `device_put` of an S4 array RecursionErrors on axon
(tools/probe_int4_deviceput.py) — that killed the S4 *transfer* path.  But
the decode weights can be shipped as int8 nibbles and unpacked to S4 once,
on device, inside a jit.  If XLA TPU then stores S4 packed (2/byte) and
fuses the upcast into the dot's operand read, the MLP chain streams at
4-bit density with NO Pallas per-call overhead — the thing the halfsplit
kernel measured losing to (floor 0.69 ms vs 0.42 roof, PERF.md).

Steps (each may fail independently — report granularly):
  1. jit d2d: int8 [K,N] -> int4 [K,N] output. Does dispatch+fetch work?
  2. dot: x[B,K] @ s4.astype(bf16) — correct numerics?
  3. chain bench: 18-layer MLP GEMV chain, S4 weights as jit args.

Run: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/probe_s4_device.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/root/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    out = {}

    # -- step 1: d2d build + keep resident (no host fetch of the S4 array)
    @jax.jit
    def to_s4(b8):
        return jnp.clip(b8, -7, 7).astype(jnp.int4)

    key = jax.random.PRNGKey(0)
    b8 = jax.random.randint(key, (256, 256), -7, 8, jnp.int8)
    try:
        s4 = to_s4(b8)
        out["build_d2d"] = "ok"
    except Exception as e:
        out["build_d2d"] = f"FAIL: {str(e)[:200]}"
        print(json.dumps(out))
        return

    # -- step 2: S4 strictly INSIDE one jit (int8 in, bf16 out) — no S4
    # array ever crosses a jit boundary (crossing one RecursionErrors on
    # axon, per step-2's previous revision and probe_int4_deviceput.py).
    @jax.jit
    def dot(x, b8):
        w4 = jnp.clip(b8, -7, 7).astype(jnp.int4)
        return x @ w4.astype(jnp.bfloat16)

    try:
        x = jax.random.normal(key, (2, 256), jnp.bfloat16)
        y = np.asarray(jax.device_get(dot(x, b8)))
        ref = np.asarray(jax.device_get(x)).astype(np.float32) @ np.asarray(
            jax.device_get(jnp.clip(b8, -7, 7))).astype(np.float32)
        err = float(np.max(np.abs(y.astype(np.float32) - ref)) /
                    (np.max(np.abs(ref)) + 1e-9))
        out["dot"] = "ok" if err < 0.05 else f"WRONG (rel err {err:.3f})"
    except Exception as e:
        out["dot"] = f"FAIL: {str(e)[:200]}"
        print(json.dumps(out))
        return

    # -- step 3: the 18-layer chain. int8 bytes cross the jit boundary;
    # the int8->S4 convert happens ONCE inside the jit, before the decode
    # loop, so XLA holds the packed-int4 intermediate resident across
    # iterations (this is the 4-bit-density stream the Pallas halfsplit
    # kernel could not reach: floor 0.69 ms vs 0.42 roof, docs/PERF.md).
    L, D, F = 18, 2048, 8192
    b1 = jax.random.randint(key, (L, D, F), -7, 8, jnp.int8)
    b2 = jax.random.randint(key, (L, F, D), -7, 8, jnp.int8)
    s1 = jnp.ones((L, 1, F), jnp.float32) * 0.01
    s2 = jnp.ones((L, 1, D), jnp.float32) * 0.01

    def chain(x, packs):
        def layer(x, ws):
            qa, sa, qb, sb = ws
            h = jnp.maximum(
                (x @ qa.astype(jnp.bfloat16)) * sa.astype(jnp.bfloat16), 0)
            y = (h @ qb.astype(jnp.bfloat16)) * sb.astype(jnp.bfloat16)
            return y.astype(x.dtype), None
        x, _ = jax.lax.scan(layer, x, packs)
        return x

    @jax.jit
    def run(x, n, b1, s1, b2, s2):
        packs = (b1.astype(jnp.int4), s1, b2.astype(jnp.int4), s2)
        return jax.lax.fori_loop(0, n, lambda i, x: chain(x * 0.5, packs), x)

    # grouped-scale variant (G=128: the quality-preserving int4 layout) —
    # per-group partial dots + scaled reduce, as int4_matmul_grouped does.
    G = 128

    def gmm(x, q, s):  # q int4 [K//G, G, N], s [K//G, N]
        x3 = x.reshape(x.shape[0], q.shape[0], G)
        part = jnp.einsum("bkg,kgn->bkn", x3, q.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        return jnp.einsum("bkn,kn->bn", part, s).astype(x.dtype)

    def chain_g(x, packs):
        def layer(x, ws):
            qa, sa, qb, sb = ws
            h = jnp.maximum(gmm(x, qa, sa), 0)
            return gmm(h, qb, sb), None
        x, _ = jax.lax.scan(layer, x, packs)
        return x

    @jax.jit
    def run_g(x, n, b1, s1, b2, s2):
        packs = (
            b1.reshape(L, D // G, G, F).astype(jnp.int4),
            jnp.broadcast_to(s1, (L, D // G, F)) * 1.0,
            b2.reshape(L, F // G, G, D).astype(jnp.int4),
            jnp.broadcast_to(s2, (L, F // G, D)) * 1.0,
        )
        return jax.lax.fori_loop(0, n, lambda i, x: chain_g(x * 0.5, packs), x)

    for name, fn in (("s4_chain_ms", run), ("s4_grouped_chain_ms", run_g)):
        try:
            x0 = jax.random.normal(key, (2, D), jnp.bfloat16)
            ts = {}
            for n in (32, 128):
                jax.device_get(fn(x0, n, b1, s1, b2, s2))
                best = np.inf
                for _ in range(3):
                    t0 = time.perf_counter()
                    jax.device_get(fn(x0, n, b1, s1, b2, s2))
                    best = min(best, time.perf_counter() - t0)
                ts[n] = best
            out[name] = round((ts[128] - ts[32]) / 96 * 1e3, 4)
        except Exception as e:
            out[name] = f"FAIL: {str(e)[:300]}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
