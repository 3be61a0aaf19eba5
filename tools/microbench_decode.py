"""Microbenchmarks for the decode-step weight stream on the real TPU.

Decides the round-2 perf design (fused decoder-block kernel + int8): measures
the effective HBM bandwidth of the per-step GEMV chain under different weight
storage formats, inside a fori_loop to mimic the while_loop decode regime.

Run:  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/microbench_decode.py
"""

from __future__ import annotations

import math
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

L, D, F = 18, 2048, 8192  # decoder MLP shapes (the big weight term)
B = 2  # CFG pair
STEPS = 200


def timeit(body, *weights, lo=64, hi=256):
    """Per-step cost as the SLOPE between two run lengths (fixed dispatch
    overhead and result-caching artifacts cancel; see CLAUDE.md).  Fresh
    input per call defeats any (executable, args) result cache."""

    def make(steps):
        @jax.jit
        def run(x, *ws):
            def step(i, x):
                return body(x, ws, i)

            return jax.lax.fori_loop(0, steps, step, x)

        return run

    times = {}
    for steps in (lo, hi):
        run = make(steps)
        key = jax.random.PRNGKey(steps)
        # NOTE: block_until_ready does NOT reliably wait through the remote
        # axon tunnel — force a device->host transfer to time real work.
        np.asarray(run(jax.random.normal(key, (B, D), jnp.bfloat16), *weights))
        best = np.inf
        for rep in range(3):
            x = jax.random.normal(jax.random.PRNGKey(1000 + rep), (B, D), jnp.bfloat16)
            t0 = time.perf_counter()
            np.asarray(run(x, *weights))
            best = min(best, time.perf_counter() - t0)
        times[steps] = best
    return (times[hi] - times[lo]) / (hi - lo)


def mlp_bf16(x, weights, i):
    (wi, wo) = weights

    def layer(x, ws):
        h = jnp.dot(x, ws[0], preferred_element_type=jnp.float32)
        h = jax.nn.silu(h).astype(jnp.bfloat16)
        return x + jnp.dot(h, ws[1], preferred_element_type=jnp.float32).astype(jnp.bfloat16), None

    x, _ = jax.lax.scan(layer, x, (wi, wo))
    return x


def mlp_int8_upcast(x, weights, i):
    (wi, wo, si, so) = weights

    def layer(x, ws):
        w0 = ws[0].astype(jnp.bfloat16)
        h = jnp.dot(x, w0, preferred_element_type=jnp.float32) * ws[2]
        h = jax.nn.silu(h).astype(jnp.bfloat16)
        w1 = ws[1].astype(jnp.bfloat16)
        o = jnp.dot(h, w1, preferred_element_type=jnp.float32) * ws[3]
        return x + o.astype(jnp.bfloat16), None

    x, _ = jax.lax.scan(layer, x, (wi, wo, si, so))
    return x


def mlp_int8_dyn(x, weights, i):
    """dynamic activation quant → s8xs8 dot (int8 MXU path)."""
    (wi, wo, si, so) = weights

    def layer(x, ws):
        ax = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / ax), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, ws[0], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        h = acc.astype(jnp.float32) * ax * ws[2]
        h = jax.nn.silu(h).astype(jnp.bfloat16)
        ah = jnp.max(jnp.abs(h), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
        hq = jnp.clip(jnp.round(h.astype(jnp.float32) / ah), -127, 127).astype(jnp.int8)
        acc2 = jax.lax.dot_general(hq, ws[1], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        o = acc2.astype(jnp.float32) * ah * ws[3]
        return x + o.astype(jnp.bfloat16), None

    x, _ = jax.lax.scan(layer, x, (wi, wo, si, so))
    return x


# ---------------------------------------------------------------------------
# Decomposition: where does the full decode step lose bandwidth vs MLP-only?
# Each variant adds one component of the real per-layer body (upcast-int8
# weights throughout), so step-time deltas attribute the cost.
# ---------------------------------------------------------------------------

NQ, NKV, H = 16, 4, 128
T_CACHE = 896


def _proj(x, w8, out_dim):
    return jnp.dot(x, w8.astype(jnp.bfloat16), preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def step_proj(x, weights, i):
    """MLP + the 5 per-layer projection dots (q,k,v,cq,o,co) — no attention."""
    (wi, wo, wq, wkv, wo1, wo2) = weights

    def layer(x, ws):
        wi8, wo8, wq8, wkv8, wo18, wo28 = ws
        q = _proj(x, wq8, NQ * H)
        kv = _proj(x, wkv8, 2 * NKV * H)
        cq = _proj(x, wq8, NQ * H)  # cross-q same shape as q
        a = _proj(q, wo18, D)      # o_proj stand-in [NQ*H, D]
        ca = _proj(cq, wo28, D)
        x = x + a + ca + jnp.pad(kv, ((0, 0), (0, D - kv.shape[1]))) * 1e-6  # keep kv live
        h = jnp.dot(x, wi8.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        h = jax.nn.silu(h).astype(jnp.bfloat16)
        o = jnp.dot(h, wo8.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        return x + o.astype(jnp.bfloat16), None

    x, _ = jax.lax.scan(layer, x, (wi, wo, wq, wkv, wo1, wo2))
    return x


def step_full(x, weights, i):
    """step_proj + cached self-attention over T_CACHE slots + norms (the whole
    real per-layer body shape, minus cache writes)."""
    (wi, wo, wq, wkv, wo1, wo2, kc, vc, g) = weights

    def layer(x, ws):
        wi8, wo8, wq8, wkv8, wo18, wo28, k, v, gg = ws
        xn = (x.astype(jnp.float32) * jax.lax.rsqrt(
            jnp.mean(x.astype(jnp.float32) ** 2, -1, keepdims=True) + 1e-5) * gg
        ).astype(jnp.bfloat16)
        q = _proj(xn, wq8, NQ * H).reshape(B, NKV, NQ // NKV, H)
        s = jnp.einsum("bngh,btnh->bngt", q, k.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32) / math.sqrt(H)
        p = jax.nn.softmax(s, axis=-1)
        a = jnp.einsum("bngt,btnh->bngh", p.astype(jnp.bfloat16), v.astype(jnp.bfloat16))
        a = a.reshape(B, NQ * H)
        x = x + _proj(a, wo18, D)
        kv = _proj(xn, wkv8, 2 * NKV * H)
        cq = _proj(xn, wq8, NQ * H)
        x = x + _proj(cq, wo28, D) + jnp.pad(kv, ((0, 0), (0, D - kv.shape[1]))) * 1e-6
        xn2 = (x.astype(jnp.float32) * jax.lax.rsqrt(
            jnp.mean(x.astype(jnp.float32) ** 2, -1, keepdims=True) + 1e-5) * gg
        ).astype(jnp.bfloat16)
        h = jnp.dot(xn2, wi8.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        h = jax.nn.silu(h).astype(jnp.bfloat16)
        o = jnp.dot(h, wo8.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        return x + o.astype(jnp.bfloat16), None

    x, _ = jax.lax.scan(layer, x, (wi, wo, wq, wkv, wo1, wo2, kc, vc, g))
    return x


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, D), jnp.bfloat16)
    wi8 = jax.random.randint(key, (L, D, F), -127, 127, jnp.int8)
    wo8 = jax.random.randint(key, (L, F, D), -127, 127, jnp.int8)
    si = jnp.full((L, 1, F), 0.01, jnp.float32)
    so = jnp.full((L, 1, D), 0.01, jnp.float32)
    wi = wi8.astype(jnp.bfloat16) * 0.01
    wo = wo8.astype(jnp.bfloat16) * 0.01

    gb_bf16 = L * (D * F + F * D) * 2  # bytes per step
    gb_int8 = gb_bf16 / 2

    dt = timeit(mlp_bf16, wi, wo)
    print(f"bf16       : {dt*1e3:7.3f} ms/step  ({gb_bf16/dt/1e9:6.1f} GB/s)")
    dt = timeit(mlp_int8_upcast, wi8, wo8, si, so)
    print(f"int8 upcast: {dt*1e3:7.3f} ms/step  ({gb_int8/dt/1e9:6.1f} GB/s eff@int8)")
    dt = timeit(mlp_int8_dyn, wi8, wo8, si, so)
    print(f"int8 dyn   : {dt*1e3:7.3f} ms/step  ({gb_int8/dt/1e9:6.1f} GB/s eff@int8)")

    wq8 = jax.random.randint(key, (L, D, NQ * H), -127, 127, jnp.int8)
    wkv8 = jax.random.randint(key, (L, D, 2 * NKV * H), -127, 127, jnp.int8)
    wo18 = jax.random.randint(key, (L, NQ * H, D), -127, 127, jnp.int8)
    wo28 = jax.random.randint(key, (L, NQ * H, D), -127, 127, jnp.int8)
    proj_bytes = L * (2 * D * NQ * H + D * 2 * NKV * H + 2 * NQ * H * D)
    b_proj = gb_int8 + proj_bytes
    dt = timeit(step_proj, wi8, wo8, wq8, wkv8, wo18, wo28)
    print(f"+projs     : {dt*1e3:7.3f} ms/step  ({b_proj/dt/1e9:6.1f} GB/s eff)")

    kc = jax.random.normal(key, (L, B, T_CACHE, NKV, H), jnp.bfloat16)
    vc = jax.random.normal(key, (L, B, T_CACHE, NKV, H), jnp.bfloat16)
    g = jnp.ones((L, D), jnp.float32)
    b_full = b_proj + 2 * L * B * T_CACHE * NKV * H * 2
    dt = timeit(step_full, wi8, wo8, wq8, wkv8, wo18, wo28, kc, vc, g)
    print(f"+attn+norms: {dt*1e3:7.3f} ms/step  ({b_full/dt/1e9:6.1f} GB/s eff)")


if __name__ == "__main__":
    main()
