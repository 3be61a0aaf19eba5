"""Decode-step ablation microbenchmark.

Times the per-token decode step of Dia-1.6B on the local accelerator and
ablates components (self-attn cache length, cross-attn, MLP, logits head) to
attribute the per-step milliseconds.  Run on the TPU:

    python tools/profile_decode.py [--layers N] [--iters K]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=50, warmup=3, donate_idx=None):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--dtype", type=str, default="bfloat16")
    args = p.parse_args()

    from dia_tts_prune_tpu.config import dia_1_6b_config
    from dia_tts_prune_tpu.models.dia import (
        KVCache,
        decode_step,
        init_params,
        new_self_cache,
    )

    config = dia_1_6b_config(weight_dtype=args.dtype)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params = init_params(config, jax.random.PRNGKey(0), dtype)
    d = config.data
    dec = config.model.decoder
    B, S = 2, d.text_length

    cache = new_self_cache(config, B, dtype=dtype)
    ck = jnp.zeros((dec.n_layer, B, S, dec.cross_query_heads, dec.cross_head_dim), dtype)
    cross = KVCache(k=ck, v=jnp.zeros_like(ck))
    cmask = jnp.ones((B, 1, 1, S), jnp.bool_)
    tokens = jnp.full((B, 1, d.channels), 100, jnp.int32)
    pos = jnp.full((B, 1), 500, jnp.int32)
    slot = jnp.asarray(499, jnp.int32)

    full = jax.jit(
        lambda p, t, ps, sl, c: decode_step(p, config, t, ps, sl, c, cross, cmask, dtype),
        donate_argnames=("c",),
    )
    # measure with fresh cache each call is wrong (donation); time via loop of
    # chained calls instead:
    def chain(p, t, ps, sl, c, n):
        def body(i, c):
            logits, c = decode_step(p, config, t, ps, sl, c, cross, cmask, dtype)
            return c
        c = jax.lax.fori_loop(0, n, body, c)
        return c

    n = jnp.asarray(args.iters)
    chained = jax.jit(chain, static_argnames=(), donate_argnames=("c",))
    # warmup+time
    c1 = chained(params, tokens, pos, slot, cache, 2)
    jax.block_until_ready(c1)
    t0 = time.perf_counter()
    c2 = chained(params, tokens, pos, slot, c1, jnp.asarray(200))
    jax.block_until_ready(c2)
    per_step = (time.perf_counter() - t0) / 200
    print(f"full decode_step: {per_step * 1e3:.3f} ms/step  "
          f"({1.0 / per_step:.1f} steps/s, RTF {1.0 / per_step / 86.13:.2f})")

    # --- ablations: time individual pieces standalone ---------------------
    # NOTE: standalone per-op timings through a remote-attached TPU are
    # dispatch-dominated; use the chained number above for real per-step cost.
    from dia_tts_prune_tpu.ops.modules import (
        attention_out,
        attention_qkv,
        dense_general,
        mlp_block,
        rms_norm,
        rope,
        sdpa,
    )

    m = config.model
    x = jnp.ones((B, 1, dec.n_embd), dtype)
    lp = jax.tree.map(lambda a: a[0], params["decoder"]["layers"])

    def bench_op(name, fn, *a):
        jfn = jax.jit(fn)
        dt = timeit(jfn, *a, iters=args.iters)
        print(f"  {name:28s}: {dt * 1e6:9.1f} us  (x18 layers = {dt * 18 * 1e3:.3f} ms)")
        return dt

    bench_op("self qkv proj+rope", lambda x: attention_qkv(
        lp["self_attention"], x, x, pos, pos, m.rope_min_timescale, m.rope_max_timescale), x)

    k1 = jnp.zeros((B, 1, dec.kv_heads, dec.gqa_head_dim), dtype)
    q1 = jnp.zeros((B, 1, dec.gqa_query_heads, dec.gqa_head_dim), dtype)
    fresh = new_self_cache(config, B, dtype=dtype)  # cache above was donated
    kc = fresh.k[0]
    vc = fresh.v[0]
    slot_mask = (jnp.arange(d.audio_length) <= 500)[None, None, None, :]
    bench_op("self attn over 3072 cache", lambda q, kc, vc: sdpa(q, kc, vc, slot_mask), q1, kc, vc)
    bench_op("self o_proj", lambda a: attention_out(lp["self_attention"], a), q1)

    cq = jnp.zeros((B, 1, dec.cross_query_heads, dec.cross_head_dim), dtype)
    bench_op("cross q proj", lambda x: dense_general(x, lp["cross_attention"]["q_proj"]["kernel"]), x)
    bench_op("cross attn over 1024 enc", lambda q: sdpa(q, cross.k[0], cross.v[0], cmask), cq)
    bench_op("cross o_proj", lambda a: attention_out(lp["cross_attention"], a), cq)

    bench_op("mlp (2048->2x8192->2048)", lambda x: mlp_block(lp["mlp"], x), x)
    bench_op("rms_norm", lambda x: rms_norm(x, lp["pre_sa_norm"]["scale"], 1e-5), x)

    bench_op("logits head", lambda x: dense_general(x, params["decoder"]["logits_dense"]["kernel"]), x)

    emb = params["decoder"]["embeddings"]["embedding"]
    from dia_tts_prune_tpu.models.dia import _embed_channels

    bench_op("channel embeddings", lambda t: _embed_channels(params, t, dtype), tokens)

    # cache write cost
    def cache_write(c):
        k = jnp.ones((1, B, 1, dec.kv_heads, dec.gqa_head_dim), dtype)
        nk = jax.lax.dynamic_update_slice(c.k, k, (0, 0, 500, 0, 0))
        nv = jax.lax.dynamic_update_slice(c.v, k, (0, 0, 500, 0, 0))
        return KVCache(nk, nv)

    jfn = jax.jit(cache_write, donate_argnames=("c",))
    c = new_self_cache(config, B, dtype=dtype)
    c = jfn(c)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        c = jfn(c)
    jax.block_until_ready(c)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"  {'full-cache donated write':28s}: {dt * 1e6:9.1f} us")


if __name__ == "__main__":
    main()
