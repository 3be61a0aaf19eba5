"""Slope-measured A/B of the real decode step: bf16 vs packed-int8 weights,
unrolled vs scanned layers.

Runs `decode_step` in a fori_loop (cache carried, slot advancing — the real
while_loop regime) and reports the per-step SLOPE between two loop lengths;
single-call timings through the remote axon tunnel are meaningless (dispatch
overhead + block_until_ready not actually waiting — see CLAUDE.md).

    JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/profile_step_ab.py
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lo", type=int, default=64)
    p.add_argument("--hi", type=int, default=256)
    p.add_argument("--cache-len", type=int, default=1024)
    p.add_argument("--cross-len", type=int, default=128)
    p.add_argument("--only", type=str, default=None,
                   help="run a single variant, e.g. int8/scan (for HLO profiling)")
    args = p.parse_args()

    from dia_tts_prune_tpu.config import dia_1_6b_config
    from dia_tts_prune_tpu.models.dia import (
        KVCache,
        decode_step,
        decode_step_scan,
        init_params,
        new_self_cache,
    )
    from dia_tts_prune_tpu.ops.quant import quantize_params_int8_packed

    config = dia_1_6b_config(weight_dtype="bfloat16")
    dtype = jnp.bfloat16
    params = init_params(config, jax.random.PRNGKey(0), dtype)
    params_q = quantize_params_int8_packed(params)
    d = config.data
    dec = config.model.decoder
    B, S = 2, args.cross_len

    ck = jax.random.normal(
        jax.random.PRNGKey(1),
        (dec.n_layer, B, S, dec.cross_query_heads, dec.cross_head_dim), dtype)
    cross = KVCache(k=ck, v=ck * 0.5)
    cmask = jnp.ones((B, 1, 1, S), jnp.bool_)

    def make(step_fn, steps):
        # params passed as an ARGUMENT (matching generate_fused), never a
        # closure constant — closure capture lets XLA constant-fold the
        # int8->bf16 convert at compile time and voids the comparison.
        @partial(jax.jit, donate_argnums=(1,))
        def run(tokens0, cache, pp):
            def body(i, carry):
                tok, cache = carry
                pos = jnp.full((B, 1), i + 1, jnp.int32)
                logits, cache = step_fn(
                    pp, config, tok, pos, i.astype(jnp.int32), cache, cross,
                    cmask, dtype,
                )
                tok = jnp.argmax(logits[:, -1:, :, :], axis=-1).astype(jnp.int32)
                return tok, cache
            tok, cache = jax.lax.fori_loop(0, steps, body, (tokens0, cache))
            return tok
        return run

    results = {}
    from dia_tts_prune_tpu.models.dia import decode_step_fused

    variants = (
        ("bf16/unroll", decode_step, params),
        ("int8/unroll", decode_step, params_q),
        ("bf16/scan", decode_step_scan, params),
        ("int8/scan", decode_step_scan, params_q),
        ("int8/fused", decode_step_fused, params_q),
    )
    if args.only:
        variants = tuple(v for v in variants if v[0] == args.only)
    for name, step_fn, pp in variants:
        times = {}
        for steps in (args.lo, args.hi):
            run = make(step_fn, steps)
            cache = new_self_cache(config, B, max_len=args.cache_len, dtype=dtype)
            tok0 = jnp.full((B, 1, d.channels), 100, jnp.int32)
            np.asarray(run(tok0, cache, pp))  # compile + settle
            best = np.inf
            for _ in range(3):
                cache = new_self_cache(config, B, max_len=args.cache_len, dtype=dtype)
                t0 = time.perf_counter()
                np.asarray(run(tok0, cache, pp))
                best = min(best, time.perf_counter() - t0)
            times[steps] = best
        ms = (times[args.hi] - times[args.lo]) / (args.hi - args.lo) * 1e3
        results[name] = ms
        print(f"{name:12s}: {ms:6.3f} ms/step")
    return results


if __name__ == "__main__":
    main()
