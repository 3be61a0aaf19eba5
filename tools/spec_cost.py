"""Speculative-decoding cost model: measure draft-step and verify-window
costs so the real-weight speedup is a plug-in-α formula.

Acceptance *rates* on random weights are meaningless (near-uniform logits
make the draft disagree with the full model almost every step), but the
COSTS are weight-bandwidth numbers that do not depend on the weights'
values.  This tool measures, on the real 1.6B decode path:

* full decode step cost  F  (the baseline per-token cost),
* draft step cost        D(Ld)  for early-exit depths Ld,
* verify window cost     V(W)   for window sizes W (one pass scores W-1
  drafts + 1 bonus).

Speedup model (per-draft acceptance probability a, window W):
  expected accepted tokens/window  E(a, W) = sum_{i<W-1} a^i + a^(W-1)
      (j matched drafts then one correction/bonus — standard leapfrog)
  speculative cost/token = [ (W-1)·D + V(W) ] / E(a, W)
  speedup vs baseline    = F · E(a, W) / [ (W-1)·D + V(W) ]

Run:  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/spec_cost.py
"""

from __future__ import annotations

import argparse
import json
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
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--lo", type=int, default=32)
    p.add_argument("--hi", type=int, default=128)
    p.add_argument("--cache-len", type=int, default=1024)
    p.add_argument("--cross-len", type=int, default=128)
    p.add_argument("--int8", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--drafts", type=int, nargs="+", default=[2, 4, 6])
    p.add_argument("--windows", type=int, nargs="+", default=[4, 8, 16])
    args = p.parse_args()

    import os

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    from dia_tts_prune_tpu.config import dia_1_6b_config, tiny_test_config
    from dia_tts_prune_tpu.models.dia import (
        KVCache, decode_step_scan, decode_window, init_params, new_self_cache,
    )
    from dia_tts_prune_tpu.ops.quant import quantize_params_int8_packed

    if args.tiny:
        config = tiny_test_config()
        args.cache_len = min(args.cache_len, config.data.audio_length)
        args.cross_len = min(args.cross_len, config.data.text_length)
        args.lo, args.hi = 4, 12
    else:
        config = dia_1_6b_config(weight_dtype="bfloat16")
    dtype = jnp.bfloat16 if not args.tiny else jnp.float32
    cdt = dtype
    params = init_params(config, jax.random.PRNGKey(0), dtype)
    if args.int8 and not args.tiny:
        params = quantize_params_int8_packed(params, fused=False)
    d = config.data
    dec = config.model.decoder
    B, S = 2, args.cross_len

    ck = jax.random.normal(
        jax.random.PRNGKey(1),
        (dec.n_layer, B, S, dec.cross_query_heads, dec.cross_head_dim), dtype)
    cross = KVCache(k=ck, v=ck * 0.5)
    cmask = jnp.ones((B, 1, 1, S), jnp.bool_)

    def slope_ms(make_run, lo=None, hi=None):
        """Best-of-3 per-iteration cost from the (lo, hi) iteration slope."""
        times = {}
        for iters in (lo or args.lo, hi or args.hi):
            run = make_run(iters)
            cache = new_self_cache(config, B, max_len=args.cache_len, dtype=cdt)
            np.asarray(jax.block_until_ready(run(cache, params)))
            best = np.inf
            for _ in range(3):
                cache = new_self_cache(config, B, max_len=args.cache_len, dtype=cdt)
                t0 = time.perf_counter()
                np.asarray(jax.block_until_ready(run(cache, params)))
                best = min(best, time.perf_counter() - t0)
            times[iters] = best
        ks = sorted(times)
        return (times[ks[1]] - times[ks[0]]) / (ks[1] - ks[0]) * 1e3

    def make_step_run(n_layers):
        def make(iters):
            @jax.jit
            def run(cache, pp):
                tok0 = jnp.full((B, 1, d.channels), 100, jnp.int32)

                def body(i, carry):
                    tok, cache = carry
                    pos = jnp.full((B, 1), i + 1, jnp.int32)
                    logits, cache = decode_step_scan(
                        pp, config, tok, pos, i.astype(jnp.int32), cache, cross,
                        cmask, cdt, n_layers=n_layers)
                    tok = jnp.argmax(logits[:, -1:, :, :], -1).astype(jnp.int32)
                    return tok, cache

                tok, _ = jax.lax.fori_loop(0, iters, body, (tok0, cache))
                return tok
            return run
        return make

    def make_window_run(W):
        def make(iters):
            @jax.jit
            def run(cache, pp):
                rows0 = jnp.full((B, W, d.channels), 100, jnp.int32)

                def body(i, carry):
                    rows, cache = carry
                    logits, cache = decode_window(
                        pp, config, rows, (i * W).astype(jnp.int32), cache,
                        cross, cmask, cdt)
                    rows = jnp.argmax(logits, -1).astype(jnp.int32)
                    return rows, cache

                rows, _ = jax.lax.fori_loop(0, iters, body, (rows0, cache))
                return rows
            return run
        return make

    out = {"metric": "spec_decode_costs_ms",
           "config": "tiny" if args.tiny else "dia1.6b",
           "int8": bool(args.int8 and not args.tiny),
           "cache_len": args.cache_len}
    F = slope_ms(make_step_run(None))
    out["full_step_ms"] = round(F, 3)
    for ld in args.drafts:
        if ld < dec.n_layer:
            out[f"draft_step_ms_L{ld}"] = round(slope_ms(make_step_run(ld)), 3)
    for w in args.windows:
        # window positions advance W per iteration — cap so i*W never clamps
        # at the cache end (clamped write slots change the bucketed-prefix
        # work and corrupted the first W16 measurement)
        w_hi = min(args.hi, args.cache_len // w - 1)
        w_lo = min(args.lo, max(4, w_hi // 4))
        out[f"verify_window_ms_W{w}"] = round(
            slope_ms(make_window_run(w), lo=w_lo, hi=w_hi), 3)

    # plug-in-α table: speedup at representative acceptance probabilities
    def expected_tokens(a, W):
        return sum(a ** i for i in range(W - 1)) + a ** (W - 1)

    table = {}
    for ld in args.drafts:
        dk = f"draft_step_ms_L{ld}"
        if dk not in out:
            continue
        for w in args.windows:
            vk = f"verify_window_ms_W{w}"
            cost = (w - 1) * out[dk] + out[vk]
            for a in (0.6, 0.8, 0.9):
                spd = F * expected_tokens(a, w) / cost
                table[f"speedup_L{ld}_W{w}_a{a}"] = round(spd, 3)
    out["speedup_table"] = table
    print(json.dumps(out))


if __name__ == "__main__":
    main()
