"""Attribute the generate-loop's per-step overhead above the bare decode step.

Motivation: the bare chained ``decode_step_scan`` measures ~2.0 ms/step
(tools/spec_cost.py) while the full ``generate_fused`` loop measures
~2.29 ms/step (bench.py slope) at the same cache/quant config — ~0.29 ms/step
(13%) of loop-body cost beyond the decode step itself.  Crossing the RTF 5.0
north star needs ≤2.22 ms/step, so this gap IS the remaining mile.

Measures four variants at identical config (1.6B packed-int8 weights, int8 KV
caches, skip-uncond-cross, cache bucket 1024, cross bucket 256) as the slope
between two trip counts (fixed dispatch overhead cancels):

  bare-fixed   fori(decode_step_scan), constant input token (no feedback;
               logits reduced into the carry so the head isn't DCE'd)
  bare-argmax  same + argmax(logits) token feedback (the real serial tail:
               embed(t+1) depends on head(t))
  loop-greedy  the REAL ``_decode_loop_core`` (while_loop + CFG + constraints
               + EOS machine + BOS-masked write), greedy
  loop-sampled same, temperature 1.3 / top-k 35 / top-p 0.95 (bench config)

Deltas attribute: feedback serialization, loop machinery, sampling.

Run:  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/loop_overhead.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time
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
    p.add_argument("--cross-len", type=int, default=256)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from dia_tts_prune_tpu.config import dia_1_6b_config, tiny_test_config
    from dia_tts_prune_tpu.generate import _decode_loop_core, _quantize_cross
    from dia_tts_prune_tpu.models.dia import KVCache, decode_step_scan, init_params, new_self_cache
    from dia_tts_prune_tpu.ops.quant import quantize_params_int8_packed

    config = tiny_test_config() if args.tiny else dia_1_6b_config(weight_dtype="bfloat16")
    d = config.data
    dec = config.model.decoder
    dtype = jnp.bfloat16
    B = 2
    S = min(args.cross_len, d.text_length)
    cache_len = min(args.cache_len, d.audio_length)

    params = quantize_params_int8_packed(
        init_params(config, jax.random.PRNGKey(0), dtype))

    ck = jax.random.normal(
        jax.random.PRNGKey(1),
        (dec.n_layer, B, S, dec.cross_query_heads, dec.cross_head_dim), dtype)
    cross_bf16 = KVCache(k=ck, v=ck * 0.5)
    cross = _quantize_cross(cross_bf16, True)
    # production mask shape: uncond row fully masked, cond row fully valid
    cmask = jnp.concatenate(
        [jnp.zeros((1, 1, 1, S), jnp.bool_), jnp.ones((1, 1, 1, S), jnp.bool_)])

    def fresh_cache():
        return new_self_cache(config, B, dtype=dtype, max_len=cache_len, quant=True)

    def slope(run, init_extra=()):  # run(steps, cache, *extra) -> jax value
        times = {}
        for steps in (args.lo, args.hi):
            np.asarray(jax.block_until_ready(run(steps, fresh_cache(), *init_extra)))
            best = np.inf
            for _ in range(args.repeats):
                c = fresh_cache()
                t0 = time.perf_counter()
                jax.block_until_ready(run(steps, c, *init_extra))
                best = min(best, time.perf_counter() - t0)
            times[steps] = best
        return (times[args.hi] - times[args.lo]) / (args.hi - args.lo) * 1e3

    # ---- bare variants: fori over decode_step_scan ------------------------
    def make_bare(feedback: bool):
        @jax.jit
        def run(steps, cache):
            tok0 = jnp.full((B, 1, d.channels), 100, jnp.int32)

            def body(i, carry):
                tok, cache, acc = carry
                pos = jnp.full((B, 1), i + 1, jnp.int32)
                logits, cache = decode_step_scan(
                    params, config, tok, pos, i.astype(jnp.int32), cache,
                    cross, cmask, dtype, skip_uncond_cross=True)
                if feedback:
                    tok = jnp.argmax(logits[:, -1:, :, :], -1).astype(jnp.int32)
                    acc = acc + tok[0, 0, 0]
                else:
                    acc = acc + logits[0, 0, 0, 0].astype(jnp.float32).astype(jnp.int32)
                return tok, cache, acc

            _, _, acc = jax.lax.fori_loop(
                0, steps, body, (tok0, cache, jnp.int32(0)))
            return acc

        return run

    # ---- real loop: _decode_loop_core as generate_fused calls it ----------
    def make_loop(greedy: bool):
        tokens_buf = np.full((args.hi + d.max_delay + 4, d.channels), -1, np.int32)
        tokens_buf[0] = d.audio_bos_value
        tokens_buf = jnp.asarray(tokens_buf)

        @jax.jit
        def run(steps, cache, buf):
            toks, dec_step = _decode_loop_core(
                params, config, buf, cache, cross, cmask,
                jax.random.PRNGKey(7), jnp.int32(1),
                steps + d.max_delay + 2,
                jnp.float32(3.0), jnp.float32(1.3), jnp.float32(0.95),
                greedy, 35, dtype)
            return dec_step

        return run, (tokens_buf,)

    results = {}
    for name, mk in (
        ("bare-fixed", lambda: (make_bare(False), ())),
        ("bare-argmax", lambda: (make_bare(True), ())),
        ("loop-greedy", lambda: make_loop(True)),
        ("loop-sampled", lambda: make_loop(False)),
    ):
        run, extra = mk()
        ms = slope(run, extra)
        results[name] = round(ms, 4)
        print(f"{name:12s}: {ms:6.3f} ms/step", flush=True)

    print(json.dumps({"tool": "loop_overhead", "cache_len": cache_len,
                      "cross_len": S, "lo": args.lo, "hi": args.hi,
                      "ms_per_step": results}))


if __name__ == "__main__":
    main()
