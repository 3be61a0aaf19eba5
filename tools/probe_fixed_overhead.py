"""Decompose the fixed (per-call) overhead of a fused generate dispatch.

bench.py's RTF includes a fixed ~80 ms per call on the remote-attached TPU
(slope math between two run lengths).  This probe splits it:

  host-prep   tokenize + template build + arg packing (pure host)
  dispatch    jit call until the async result futures return
  compute     block_until_ready minus steps*slope (encoder + prefill +
              loop-entry cost + transfer-in)
  fetch       jax.device_get of (tokens buffer, final_step) — tunnel RTT + bytes

Also times raw tunnel primitives: a no-op dispatch+fetch round trip and a
device_get of the [3072, 9] int32 tokens buffer, so RTT and bandwidth are
separable.

Run:  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/probe_fixed_overhead.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def best_of(fn, n=5):
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3  # ms


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from dia_tts_prune_tpu.config import dia_1_6b_config
    from dia_tts_prune_tpu.generate import generate_fused, _kv_cache_quant
    from dia_tts_prune_tpu.models.dia import init_params
    from dia_tts_prune_tpu.ops.quant import quantize_params_int8_packed
    from dia_tts_prune_tpu.tokenizer import build_effective_text, encode_cfg_batch
    from dia_tts_prune_tpu.state import prepare_audio_prompt

    config = dia_1_6b_config(weight_dtype="bfloat16")
    d = config.data
    params = quantize_params_int8_packed(
        init_params(config, jax.random.PRNGKey(0), jnp.bfloat16))

    text = ("[S1] This is a benchmark of the TPU native Dia text to speech system. "
            "[S2] It measures the realtime factor of autoregressive codec token generation. "
            "[S1] The quick brown fox jumps over the lazy dog.")

    # ---- tunnel primitives ------------------------------------------------
    one = jnp.zeros((), jnp.int32)
    trivial = jax.jit(lambda x: x + 1)
    np.asarray(trivial(one))  # compile
    rtt = best_of(lambda: np.asarray(trivial(one)))
    buf = jnp.zeros((d.audio_length, d.channels), jnp.int32)
    jax.block_until_ready(buf)
    fetch_buf = best_of(lambda: jax.device_get(buf))
    up = np.zeros((d.audio_length, d.channels), np.int32)
    upload = best_of(lambda: jax.block_until_ready(jnp.asarray(up)))
    print(f"noop dispatch+fetch : {rtt:7.2f} ms")
    print(f"fetch [3072,9] i32  : {fetch_buf:7.2f} ms")
    print(f"upload [3072,9] i32 : {upload:7.2f} ms", flush=True)

    # ---- staged generate call at two lengths ------------------------------
    def staged(steps):
        max_tokens = steps + d.max_delay + 2
        cache_len = 1024
        t0 = time.perf_counter()
        effective = build_effective_text(text, None)
        enc = encode_cfg_batch(effective, d.text_length, d.text_pad_value)
        delayed, prefill_step = prepare_audio_prompt(config, None)
        tbuf = np.full((d.audio_length, d.channels), -1, np.int32)
        tbuf[: delayed.shape[0]] = delayed
        int_args = np.asarray([prefill_step, max_tokens, 1], np.int32)
        float_args = np.asarray([3.0, 1.3, 0.95], np.float32)
        t1 = time.perf_counter()
        toks, fstep = generate_fused(
            params, config, jnp.asarray(enc), jnp.asarray(tbuf),
            jnp.asarray(int_args), jnp.asarray(float_args),
            prefill_window=None, greedy=False, cfg_filter_top_k=35,
            compute_dtype_name="bfloat16",
            cross_window=256, cache_len=cache_len,
            kv_quant=_kv_cache_quant(params))
        t2 = time.perf_counter()
        jax.block_until_ready(toks)
        t3 = time.perf_counter()
        jax.device_get((toks, fstep))
        t4 = time.perf_counter()
        return np.asarray([t1 - t0, t2 - t1, t3 - t2, t4 - t3]) * 1e3

    for steps in (32, 32):  # warm compile, then discard
        staged(steps)
    lo, hi = 32, 288
    best = {s: None for s in (lo, hi)}
    for _ in range(4):
        for s in (lo, hi):
            r = staged(s)
            if best[s] is None or r.sum() < best[s].sum():
                best[s] = r
    slope = (best[hi].sum() - best[lo].sum()) / (hi - lo)
    print(f"\nphases [host, dispatch, compute-wait, fetch] (ms):")
    for s in (lo, hi):
        print(f"  steps={s:4d}: {np.round(best[s], 2).tolist()}  total={best[s].sum():.1f}")
    fixed = best[lo].sum() - lo * slope
    print(f"slope {slope:.3f} ms/step; fixed-per-call {fixed:.1f} ms")
    print(json.dumps({"tool": "probe_fixed_overhead",
                      "noop_rtt_ms": round(rtt, 2),
                      "fetch_tokens_ms": round(fetch_buf, 2),
                      "upload_tokens_ms": round(upload, 2),
                      "phases_lo": np.round(best[lo], 2).tolist(),
                      "phases_hi": np.round(best[hi], 2).tolist(),
                      "ms_per_step": round(float(slope), 4),
                      "fixed_ms": round(float(fixed), 1)}))


if __name__ == "__main__":
    main()
