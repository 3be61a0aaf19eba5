"""Continuous-batching benchmark: aggregate throughput + request latency.

Spins a ``ContinuousBatcher`` (cbatch.py) on Dia-1.6B (random weights, the
packed-int8 TPU serving default) and replays an open-loop arrival trace:
``--requests`` requests arriving every ``--arrival-ms``, each wanting
``--steps`` decode steps.  Requests join a running decode at segment
boundaries, so unlike ``bench.py --batch N`` (which measures a pre-formed
batch) this measures the *serving* numbers a user sees:

  - aggregate tokens/s across all lanes (device utilization),
  - per-request latency (submit → codes resolved) p50/p95,
  - admission delay (submit → lane starts decoding) — bounded by one
    segment (= segment_steps × per-step time) plus the request's prefill.

Prints ONE JSON line, bench.py-style.  Run on the TPU:

    python tools/bench_cbatch.py [--slots 4] [--requests 12] [--steps 256]

Replaces-the-reference context: the reference serves requests strictly
sequentially (/root/reference/app.py:221-244); its "throughput" equals its
single-stream RTF.  This tool quantifies what the resident-lane scheduler
adds on top of dia_tts_prune_tpu's own single-stream number.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--slots", type=int, default=4)
    p.add_argument("--requests", type=int, default=12)
    p.add_argument("--steps", type=int, default=256,
                   help="decode steps per request (cap; random weights run to it)")
    p.add_argument("--segment-steps", type=int, default=64)
    p.add_argument("--arrival-ms", type=float, default=250.0,
                   help="open-loop inter-arrival gap")
    p.add_argument("--saturate", action="store_true",
                   help="saturated offered load: all requests submitted at "
                        "t=0 and at least 4x slots of them, so lanes stay "
                        "full — separates lane-vacancy loss from scheduling "
                        "overhead vs the preformed-batch ceiling")
    p.add_argument("--int8", action=argparse.BooleanOptionalAction, default=None,
                   help="packed int8 decoder weights (default: on for TPU)")
    p.add_argument("--int4", type=str, default=None, choices=["full", "hybrid"],
                   help="packed int4 decoder weights (grouped S4 serving "
                        "path); overrides --int8")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--temperature", type=float, default=1.3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true", help="tiny config smoke run")
    args = p.parse_args(argv)
    if args.saturate:
        args.arrival_ms = 0.0
        args.requests = max(args.requests, 4 * args.slots)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    import jax.numpy as jnp

    from dia_tts_prune_tpu.cbatch import ContinuousBatcher
    from dia_tts_prune_tpu.config import dia_1_6b_config, tiny_test_config
    from dia_tts_prune_tpu.generate import DiaGenerator
    from dia_tts_prune_tpu.models.dia import init_params, param_count

    config = tiny_test_config() if args.tiny else dia_1_6b_config(weight_dtype=args.dtype)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params = init_params(config, jax.random.PRNGKey(args.seed), dtype)
    n_params = param_count(params)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    want_int8 = (args.int4 is None and
                 (args.int8 if args.int8 is not None else (on_tpu and not args.tiny)))
    if args.int4 is not None:
        from dia_tts_prune_tpu.ops.quant import (
            quantize_params_int4_packed,
            quantize_params_int8_packed,
        )

        if args.int4 == "full":
            params = quantize_params_int4_packed(params, nibble=True, halfsplit=True)
        else:
            params = quantize_params_int8_packed(
                quantize_params_int4_packed(params, mlp_only=True, nibble=True,
                                            halfsplit=True), fused=False)
    elif want_int8:
        from dia_tts_prune_tpu.ops.quant import quantize_params_int8_packed

        params = quantize_params_int8_packed(params)

    class _Dia:  # the slice of api.Dia the batcher consumes
        pass

    dia = _Dia()
    dia.config = config
    dia.params = params
    dia.compute_dtype = args.dtype if args.tiny else "bfloat16"
    dia.generator = DiaGenerator(params, config, dia.compute_dtype)

    max_tokens = min(args.steps + config.data.max_delay + 2,
                     config.data.audio_length)
    cb = ContinuousBatcher(dia, n_slots=args.slots,
                           segment_steps=args.segment_steps,
                           max_tokens=max_tokens)

    # Warmup: compile prepare_stream / swap_in / cb_segment once (remote
    # compiles cost minutes; exclude them from the trace)
    cb.submit("[S1] warmup.", temperature=args.temperature,
              seed=1, max_tokens=min(48, max_tokens)).result(1800)
    cb.stats.update(segments=0, max_live=0,
                    lane_segments_occupied=0, lane_segments_capacity=0)

    texts = [f"[S1] Request {i}: the quick brown fox jumps over the lazy dog. "
             f"[S2] Benchmark stream number {i}." for i in range(args.requests)]
    lat: dict[int, float] = {}
    rows: dict[int, int] = {}
    lock = threading.Lock()

    def fire(i: int):
        t0 = time.perf_counter()
        codes = cb.submit(texts[i], temperature=args.temperature,
                          seed=args.seed + i).result(3600)
        dt = time.perf_counter() - t0
        with lock:
            lat[i] = dt
            rows[i] = codes.shape[0] + config.data.max_delay

    t_start = time.perf_counter()
    threads = []
    for i in range(args.requests):
        th = threading.Thread(target=fire, args=(i,))
        th.start()
        threads.append(th)
        time.sleep(args.arrival_ms / 1000.0)
    for th in threads:
        th.join()
    wall = time.perf_counter() - t_start
    cb.shutdown()

    total_rows = sum(rows.values())
    lats = sorted(lat.values())
    p50 = lats[len(lats) // 2]
    p95 = lats[min(len(lats) - 1, int(len(lats) * 0.95))]
    dac_rate = 44100.0 / 512.0
    print(json.dumps({
        "metric": ("CB_tokens_per_sec_tiny" if args.tiny
                   else "CB_tokens_per_sec_dia1.6b_1chip"),
        "value": round(total_rows / wall, 2),
        "unit": "tokens_per_sec_aggregate",
        "vs_baseline": round((total_rows / wall) / dac_rate / 2.1, 4),
        "rtf_aggregate": round(total_rows / wall / dac_rate, 4),
        "requests": args.requests,
        "slots": args.slots,
        "segment_steps": args.segment_steps,
        "steps_per_request": args.steps,
        "arrival_ms": args.arrival_ms,
        "latency_p50_s": round(p50, 3),
        "latency_p95_s": round(p95, 3),
        "wall_seconds": round(wall, 3),
        "segments": cb.stats["segments"],
        "max_live": cb.stats["max_live"],
        "lane_occupancy": round(
            cb.stats["lane_segments_occupied"]
            / max(1, cb.stats["lane_segments_capacity"]), 4),
        "saturate": bool(args.saturate),
        "int8": bool(want_int8),
        "int4": args.int4,
        "params": n_params,
        "device": str(jax.devices()[0]),
        "weights": "random",
    }))


if __name__ == "__main__":
    main()
