"""Streaming-generation latency/throughput benchmark (1.6B, TPU).

Measures what a live-playback client sees from
``DiaGenerator.generate_tokens_stream`` under the packed-int8 serving
default: time to the first finalized chunk, inter-chunk cadence, audio
seconds carried per chunk, and the aggregate RTF of the streamed run —
the numbers behind docs/PERF.md's "Streaming generation" row.

Prints ONE JSON line, bench.py-style.  Run on the TPU:

    JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/bench_stream.py \
        [--segment-steps 64] [--steps 512]

Replaces-the-reference context: the reference has no streaming at all — its
app returns whole WAV files per chunked batch (/root/reference/app.py:206-268).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

FRAMES_PER_SEC = 86.13  # 44.1 kHz DAC codec frame rate


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--segment-steps", type=int, default=64)
    p.add_argument("--steps", type=int, default=512)
    p.add_argument("--int8", action=argparse.BooleanOptionalAction, default=None)
    p.add_argument("--temperature", type=float, default=1.3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    from dia_tts_prune_tpu.config import dia_1_6b_config
    from dia_tts_prune_tpu.generate import DiaGenerator
    from dia_tts_prune_tpu.models.dia import init_params
    from dia_tts_prune_tpu.ops.quant import quantize_params_int8_packed

    on_tpu = jax.default_backend() in ("tpu", "axon")
    use_int8 = on_tpu if args.int8 is None else args.int8
    config = dia_1_6b_config(weight_dtype="bfloat16")
    params = init_params(config, jax.random.PRNGKey(0), jnp.bfloat16)
    if use_int8:
        params = quantize_params_int8_packed(params)
    gen = DiaGenerator(params, config, "bfloat16")

    text = ("[S1] This is a benchmark of streaming text to speech generation. "
            "[S2] Chunks of audio should arrive faster than they play back. "
            "[S1] The quick brown fox jumps over the lazy dog.")

    def run():
        t0 = time.perf_counter()
        arrivals, sizes = [], []
        for chunk in gen.generate_tokens_stream(
                text, segment_steps=args.segment_steps, max_tokens=args.steps,
                temperature=args.temperature, seed=args.seed):
            arrivals.append(time.perf_counter() - t0)
            sizes.append(int(chunk.shape[0]))
        return arrivals, sizes

    run()  # warm the compile caches (prepare_stream + decode_segment)
    best = None
    for _ in range(3):
        arrivals, sizes = run()
        if arrivals and (best is None or arrivals[-1] < best[0][-1]):
            best = (arrivals, sizes)
    arrivals, sizes = best
    total_frames = sum(sizes)
    wall = arrivals[-1]
    gaps = [b - a for a, b in zip(arrivals, arrivals[1:])]
    audio_per_chunk = [s / FRAMES_PER_SEC for s in sizes]
    # a client can play continuously iff every chunk arrives before the
    # audio already delivered has finished playing
    deficit = max(
        (arr - sum(audio_per_chunk[:i]) for i, arr in enumerate(arrivals)),
        default=0.0)
    print(json.dumps({
        "metric": "stream_rtf_dia1.6b_1chip",
        "value": round(total_frames / FRAMES_PER_SEC / wall, 4),
        "unit": "x_realtime_aggregate",
        "first_chunk_s": round(arrivals[0], 3),
        "mean_gap_s": round(sum(gaps) / len(gaps), 3) if gaps else None,
        "max_gap_s": round(max(gaps), 3) if gaps else None,
        "audio_s_per_chunk": round(sum(audio_per_chunk) / len(sizes), 3),
        "chunks": len(sizes),
        "frames": total_frames,
        "wall_seconds": round(wall, 3),
        "startup_deficit_s": round(deficit, 3),
        "segment_steps": args.segment_steps,
        "int8": bool(use_int8),
        "device": str(jax.devices()[0]),
        "weights": "random",
    }))


if __name__ == "__main__":
    main()
