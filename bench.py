"""Benchmark: Dia-1.6B generation realtime factor on the local accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Metric: RTF (generated audio seconds per wall second) for bf16 Dia-1.6B
single-stream generation (CFG pair, device-resident decode loop), measured on
the decode loop after compilation.  Baseline: the reference's published bf16
RTF ≈ 2.1 on an RTX 4090 with torch.compile (BASELINE.md).

Audio seconds per decode step = 1/86.13 (44.1 kHz DAC, hop 512).

Usage:
  python bench.py                # full 1.6B bf16 on the available accelerator
  python bench.py --tiny        # tiny config smoke run (CI/CPU)
  python bench.py --steps 512   # timed decode steps
"""

from __future__ import annotations

import argparse
import json
import os
import time

DAC_FRAME_RATE = 44100.0 / 512.0  # ≈ 86.13 codec frames / second of audio
BASELINE_RTF_BF16 = 2.1  # reference README.md:220-225 (RTX 4090, torch.compile)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true", help="tiny config smoke run")
    parser.add_argument("--steps", type=int, default=768, help="timed decode steps")
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--temperature", type=float, default=1.3)
    parser.add_argument("--top-k", type=int, default=35)
    parser.add_argument("--int8", action=argparse.BooleanOptionalAction, default=None,
                        help="packed int8 weights (weight-only, upcast-in-dot). "
                        "Default: ON for TPU backends (measured 32%% faster than "
                        "bf16 — docs/PERF.md), OFF elsewhere. --no-int8 opts out.")
    parser.add_argument("--batch", type=int, default=1,
                        help="N independent streams decoded in one batched loop")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax

    # persistent compile cache: first-compile of the fused generate program
    # costs minutes on remote-attached TPUs; later runs hit the cache
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    import jax.numpy as jnp

    from dia_tts_prune_tpu.config import dia_1_6b_config, tiny_test_config
    from dia_tts_prune_tpu.generate import DiaGenerator
    from dia_tts_prune_tpu.models.dia import init_params, param_count

    if args.tiny:
        config = tiny_test_config()
        steps = min(args.steps, config.data.audio_length - 32)
    else:
        config = dia_1_6b_config(weight_dtype=args.dtype)
        steps = min(args.steps, config.data.audio_length - 32)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params = init_params(config, jax.random.PRNGKey(args.seed), dtype)
    n_params = param_count(params)  # model size; int8 packing adds derived arrays
    if args.int8 is None:
        # serving default: int8 weights win on TPU (3.10 vs 4.09 ms/step e2e);
        # CPU/tests keep bf16 (no bandwidth argument there)
        args.int8 = jax.default_backend() in ("tpu", "axon") and not args.tiny
    if args.int8:
        from dia_tts_prune_tpu.ops.quant import quantize_params_int8_packed

        params = quantize_params_int8_packed(params)
    gen = DiaGenerator(params, config, args.dtype)

    text = (
        "[S1] This is a benchmark of the TPU native Dia text to speech system. "
        "[S2] It measures the realtime factor of autoregressive codec token generation. "
        "[S1] The quick brown fox jumps over the lazy dog."
    )

    texts = [text] * args.batch if args.batch > 1 else None

    # Warmup: compiles prepare + decode loop.  max_tokens is a traced scalar
    # but the self-cache length bucket is static — pin cache_len to the timed
    # run's bucket so warmup compiles the same executable.
    max_tokens = steps + config.data.max_delay + 2
    warmup_tokens = 32 + config.data.max_delay + 2
    if texts:
        gen.generate_tokens_batch(texts, max_tokens=warmup_tokens,
                                  temperature=args.temperature,
                                  cfg_filter_top_k=args.top_k, seed=1,
                                  cache_len=max_tokens)
    else:
        gen.generate_tokens(text, max_tokens=warmup_tokens, temperature=args.temperature,
                            cfg_filter_top_k=args.top_k, seed=1,
                            cache_len=max_tokens)

    # Timed run. Random weights never sample EOS in channel 0 spontaneously
    # (vocab 1028), so the loop runs to the near-max trigger — a stable,
    # worst-case-length measurement.
    t0 = time.perf_counter()
    if texts:
        outs = gen.generate_tokens_batch(texts, max_tokens=max_tokens,
                                         temperature=args.temperature,
                                         cfg_filter_top_k=args.top_k, seed=args.seed,
                                         cache_len=max_tokens)
        out = outs[0]
        gen_rows = sum(o.shape[0] for o in outs) + args.batch * config.data.max_delay
    else:
        out = gen.generate_tokens(text, max_tokens=max_tokens, temperature=args.temperature,
                                  cfg_filter_top_k=args.top_k, seed=args.seed)
        gen_rows = out.shape[0] + config.data.max_delay
    dt = time.perf_counter() - t0

    # aggregate steps executed across streams (+ trimmed delay tails)
    gen_steps = gen_rows
    tokens_per_sec = gen_steps / dt
    rtf = tokens_per_sec / DAC_FRAME_RATE

    # time-to-first-audio proxy: a minimal-length generate call (includes
    # conditioning, compile-cache hit, transfers, and the first audio frames);
    # only meaningful for the single-stream path (the batch warmup compiled a
    # different executable)
    if args.batch > 1:
        ttfa = None
    else:
        t1 = time.perf_counter()
        gen.generate_tokens(text, max_tokens=8 + config.data.max_delay + 2,
                            temperature=args.temperature, cfg_filter_top_k=args.top_k,
                            seed=2, cache_len=max_tokens)
        ttfa = time.perf_counter() - t1

    result = {
        "metric": (
            "RTF_tiny_smoke" if args.tiny
            else ("RTF_int8_dia1.6b_1chip" if args.int8 else "RTF_bf16_dia1.6b_1chip")
            + (f"_batch{args.batch}" if args.batch > 1 else "")
        ),
        "value": round(rtf, 4),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / BASELINE_RTF_BF16, 4),
        "tokens_per_sec": round(tokens_per_sec, 2),
        "decode_steps": int(gen_steps),
        "wall_seconds": round(dt, 3),
        "params": n_params,
        "device": str(jax.devices()[0]),
        "dtype": args.dtype,
        "temperature": args.temperature,
        "ttfa_seconds": round(ttfa, 3) if ttfa is not None else None,
        "batch": args.batch,
        # random init — the published 1.6B weights are not reachable in this
        # environment, so EOS never fires naturally and the run measures the
        # worst-case (full-length) decode; see tools/validate_real_checkpoint.py
        "weights": "random",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
