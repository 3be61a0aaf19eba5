"""Benchmark: Dia-1.6B generation realtime factor on the local accelerator.

Prints one JSON line PER MEASURED CONFIG (the driver parses the LAST line as
the headline):
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Default on TPU: TWO lines — bf16 first, then packed-int8 (the serving
default and headline).  Reporting both keeps the numeric contract visible:
int8 changes generated tokens vs bf16 (quality evidence: tools/int8_quality.py,
docs/PERF.md), so a reader can always compare like with like.

Metric: RTF (generated audio seconds per wall second) for Dia-1.6B
single-stream generation (CFG pair, device-resident decode loop).
Baseline: the reference's published bf16 RTF ≈ 2.1 on an RTX 4090 with
torch.compile (BASELINE.md).  Audio seconds per decode step = 1/86.13
(44.1 kHz DAC, hop 512).

Usage:
  python bench.py                 # full 1.6B: bf16 line + int8 line (TPU)
  python bench.py --tiny          # tiny config smoke run (CI/CPU)
  python bench.py --steps 512     # timed decode steps
  python bench.py --int8 / --no-int8     # pin one config (single line)
  python bench.py --batch 8       # batched aggregate throughput
  python bench.py --pruned block50       # block-sparse pruned inference
         (block50|block70|unstructured50|shrink-ffn|shrink-heads)
"""

from __future__ import annotations

import argparse
import json
import os
import time

DAC_FRAME_RATE = 44100.0 / 512.0  # ≈ 86.13 codec frames / second of audio
BASELINE_RTF_BF16 = 2.1  # reference README.md:220-225 (RTX 4090, torch.compile)

BENCH_TEXT = (
    "[S1] This is a benchmark of the TPU native Dia text to speech system. "
    "[S2] It measures the realtime factor of autoregressive codec token generation. "
    "[S1] The quick brown fox jumps over the lazy dog."
)

PRUNED_MODES = ("none", "block50", "block70", "unstructured50", "shrink-ffn", "shrink-heads")


def _apply_pruning(params, config, mode: str):
    """Transform (params, config) for the requested pruned-inference mode."""
    from dia_tts_prune_tpu.ops.sparse import sparsify_params_block
    from dia_tts_prune_tpu.prune import (
        apply_masks,
        block_masks,
        shrink_ffn,
        shrink_heads,
        unstructured_masks,
    )

    if mode in ("block50", "block70"):
        amount = 0.5 if mode == "block50" else 0.7
        pruned = apply_masks(params, block_masks(params, amount, block=(256, 256)))
        return sparsify_params_block(pruned), config
    if mode == "unstructured50":
        # element-level masks: dense math over zeros (the reference's mode —
        # measured for honesty; no bandwidth savings expected)
        return apply_masks(params, unstructured_masks(params, 0.5)), config
    if mode == "shrink-ffn":
        return shrink_ffn(params, config, keep_fraction=0.5)
    if mode == "shrink-heads":
        return shrink_heads(params, config, keep_fraction=0.5)
    raise ValueError(f"unknown pruned mode {mode}")


def measure(gen, config, args, metric: str, n_params: int, ttfa_cache_len: int):
    """Warmup-compile, run the timed generation, optionally measure TTFA."""
    import jax

    steps = min(args.steps, config.data.audio_length - 32)
    max_tokens = steps + config.data.max_delay + 2
    warmup_tokens = 32 + config.data.max_delay + 2
    texts = [BENCH_TEXT] * args.batch if args.batch > 1 else None
    if texts:
        seeds = [args.seed + i for i in range(args.batch)]
        gen.generate_tokens_batch(texts, max_tokens=warmup_tokens,
                                  temperature=args.temperature,
                                  cfg_filter_top_k=args.top_k, seeds=seeds,
                                  cache_len=max_tokens)
    else:
        gen.generate_tokens(BENCH_TEXT, max_tokens=warmup_tokens,
                            temperature=args.temperature,
                            cfg_filter_top_k=args.top_k, seed=1,
                            cache_len=max_tokens)

    # Timed run. Random weights never sample EOS in channel 0 spontaneously
    # (vocab 1028), so the loop runs to the near-max trigger — a stable,
    # worst-case-length measurement.
    t0 = time.perf_counter()
    if texts:
        outs = gen.generate_tokens_batch(texts, max_tokens=max_tokens,
                                         temperature=args.temperature,
                                         cfg_filter_top_k=args.top_k, seeds=seeds,
                                         cache_len=max_tokens)
        gen_rows = sum(o.shape[0] for o in outs) + args.batch * config.data.max_delay
    else:
        out = gen.generate_tokens(BENCH_TEXT, max_tokens=max_tokens,
                                  temperature=args.temperature,
                                  cfg_filter_top_k=args.top_k, seed=args.seed)
        gen_rows = out.shape[0] + config.data.max_delay
    dt = time.perf_counter() - t0

    tokens_per_sec = gen_rows / dt
    rtf = tokens_per_sec / DAC_FRAME_RATE

    # time-to-first-audio proxy: a minimal-length generate call (includes
    # conditioning, compile-cache hit, transfers, and the first audio frames);
    # only meaningful for the single-stream path (the batch warmup compiled a
    # different executable)
    if args.batch > 1:
        ttfa = None
    else:
        t1 = time.perf_counter()
        gen.generate_tokens(BENCH_TEXT, max_tokens=8 + config.data.max_delay + 2,
                            temperature=args.temperature, cfg_filter_top_k=args.top_k,
                            seed=2, cache_len=ttfa_cache_len)
        ttfa = time.perf_counter() - t1

    return {
        "metric": metric,
        "value": round(rtf, 4),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / BASELINE_RTF_BF16, 4),
        "tokens_per_sec": round(tokens_per_sec, 2),
        "decode_steps": int(gen_rows),
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


def measure_spec(params, config, args, metric: str, n_params: int):
    """Speculative-decoding throughput: warmup, timed run, α and fallback share."""
    import jax

    from dia_tts_prune_tpu.speculative import SpeculativeGenerator

    steps = min(args.steps, config.data.audio_length - 32)
    max_tokens = steps + config.data.max_delay + 2

    def fresh():
        return SpeculativeGenerator(
            params, config, args.dtype,
            n_draft_layers=args.spec_draft_layers, window=args.spec)

    warm = fresh()
    warm.generate_tokens(BENCH_TEXT, max_tokens=max_tokens,
                         temperature=args.temperature,
                         cfg_filter_top_k=args.top_k, seed=1)
    gen = fresh()  # clean stats for the timed run (compiles are cached)
    t0 = time.perf_counter()
    out = gen.generate_tokens(BENCH_TEXT, max_tokens=max_tokens,
                              temperature=args.temperature,
                              cfg_filter_top_k=args.top_k, seed=args.seed)
    dt = time.perf_counter() - t0
    gen_rows = out.shape[0] + config.data.max_delay
    tokens_per_sec = gen_rows / dt
    total_steps = gen.stats["tokens"] + gen.stats["fallback_steps"]
    return {
        "metric": metric,
        "value": round(tokens_per_sec / DAC_FRAME_RATE, 4),
        "unit": "x_realtime",
        "vs_baseline": round(tokens_per_sec / DAC_FRAME_RATE / BASELINE_RTF_BF16, 4),
        "tokens_per_sec": round(tokens_per_sec, 2),
        "decode_steps": int(gen_rows),
        "wall_seconds": round(dt, 3),
        "params": n_params,
        "device": str(jax.devices()[0]),
        "dtype": args.dtype,
        "temperature": args.temperature,
        "batch": 1,
        "spec_window": gen.window,
        "spec_draft_layers": gen.n_draft_layers,
        "spec_acceptance_rate": round(gen.acceptance_rate, 4)
        if gen.stats["drafted"] else None,
        "spec_fallback_steps": gen.stats["fallback_steps"],
        "spec_loop_steps": int(total_steps),
        "weights": "random",
    }


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
                        "Default on TPU: report BOTH a bf16 line and an int8 line "
                        "(int8 last = headline). --int8/--no-int8 pins one config.")
    parser.add_argument("--int4", type=str, default=None,
                        choices=["full", "hybrid"],
                        help="packed int4 decoder weights (grouped scales, G=128): "
                        "'full' = every decoder kernel int4; 'hybrid' = MLP "
                        "kernels int4 + the rest int8. Single line.")
    parser.add_argument("--batch", type=int, default=1,
                        help="N independent streams decoded in one batched loop")
    parser.add_argument("--spec", type=int, default=None, metavar="WINDOW",
                        help="speculative decoding (layer-skip self-draft, "
                        "verify window of WINDOW tokens); composes with "
                        "--int8 / default weight format. Single line with "
                        "acceptance-rate stats.")
    parser.add_argument("--spec-draft-layers", type=int, default=None,
                        help="draft depth (default: n_layer // 3)")
    parser.add_argument("--pruned", type=str, default="none", choices=PRUNED_MODES,
                        help="pruned-inference config (BASELINE configs 3-4): "
                        "block-sparse kernels, masked-dense, or physical shrink")
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

    # the remote-attached backend (axon tunnel) can be down for minutes after
    # a failed compile killed its service — retry init instead of losing the
    # bench artifact to a transient outage (DIA_BENCH_WAIT seconds, 0 = off)
    import sys

    wait_budget = int(os.environ.get("DIA_BENCH_WAIT", "900"))
    deadline = time.time() + wait_budget
    while True:
        try:
            jax.devices()
            break
        except Exception as e:  # noqa: BLE001
            if time.time() >= deadline:
                raise
            print(f"# backend unavailable ({type(e).__name__}); retrying...",
                  file=sys.stderr, flush=True)
            time.sleep(60)

    from dia_tts_prune_tpu.config import dia_1_6b_config, tiny_test_config
    from dia_tts_prune_tpu.generate import DiaGenerator
    from dia_tts_prune_tpu.models.dia import init_params, param_count

    config = tiny_test_config() if args.tiny else dia_1_6b_config(weight_dtype=args.dtype)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params = init_params(config, jax.random.PRNGKey(args.seed), dtype)
    n_params = param_count(params)  # model size; int8 packing adds derived arrays
    on_tpu = jax.default_backend() in ("tpu", "axon")

    steps = min(args.steps, config.data.audio_length - 32)
    ttfa_cache_len = steps + config.data.max_delay + 2
    suffix = f"_batch{args.batch}" if args.batch > 1 else ""
    size = "tiny_smoke" if args.tiny else "dia1.6b_1chip"

    results = []
    if args.spec is not None:
        fmt = "bf16"
        if args.int8:
            from dia_tts_prune_tpu.ops.quant import quantize_params_int8_packed

            params = quantize_params_int8_packed(params)
            fmt = "int8"
        results.append(measure_spec(
            params, config, args, f"RTF_spec{args.spec}-{fmt}_{size}", n_params))
    elif args.pruned != "none":
        params, config = _apply_pruning(params, config, args.pruned)
        label = f"RTF_pruned_{args.pruned}_{size}{suffix}"
        if args.int8 and args.pruned.startswith(("shrink", "unstructured")):
            # pruning composes with the int8 serving default: physically
            # shrunk shapes are ordinary dense tensors (block-sparse packed
            # kernels are already their own storage format)
            from dia_tts_prune_tpu.ops.quant import quantize_params_int8_packed

            params = quantize_params_int8_packed(params)
            label = f"RTF_pruned-int8_{args.pruned}_{size}{suffix}"
        gen = DiaGenerator(params, config, args.dtype)
        results.append(measure(
            gen, config, args, label, param_count(params), ttfa_cache_len))
    elif args.int4 is not None:
        from dia_tts_prune_tpu.ops.quant import (
            quantize_params_int4_packed,
            quantize_params_int8_packed,
        )

        if args.int4 == "full":
            qparams = quantize_params_int4_packed(params, nibble=True,
                                                  halfsplit=True)
        else:  # hybrid: int4 MLP (57% of layer bytes) + int8 rest
            qparams = quantize_params_int8_packed(
                quantize_params_int4_packed(params, mlp_only=True, nibble=True,
                                            halfsplit=True),
                fused=False)
        del params
        gen = DiaGenerator(qparams, config, args.dtype)
        results.append(measure(
            gen, config, args, f"RTF_int4-{args.int4}_{size}{suffix}",
            n_params, ttfa_cache_len))
    else:
        # Default TPU report: bf16, int8 (near-lossless serving default),
        # int4-full LAST = headline (fastest measured config: in-jit S4
        # unpack streams weights at 4-bit density, RTF 6.79 vs int8's 5.29,
        # docs/PERF.md round 4; quality-free with `finetune --qat int4`).
        # Pinning --int8/--no-int8 narrows the report to that config.
        want_int8 = args.int8 if args.int8 is not None else (on_tpu and not args.tiny)
        want_bf16 = (args.int8 is None and on_tpu and not args.tiny) or not want_int8
        want_int4 = args.int8 is None and on_tpu and not args.tiny
        if want_bf16:
            gen = DiaGenerator(params, config, args.dtype)
            results.append(measure(
                gen, config, args, f"RTF_{args.dtype.replace('loat', '')}_{size}{suffix}"
                if args.dtype != "bfloat16" else f"RTF_bf16_{size}{suffix}",
                n_params, ttfa_cache_len))
            del gen
        if want_int8:
            from dia_tts_prune_tpu.ops.quant import quantize_params_int8_packed

            q8 = quantize_params_int8_packed(params)
            if not want_int4:
                del params
            gen = DiaGenerator(q8, config, args.dtype)
            results.append(measure(
                gen, config, args, f"RTF_int8_{size}{suffix}", n_params, ttfa_cache_len))
            del gen, q8
        if want_int4:
            from dia_tts_prune_tpu.ops.quant import quantize_params_int4_packed

            q4 = quantize_params_int4_packed(params, nibble=True, halfsplit=True)
            del params
            gen = DiaGenerator(q4, config, args.dtype)
            results.append(measure(
                gen, config, args, f"RTF_int4-full_{size}{suffix}", n_params,
                ttfa_cache_len))

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
