"""Device-resident autoregressive generation.

The reference's generation loop syncs host↔device every codec frame
(dia/model.py:748-815: Python EOS bookkeeping + per-step sampling) — the #1
performance problem for any accelerator.  Here the whole loop — decode step,
CFG, constraint masks, sampling, the EOS delay-countdown state machine, and
the BOS-window masked write — is a single ``lax.while_loop`` compiled once;
the host sees only the final token buffer.

Loop semantics replicate the reference exactly (verified against
dia/model.py:631-846):

* step ``t`` consumes the token in buffer row ``t-1``, runs RoPE position
  ``t``, writes KV slot ``t-1``, attends slots ``[0, t-1]``;
* EOS in channel 0 starts a ``max_delay`` countdown during which channel
  ``c`` is forced to EOS at offset ``delay[c]`` and PAD after
  (dia/model.py:771-797);
* the first ``max_delay`` steps write through a ``buffer == -1`` mask so the
  delayed BOS/PAD template rows survive (dia/model.py:790-792, state
  quirk Q8);
* generation stops when the countdown hits zero or ``max_tokens`` nears
  (minus the delay tail), whichever first.

Deviations from the reference (documented, deliberate):
* KV prefill writes slots ``[0, P-1)`` without the reference's off-by-one
  overwrite of the last prompt slot (quirk Q5);
* sampling uses ``jax.random`` categorical (threaded keys) rather than torch
  ``multinomial`` — distributions match, exact draws differ; parity tests
  compare under temperature 0.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import DiaConfig
from .models.dia import (
    KVCache,
    QuantKVCache,
    decode_step,
    decode_step_fused,
    decode_step_scan,
    decoder_prefill,
    encoder_forward,
    new_self_cache,
    precompute_cross_cache,
    quantize_kv,
)
from .ops.delay import revert_audio_delay_np
from .parallel.sharding import constrain, cross_cache_spec, self_cache_spec
from .ops.masks import create_attn_mask
from .ops.sampling import (
    apply_constraints,
    cfg_combine,
    sample_next_token_traced as _traced_sample,
)
from .state import (
    DecodeLoopState,
    cross_attention_mask,
    new_encoder_state,
    prepare_audio_prompt,
)
from .tokenizer import build_effective_text, encode_cfg_batch

CFG_BATCH = 2  # [uncond; cond] pair (reference: dia/model.py:360-362)


def _resolve_seed(seed: int | None) -> int:
    """None → a fresh random seed (reference semantics: unseeded runs differ,
    app.py:163-168); an int is used as-is for reproducibility."""
    if seed is None:
        import random

        return random.randint(0, 2**31 - 1)
    return int(seed)


def _kv_cache_quant(params, batch: bool = False) -> bool:
    """int8 self-attention cache eligibility (see models.dia.QuantKVCache):
    only the scan decode step implements the dequant math, and the win is a
    bandwidth one, so it rides the packed-int8 TPU serving default.
    ``DIA_KV_INT8=1/0`` forces it on/off (default: on for TPU backends)."""
    import os

    env = os.environ.get("DIA_KV_INT8")
    if env == "0":
        return False
    fn = _decode_step_fn(params, batch=batch)
    if fn is decode_step_fused:
        # the fused kernel reads int8 caches + scale lines directly, except
        # under the vpu attention orientation (no lane-major scale line)
        if os.environ.get("DIA_FUSED_ATTN", "headloop") == "vpu":
            return False
    elif fn is not decode_step_scan:
        return False
    if not _params_are_packed_int8(params):
        return False
    return env == "1" or jax.default_backend() in ("tpu", "axon")


def _maybe_unpack_s4(params):
    """Nibble-int4 kernels → XLA-native S4 kernels, inside the jit.

    S4 (packed-int4) arrays cannot cross a jit/transfer boundary on
    remote-attached backends (axon RecursionError), but they work perfectly
    as in-program values: convert the transferable nibble bytes ONCE at the
    top of the compiled generate program, before the decode loop, and XLA
    keeps the packed tensor resident across steps with the int4→bf16 upcast
    fused into each dot's operand read.  Measured 0.45/0.51 ms (plain /
    grouped-scale) per 18-layer MLP GEMV chain vs 0.84 ms int8 and 1.01 ms
    for the best Pallas shift-unpack kernel (tools/probe_s4_device.py,
    docs/PERF.md): the only int4 impl on this stack that streams at true
    4-bit density.  ``DIA_INT4_S4=0`` opts out (trace-time flag); identity
    for trees without nibble int4 kernels."""
    import os

    if os.environ.get("DIA_INT4_S4", "1") == "0":
        return params
    from .ops.quant import unpack_params_s4

    return unpack_params_s4(params)


def _decode_step_fn(params=None, batch: bool = False):
    """Pick the decode-step implementation for these params.

    bf16 weights → unrolled layers (measured fastest: 3.61 vs 3.81 ms/step,
    tools/profile_step_ab.py).  Packed-int8 weights → scan-over-layers: XLA
    only fuses the int8→bf16 convert into the dot's operand load inside the
    layer scan (2.88 ms/step); unrolled, the converts materialize and int8
    LOSES (4.64 ms/step).  Packed int8 WITH a fused pack, on the
    single-stream path, on a real TPU → the whole-stack Pallas kernel
    (ops/kernels/fused_step.py).  ``DIA_DECODE_IMPL=scan|unroll|fused``
    overrides."""
    import os

    mode = os.environ.get("DIA_DECODE_IMPL")
    if mode == "scan":
        return decode_step_scan
    if mode == "unroll":
        return decode_step
    if mode == "fused":
        return decode_step_fused
    if params is not None and _params_are_block_sparse(params):
        # block-sparse pruned weights: scan-over-layers (one Pallas kernel
        # trace per dense site instead of 18×; same streaming rationale as
        # the packed-int8 path)
        return decode_step_scan
    if params is not None and _params_are_packed_int8(params):
        if (
            "fused_pack" in params.get("decoder", {})
            and os.environ.get("DIA_FUSED") == "1"  # opt-in: measured 2.55 vs
            # 2.17 ms/step for the XLA scan path so far (docs/PERF.md) —
            # becomes the default if/when it wins.  Batched rows ride the
            # kernel's per-row position/valid_from SMEM scalars.
            and (
                jax.default_backend() in ("tpu", "axon")
                or os.environ.get("DIA_FUSED_INTERPRET") == "1"
            )
        ):
            return decode_step_fused
        return decode_step_scan
    return decode_step


def _params_are_packed_int8(params) -> bool:
    """True if the decoder's dense kernels are stored packed (int8/int4 +
    scales) — both pick the scan-over-layers step (the layout XLA fuses the
    upcast into, docs/PERF.md)."""
    try:
        k = params["decoder"]["layers"]["mlp"]["wo"]["kernel"]
    except (KeyError, TypeError):
        return False
    return type(k).__name__ in ("QuantizedKernel", "Quantized4Kernel")


def _params_are_block_sparse(params) -> bool:
    """True if the decoder's dense kernels are block-sparse packed."""
    try:
        k = params["decoder"]["layers"]["mlp"]["wo"]["kernel"]
    except (KeyError, TypeError):
        return False
    return type(k).__name__ == "BlockSparseKernel"


@dataclass(frozen=True)
class SamplingParams:
    """Static sampling configuration (trace-time constants)."""

    temperature: float = 1.3
    top_p: float = 0.95
    cfg_filter_top_k: int = 35
    cfg_scale: float = 3.0


def _dtype_of(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}[name]


def _make_loop_body(params, config, cross_cache, cross_mask, max_tokens,
                    cfg_scale, temperature, top_p, greedy, cfg_filter_top_k,
                    compute_dtype):
    """The per-step loop body — single source of truth for the reference's
    per-token semantics (parity-tested in test_loop_parity.py)."""
    d = config.data
    delay = jnp.asarray(d.delay_pattern, dtype=jnp.int32)
    max_delay = d.max_delay
    eos, pad = d.audio_eos_value, d.audio_pad_value

    def body(s: DecodeLoopState) -> DecodeLoopState:
        t = s.dec_step + 1
        # prev token rides the carry (== tokens[t-1]) instead of re-reading
        # the buffer: keeps the step's input independent of the previous
        # step's HBM buffer write
        tgt = jnp.broadcast_to(s.prev_tok[None, None], (CFG_BATCH, 1, d.channels))
        position = jnp.full((CFG_BATCH, 1), t, dtype=jnp.int32)
        logits, new_cache = _decode_step_fn(params)(
            params, config, tgt, position, (t - 1).astype(jnp.int32),
            s.cache, cross_cache, cross_mask, compute_dtype,
            skip_uncond_cross=True,  # CFG uncond rows are fully masked: exact
        )  # [2, 1, C, V]
        guided = cfg_combine(logits[:, -1], cfg_scale)  # [C, V]
        guided = apply_constraints(guided, eos, pad, d.audio_bos_value)

        key, sub = jax.random.split(s.key)
        if greedy:
            pred = jnp.argmax(guided, axis=-1).astype(jnp.int32)
        else:
            pred = _traced_sample(sub, guided, temperature, top_p, cfg_filter_top_k)

        # --- EOS state machine (reference: dia/model.py:771-797) ---
        newly_eos = (~s.eos_detected) & (pred[0] == eos)
        eos_detected = s.eos_detected | newly_eos
        countdown = jnp.where(newly_eos, max_delay, s.eos_countdown)

        active = countdown > 0
        step_after = max_delay - countdown
        force_eos = active & (step_after == delay)
        force_pad = active & (step_after > delay) & (pred != eos)
        pred = jnp.where(force_eos, eos, jnp.where(force_pad, pad, pred))
        countdown = jnp.where(active, countdown - 1, countdown)

        # --- BOS-window masked write (reference: dia/model.py:790-792) ---
        # row == the template content at position t (positions are written at
        # most once, at iteration t, so the pre-loop content is what the
        # masked write must preserve).  It rides a tiny rolling carry window
        # instead of a buffer read, keeping the tokens buffer write-only.
        bos_countdown = jnp.maximum(0, s.bos_countdown - 1)
        row = s.bos_rows[0]
        write = jnp.where((bos_countdown > 0) & (row != -1), row, pred)
        tokens = jax.lax.dynamic_update_slice(s.tokens, write[None], (t, 0))
        bos_rows = jnp.roll(s.bos_rows, -1, axis=0)  # rows beyond the window are never read

        stop = countdown == 0

        # Near-max EOS trigger (reference: dia/model.py:800-804)
        near_max = (t >= max_tokens - max_delay - 1) & (~eos_detected)
        eos_detected = eos_detected | near_max
        countdown = jnp.where(near_max, max_delay, countdown)

        dec_step = jnp.where(stop, s.dec_step, s.dec_step + 1)
        return DecodeLoopState(
            tokens=tokens, cache=new_cache, key=key, dec_step=dec_step,
            eos_detected=eos_detected, eos_countdown=countdown,
            bos_countdown=bos_countdown, stop=stop,
            prev_tok=write, bos_rows=bos_rows,
        )

    return body


def _loop_entry_carries(config: DiaConfig, tokens_buf: jax.Array, dec_step):
    """(prev_tok, bos_rows) for a loop entering at ``dec_step`` — the last
    written row and the template window the BOS-masked write will preserve."""
    d = config.data
    prev_tok = jax.lax.dynamic_slice(
        tokens_buf, (dec_step, 0), (1, d.channels))[0]
    bos_rows = jax.lax.dynamic_slice(
        tokens_buf, (dec_step + 1, 0), (d.max_delay, d.channels))
    return prev_tok, bos_rows


def _decode_loop_core(
    params,
    config: DiaConfig,
    tokens_buf: jax.Array,
    self_cache: KVCache,
    cross_cache: KVCache,
    cross_mask: jax.Array,
    key: jax.Array,
    prefill_step: jax.Array,
    max_tokens: jax.Array,
    cfg_scale: jax.Array,
    temperature: jax.Array,
    top_p: jax.Array,
    greedy: bool,
    cfg_filter_top_k: int,
    compute_dtype,
):
    def cond(s: DecodeLoopState):
        return (s.dec_step < max_tokens - 1) & (~s.stop)

    body = _make_loop_body(params, config, cross_cache, cross_mask, max_tokens,
                           cfg_scale, temperature, top_p, greedy, cfg_filter_top_k,
                           compute_dtype)

    dec0 = prefill_step.astype(jnp.int32) - 1
    prev_tok, bos_rows = _loop_entry_carries(config, tokens_buf, dec0)
    init = DecodeLoopState(
        tokens=tokens_buf,
        cache=self_cache,
        key=key,
        dec_step=dec0,
        eos_detected=jnp.asarray(False),
        eos_countdown=jnp.asarray(-1, jnp.int32),
        bos_countdown=jnp.asarray(config.data.max_delay, jnp.int32),
        stop=jnp.asarray(False),
        prev_tok=prev_tok,
        bos_rows=bos_rows,
    )
    final = jax.lax.while_loop(cond, body, init)
    return final.tokens, final.dec_step


def _conditioning(params, config, enc_input, compute_dtype, cross_window):
    """Encoder pass + cross-attention KV, optionally trimmed to a static
    ``cross_window`` text bucket.

    The decode loop re-reads the whole cross cache every step; at the
    published config that is [L, 2, 1024, 16, 128] ≈ 300 MB of mostly-padding
    keys per step on a bandwidth-bound path.  Real prompts are a few hundred
    bytes, so slicing keys/mask to a 128-multiple bucket of the actual text
    length cuts that read ~4-8×.  Exact parity: sliced-off keys are padding,
    already masked out of every query row (and the CFG unconditional row —
    all padding — stays fully masked, keeping its exact-zero outputs)."""
    enc_state = new_encoder_state(config, enc_input)
    enc_out = encoder_forward(
        params, config, enc_input, enc_state.positions, enc_state.attn_mask, compute_dtype
    )
    enc_positions = enc_state.positions
    padding_mask = enc_state.padding_mask
    if cross_window is not None and cross_window < enc_out.shape[1]:
        enc_out = enc_out[:, :cross_window]
        enc_positions = enc_positions[:, :cross_window]
        padding_mask = padding_mask[:, :cross_window]
    cross_cache = precompute_cross_cache(params, config, enc_out, enc_positions)
    # TP: keep cross-attention KV sharded on the head axis inside the loop
    # (16 cross heads / 4 chips on v5e-4 → each step reads only local keys)
    cross_cache = KVCache(
        k=constrain(cross_cache.k, cross_cache_spec()),
        v=constrain(cross_cache.v, cross_cache_spec()),
    )
    cross_mask = cross_attention_mask(padding_mask)
    return cross_cache, cross_mask, padding_mask


def _quantize_cross(cross_cache, quant: bool):
    """int8-quantize the cross-attention cache for the decode loop (same
    layout contract as the self cache: QuantKVCache, per-(key, head) scales).
    Prefill consumes the bf16 cache (full-attention path), so this runs
    AFTER prefill; only the scan decode step speaks the quant layout."""
    if not quant:
        return cross_cache
    from jax.sharding import PartitionSpec as _P

    kq, ks = quantize_kv(cross_cache.k)
    vq, vs = quantize_kv(cross_cache.v)
    sspec = _P(*cross_cache_spec()[:-1])  # [L, B, S, N]: drop H
    return QuantKVCache(
        k=constrain(kq, cross_cache_spec()),
        v=constrain(vq, cross_cache_spec()),
        ks=constrain(ks, sspec), vs=constrain(vs, sspec),
    )


def _new_self_cache_sharded(config, batch, dtype, max_len, quant=False):
    """Self-attention cache, constrained to the TP layout (1 KV head/chip on
    v5e-4) when generation runs under a mesh — the constraint propagates
    through the while-loop carry so the cache is never replicated.

    ``quant`` allocates the int8 + per-token-scale cache (QuantKVCache):
    half the per-step cache HBM reads; scales shard on the same head axis."""
    cache = new_self_cache(config, batch, dtype=dtype, max_len=max_len,
                           quant=quant)
    if quant:
        from jax.sharding import PartitionSpec as _P

        scale_spec = _P(*self_cache_spec()[:-1])  # [L, B, T, N]: drop H
        return QuantKVCache(
            k=constrain(cache.k, self_cache_spec()),
            v=constrain(cache.v, self_cache_spec()),
            ks=constrain(cache.ks, scale_spec),
            vs=constrain(cache.vs, scale_spec),
        )
    return KVCache(
        k=constrain(cache.k, self_cache_spec()),
        v=constrain(cache.v, self_cache_spec()),
    )


def _run_prefill(
    params,
    config: DiaConfig,
    tokens_NxTxC: jax.Array,  # [N, T_max, C] per-stream buffers (N=1 single)
    prefill_window: int,  # static W: prompts occupy rows [offset_i, W)
    offsets: jax.Array,  # int32 [N]: W - prefill_step_i (0 for single-stream)
    prefill_steps: jax.Array,  # int32 [N]
    cross_cache: KVCache,
    cross_mask: jax.Array,
    padding_mask: jax.Array,  # [2N, S] encoder padding (CFG rows)
    self_cache: KVCache,
    compute_dtype,
) -> KVCache:
    """Prompt prefill into the self-attention cache, shared by the fused,
    streaming and batched paths.

    Streams are LEFT-padded so every prompt's last token lands on row
    ``W-1`` — the decode loop then advances all streams in lockstep from
    ``t = W`` (reference semantics per stream: dia/model.py:403-419).  Only
    rows ``[offset_i, W-1)`` are prefilled; the final prompt token is
    consumed by the first loop step (parity with the single-stream path).
    RoPE positions are row-local (``row - offset_i``) so a stream's math is
    identical to its unpadded single-stream run.
    """
    N = tokens_NxTxC.shape[0]
    C = tokens_NxTxC.shape[-1]
    window_tokens = jnp.clip(
        jax.lax.slice_in_dim(tokens_NxTxC, 0, prefill_window, axis=1), 0
    )  # [N, W, C]
    tgt = jnp.concatenate([window_tokens, window_tokens], axis=0)  # [2N, W, C]
    rows = jnp.arange(prefill_window, dtype=jnp.int32)[None]  # [1, W]
    off2 = jnp.concatenate([offsets, offsets])[:, None]  # [2N, 1]
    steps2 = jnp.concatenate([prefill_steps, prefill_steps])[:, None]
    positions = jnp.maximum(rows - off2, 0)  # [2N, W] row-local positions
    valid = (rows >= off2) & (rows - off2 < steps2 - 1)
    prefill_mask = create_attn_mask(valid, valid, is_causal=True)
    _, self_cache = decoder_prefill(
        params, config, tgt, positions, prefill_mask, cross_cache, cross_mask,
        self_cache, compute_dtype,
        dec_segment_ids=valid.astype(jnp.int32),
        enc_segment_ids=padding_mask.astype(jnp.int32),
    )
    return self_cache


@partial(
    jax.jit,
    static_argnames=("config", "prefill_window", "cross_window", "cache_len",
                     "greedy", "cfg_filter_top_k", "compute_dtype_name",
                     "kv_quant"),
    donate_argnames=("tokens_buf",),
)
def generate_fused(
    params,
    config: DiaConfig,
    enc_input: jax.Array,  # [2, T_text] int32
    tokens_buf: jax.Array,  # [T_max, C] int32 with prefill template
    int_args: jax.Array,  # [3] int32: prefill_step, max_tokens, seed
    float_args: jax.Array,  # [3] f32: cfg_scale, temperature, top_p
    prefill_window: int | None,
    greedy: bool,
    cfg_filter_top_k: int,
    compute_dtype_name: str,
    cross_window: int | None = None,
    cache_len: int | None = None,
    kv_quant: bool | None = None,  # int8 KV caches (STATIC). None resolves
    # DIA_KV_INT8 ONCE at first trace and the resolution is baked into the
    # None-keyed executable — pass an explicit bool (as every internal call
    # site does) if the flag must be switchable between calls.
):
    """Whole generation — conditioning, prompt prefill, decode loop — as ONE
    compiled dispatch.

    A single device call matters twice: it is the p50 time-to-first-audio
    floor, and on remote-attached TPUs every extra transfer/dispatch pays a
    round trip (measured ~2s of fixed overhead per generate call before this
    fusion).  Scalars arrive packed in two tiny arrays; the KV cache is
    allocated inside the program (never transferred).

    ``cross_window`` / ``cache_len`` are static byte-traffic buckets (the
    decode step re-reads both caches every token): text keys trimmed to a
    128-bucket of the real prompt, self-attention cache allocated at a bucket
    of ``max_tokens`` instead of the full ``audio_length``.  One executable
    per bucket, same tokens — exact parity with the unbucketed program.
    """
    compute_dtype = _dtype_of(compute_dtype_name)
    params = _maybe_unpack_s4(params)
    prefill_step = int_args[0]
    max_tokens = int_args[1]
    key = jax.random.PRNGKey(int_args[2])
    cfg_scale, temperature, top_p = float_args[0], float_args[1], float_args[2]

    cross_cache, cross_mask, padding_mask = _conditioning(
        params, config, enc_input, compute_dtype, cross_window
    )
    quant = _kv_cache_quant(params) if kv_quant is None else kv_quant
    self_cache = _new_self_cache_sharded(config, CFG_BATCH, compute_dtype, cache_len,
                                         quant=quant)

    if prefill_window is not None:
        self_cache = _run_prefill(
            params, config, tokens_buf[None], prefill_window,
            jnp.zeros((1,), jnp.int32), prefill_step[None],
            cross_cache, cross_mask, padding_mask, self_cache, compute_dtype,
        )

    cross_cache = _quantize_cross(cross_cache, quant)
    return _decode_loop_core(
        params, config, tokens_buf, self_cache, cross_cache, cross_mask, key,
        prefill_step, max_tokens, cfg_scale, temperature, top_p,
        greedy, cfg_filter_top_k, compute_dtype,
    )


class BatchLoopState(NamedTuple):
    """Carry of the multi-stream decode loop (N independent prompts)."""

    tokens: jax.Array  # int32 [N, T_max, C]
    cache: KVCache  # [L, 2N, T, Nkv, H]
    keys: jax.Array  # [N, 2] per-stream PRNG key chains
    t: jax.Array  # int32 scalar: current step index
    eos_detected: jax.Array  # bool [N]
    eos_countdown: jax.Array  # int32 [N]
    stopped: jax.Array  # bool [N]
    final_step: jax.Array  # int32 [N]
    # perf carries (see DecodeLoopState): keep the tokens buffer write-only
    # inside the loop — no HBM read-after-write between consecutive steps
    prev_tok: jax.Array  # int32 [N, C] == tokens[:, t]
    bos_rows: jax.Array  # int32 [N, max_delay, C] rolling template window


@partial(
    jax.jit,
    static_argnames=("config", "prefill_window", "greedy", "cfg_filter_top_k",
                     "compute_dtype_name", "cross_window", "cache_len",
                     "kv_quant"),
    donate_argnames=("tokens_buf",),
)
def generate_fused_batch(
    params,
    config: DiaConfig,
    enc_input: jax.Array,  # [2N, T_text]: rows [uncond×N ; cond×N]
    tokens_buf: jax.Array,  # [N, T_max, C] with per-stream delayed templates
    prefill_steps: jax.Array,  # int32 [N]: 1 + prompt length per stream
    seeds: jax.Array,  # int32 [N]: per-stream PRNG seeds
    int_args: jax.Array,  # [1] int32: max_tokens
    float_args: jax.Array,  # [3] f32: cfg_scale, temperature, top_p
    prefill_window: int | None,
    greedy: bool,
    cfg_filter_top_k: int,
    compute_dtype_name: str,
    cross_window: int | None = None,
    cache_len: int | None = None,
    kv_quant: bool | None = None,  # static; None bakes the first-trace
    # resolution — pass an explicit bool to switch at runtime (generate_fused)
):
    """N-stream batched generation — with per-stream voice-clone prompts —
    in one dispatch.

    Decoding is weight-bandwidth-bound: every stream shares the same weight
    reads per step, so aggregate codec-tokens/s scales nearly linearly with N
    until compute/VMEM limits.  Per-stream EOS state machines are vectorized;
    finished streams freeze (their rows stop being written) until all stop.

    Audio prompts of different lengths are LEFT-padded to the static
    ``prefill_window`` bucket: stream ``i``'s delayed template occupies rows
    ``[W - P_i, W + max_delay)``, so every prompt ends at row ``W-1`` and the
    loop advances all streams in lockstep from ``t = W``.  RoPE positions and
    attention masks are row-local per stream (``row - offset_i``), making
    each stream's math identical to its single-stream run (the reference's
    rolling-prompt app pipeline, /root/reference/app.py:221-226, conditions
    every batch on audio prompts — this path serves it at batch speed).
    ``max_tokens`` keeps the reference's total-row semantics per stream
    (prompt + generated, dia/model.py:748): stream ``i`` stops by
    ``t - offset_i >= max_tokens - 1``.

    PRNG: each stream carries its OWN key chain seeded from ``seeds[i]`` and
    split once per step, exactly like the single-stream loop — so a seeded
    request's temperature>0 tokens equal its single-stream run and are
    independent of which requests happen to share the batch (reference seeded
    reproducibility semantics, dia/model.py:679-683 + cli.py:22-32, extended
    to batched serving).
    """
    compute_dtype = _dtype_of(compute_dtype_name)
    params = _maybe_unpack_s4(params)
    d = config.data
    N = tokens_buf.shape[0]
    max_tokens = int_args[0]
    keys = jax.vmap(jax.random.PRNGKey)(seeds)  # [N] independent key chains
    cfg_scale, temperature, top_p = float_args[0], float_args[1], float_args[2]
    delay = jnp.asarray(d.delay_pattern, dtype=jnp.int32)
    max_delay = d.max_delay
    eos, pad = d.audio_eos_value, d.audio_pad_value

    start = prefill_window if prefill_window is not None else 1
    offsets = start - prefill_steps  # int32 [N], 0 when unprompted
    # per-stream total-row cap on the global axis (clamped to the buffer)
    caps = jnp.minimum(max_tokens + offsets, tokens_buf.shape[1])
    valid_from2 = jnp.concatenate([offsets, offsets])  # [2N] first valid KV slot

    cross_cache, cross_mask, padding_mask = _conditioning(
        params, config, enc_input, compute_dtype, cross_window
    )
    quant = (_kv_cache_quant(params, batch=True) if kv_quant is None
             else kv_quant)
    self_cache = _new_self_cache_sharded(config, 2 * N, compute_dtype, cache_len,
                                         quant=quant)
    if prefill_window is not None:
        self_cache = _run_prefill(
            params, config, tokens_buf, prefill_window, offsets, prefill_steps,
            cross_cache, cross_mask, padding_mask, self_cache, compute_dtype,
        )
    cross_cache = _quantize_cross(cross_cache, quant)

    def cond(s: BatchLoopState):
        return (s.t < jnp.max(caps) - 1) & (~jnp.all(s.stopped))

    def body(s: BatchLoopState) -> BatchLoopState:
        t = s.t + 1
        prev = s.prev_tok[:, None]  # [N, 1, C] — carried, not re-read from HBM
        tgt = jnp.concatenate([prev, prev], axis=0)  # [2N, 1, C] CFG pair per stream
        position = (t - valid_from2)[:, None]  # [2N, 1] row-local RoPE positions
        logits, new_cache = _decode_step_fn(params, batch=True)(
            params, config, tgt, position, (t - 1).astype(jnp.int32),
            s.cache, cross_cache, cross_mask, compute_dtype,
            valid_from=valid_from2, skip_uncond_cross=True,
        )  # [2N, 1, C, V]
        uncond = logits[:N, 0]
        cond_l = logits[N:, 0]
        guided = cond_l + cfg_scale * (cond_l - uncond)  # [N, C, V]
        guided = jax.vmap(lambda g: apply_constraints(g, eos, pad, d.audio_bos_value))(guided)

        # per-stream key chains: stream i's split/sample sequence is identical
        # to its single-stream run (batch-composition-independent sampling)
        splits = jax.vmap(jax.random.split)(s.keys)  # [N, 2, 2]
        keys, subs = splits[:, 0], splits[:, 1]
        if greedy:
            pred = jnp.argmax(guided, axis=-1).astype(jnp.int32)  # [N, C]
        else:
            pred = jax.vmap(
                lambda k, g: _traced_sample(k, g, temperature, top_p, cfg_filter_top_k)
            )(subs, guided)

        newly_eos = (~s.eos_detected) & (pred[:, 0] == eos)
        eos_detected = s.eos_detected | newly_eos
        countdown = jnp.where(newly_eos, max_delay, s.eos_countdown)

        active = countdown > 0
        step_after = (max_delay - countdown)[:, None]  # [N, 1]
        force_eos = active[:, None] & (step_after == delay[None, :])
        force_pad = active[:, None] & (step_after > delay[None, :]) & (pred != eos)
        pred = jnp.where(force_eos, eos, jnp.where(force_pad, pad, pred))
        countdown = jnp.where(active, countdown - 1, countdown)

        # BOS-window masked write + freeze finished streams.  All prompts end
        # at row start-1, so the write-protect window (reference quirk Q8) is
        # the shared first max_delay-1 steps after start.  ``row`` is the
        # buffer's pre-loop content at position t (positions are written at
        # most once): the rolling template carry inside the first max_delay
        # steps, -1 (the untouched template fill) beyond it.
        in_window = (t - start) < max_delay
        row = jnp.where(in_window, s.bos_rows[:, 0, :], -1)
        bos_window = (t - start) < max_delay - 1
        write = jnp.where(bos_window & (row != -1), row, pred)
        write = jnp.where(s.stopped[:, None], row, write)
        tokens = jax.lax.dynamic_update_slice(s.tokens, write[:, None], (0, t, 0))
        bos_rows = jnp.roll(s.bos_rows, -1, axis=1)

        stop_now = (countdown == 0) & (~s.stopped)
        hit_cap = (t >= caps - 1) & (~s.stopped) & (~stop_now)
        final_step = jnp.where(s.stopped, s.final_step, jnp.where(stop_now, t - 1, t))
        stopped = s.stopped | stop_now | hit_cap

        near_max = (t >= caps - max_delay - 1) & (~eos_detected)
        eos_detected = eos_detected | near_max
        countdown = jnp.where(near_max, max_delay, countdown)

        return BatchLoopState(
            tokens=tokens, cache=new_cache, keys=keys, t=t,
            eos_detected=eos_detected, eos_countdown=countdown,
            stopped=stopped, final_step=final_step,
            prev_tok=write, bos_rows=bos_rows,
        )

    init = BatchLoopState(
        tokens=tokens_buf,
        cache=self_cache,
        keys=keys,
        t=jnp.asarray(start - 1, jnp.int32),
        eos_detected=jnp.zeros((N,), jnp.bool_),
        eos_countdown=jnp.full((N,), -1, jnp.int32),
        stopped=jnp.zeros((N,), jnp.bool_),
        final_step=jnp.full((N,), start - 1, jnp.int32),
        prev_tok=tokens_buf[:, start - 1, :],
        bos_rows=tokens_buf[:, start : start + max_delay, :],
    )
    final = jax.lax.while_loop(cond, body, init)
    return final.tokens, final.final_step


@partial(
    jax.jit,
    static_argnames=("config", "prefill_window", "compute_dtype_name",
                     "cross_window", "cache_len", "kv_quant"),
)
def prepare_stream(
    params,
    config: DiaConfig,
    enc_input: jax.Array,  # [2, T_text]
    tokens_buf: jax.Array,  # [T_max, C] with prefill template
    int_args: jax.Array,  # [2] int32: prefill_step, seed
    prefill_window: int | None,
    compute_dtype_name: str,
    cross_window: int | None = None,
    cache_len: int | None = None,
    kv_quant: bool | None = None,  # None = auto AT FIRST TRACE (baked into
    # the None-keyed executable); False for consumers that
    # replay the cache through decode_window (speculative verify)
):
    """Conditioning + voice-clone prefill + initial loop state for
    segment-wise (streaming) decoding.  Identical prefill semantics to
    ``generate_fused`` — a prompted stream's yields concatenate to the
    prompted offline run bit-for-bit."""
    compute_dtype = _dtype_of(compute_dtype_name)
    params = _maybe_unpack_s4(params)
    prefill_step = int_args[0]
    cross_cache, cross_mask, padding_mask = _conditioning(
        params, config, enc_input, compute_dtype, cross_window
    )
    quant = _kv_cache_quant(params) if kv_quant is None else kv_quant
    self_cache = _new_self_cache_sharded(
        config, CFG_BATCH, compute_dtype, cache_len, quant=quant)
    if prefill_window is not None:
        self_cache = _run_prefill(
            params, config, tokens_buf[None], prefill_window,
            jnp.zeros((1,), jnp.int32), prefill_step[None],
            cross_cache, cross_mask, padding_mask, self_cache, compute_dtype,
        )
    cross_cache = _quantize_cross(cross_cache, quant)
    dec0 = prefill_step.astype(jnp.int32) - 1
    prev_tok, bos_rows = _loop_entry_carries(config, tokens_buf, dec0)
    state = DecodeLoopState(
        tokens=tokens_buf,
        cache=self_cache,
        key=jax.random.PRNGKey(int_args[1]),
        dec_step=dec0,
        eos_detected=jnp.asarray(False),
        eos_countdown=jnp.asarray(-1, jnp.int32),
        bos_countdown=jnp.asarray(config.data.max_delay, jnp.int32),
        stop=jnp.asarray(False),
        prev_tok=prev_tok,
        bos_rows=bos_rows,
    )
    return state, cross_cache, cross_mask


@partial(
    jax.jit,
    static_argnames=("config", "greedy", "cfg_filter_top_k", "compute_dtype_name"),
    donate_argnames=("state",),
)
def decode_segment(
    params,
    config: DiaConfig,
    state: DecodeLoopState,
    cross_cache: KVCache,
    cross_mask: jax.Array,
    segment_end: jax.Array,  # scalar int32: run while dec_step < min(end, max-1)
    max_tokens: jax.Array,
    cfg_scale: jax.Array,
    temperature: jax.Array,
    top_p: jax.Array,
    greedy: bool,
    cfg_filter_top_k: int,
    compute_dtype_name: str,
) -> DecodeLoopState:
    """Resume the decode loop for one segment (streaming generation).

    Identical per-step semantics to the full loop; the carry is a pytree the
    host can hold between segments, so audio can be emitted incrementally
    while generation continues — a serving capability the reference lacks.
    """
    compute_dtype = _dtype_of(compute_dtype_name)
    params = _maybe_unpack_s4(params)

    def cond(s: DecodeLoopState):
        return (s.dec_step < jnp.minimum(segment_end, max_tokens - 1)) & (~s.stop)

    body = _make_loop_body(params, config, cross_cache, cross_mask, max_tokens,
                           cfg_scale, temperature, top_p, greedy, cfg_filter_top_k,
                           compute_dtype)
    return jax.lax.while_loop(cond, body, state)


@partial(jax.jit)
def _stream_snapshot(state: DecodeLoopState):
    """Device-side copies of the loop-state fields the streaming host loop
    reads (dec_step, stop, tokens).

    The ``+ 0`` / ``where`` ops force fresh output buffers, so the snapshot
    stays valid after the state itself is DONATED to the next
    ``decode_segment`` dispatch — that is what lets the pipelined stream
    enqueue segment k+1 before fetching segment k's results (the fetch's
    tunnel round trip then overlaps the next segment's device execution).
    """
    return (
        state.dec_step + 0,
        jnp.where(state.stop, True, False),
        state.tokens + 0,
    )


def _bucket(n: int, mult: int, cap: int) -> int:
    """Round ``n`` up to a multiple of ``mult``, clamped to [mult, cap]."""
    return min(cap, max(mult, -(-int(n) // mult) * mult))


def _cross_window_for(enc_input: np.ndarray, config: DiaConfig) -> int | None:
    """Static text-key bucket for the cross cache (128-multiples).  One
    executable per bucket; disable with DIA_CROSS_BUCKET=0."""
    import os

    if os.environ.get("DIA_CROSS_BUCKET", "1") == "0":
        return None
    d = config.data
    text_len = int((np.asarray(enc_input) != d.text_pad_value).sum(axis=-1).max())
    w = _bucket(text_len, 128, d.text_length)
    return None if w >= d.text_length else w


def _cache_len_for(max_tokens: int, floor: int, config: DiaConfig) -> int | None:
    """Static self-cache length bucket (256-multiples of max_tokens).  The
    decode step reads the whole cache buffer every token regardless of the
    valid prefix, so allocating ``audio_length`` slots for a short run pays
    full-length bandwidth; disable with DIA_CACHE_BUCKET=0."""
    import os

    if os.environ.get("DIA_CACHE_BUCKET", "1") == "0":
        return None
    cap = config.data.audio_length
    n = _bucket(max(int(max_tokens), int(floor)), 256, cap)
    return None if n >= cap else n


class DiaGenerator:
    """User-facing generation orchestrator (reference API: dia/model.py:631-846).

    Owns compiled prepare/prefill/decode functions; the host only tokenizes
    text, preps the audio-prompt template, launches the compiled loop, and
    slices the result.
    """

    def __init__(self, params, config: DiaConfig, compute_dtype: str = "float32"):
        self.params = params
        self.config = config
        self.compute_dtype = compute_dtype

    def generate_tokens(
        self,
        text: str,
        max_tokens: int | None = None,
        cfg_scale: float = 3.0,
        temperature: float = 1.3,
        top_p: float = 0.95,
        cfg_filter_top_k: int = 35,
        audio_prompt_codes: np.ndarray | None = None,
        audio_prompt_text: str | None = None,
        seed: int | None = None,
        verbose: bool = False,
        cache_len: int | None = None,
    ) -> np.ndarray:
        """Text → undelayed codec tokens [T, C] (delay already reverted).

        ``cache_len`` pins the static self-cache bucket (servers pass their
        max so every request length shares one executable); default = a
        256-bucket of ``max_tokens``."""
        cfg = self.config
        d = cfg.data
        if audio_prompt_codes is not None and not audio_prompt_text:
            raise ValueError("`audio_prompt_text` is required when `audio_prompt_codes` is provided.")
        effective_text = build_effective_text(text, audio_prompt_text)
        enc_input = encode_cfg_batch(effective_text, d.text_length, d.text_pad_value)
        max_tokens = d.audio_length if max_tokens is None else min(max_tokens, d.audio_length)

        delayed, prefill_step = prepare_audio_prompt(cfg, audio_prompt_codes)
        tokens_buf = np.full((d.audio_length, d.channels), -1, dtype=np.int32)
        tokens_buf[: delayed.shape[0]] = delayed

        # one compiled dispatch for the whole call: conditioning + prefill +
        # decode loop, scalars packed into two tiny arrays (transfer count
        # dominates time-to-first-audio on remote-attached accelerators)
        window = None
        if prefill_step > 1:
            window = _bucket(prefill_step - 1, 128, d.audio_length)
        int_args = np.asarray(
            [prefill_step, max_tokens, _resolve_seed(seed)], np.int32
        )
        float_args = np.asarray([cfg_scale, temperature, top_p], np.float32)

        t0 = time.perf_counter()
        tokens, final_step = generate_fused(
            self.params, cfg, jnp.asarray(enc_input), jnp.asarray(tokens_buf),
            jnp.asarray(int_args), jnp.asarray(float_args),
            prefill_window=window, greedy=(temperature == 0.0),
            cfg_filter_top_k=cfg_filter_top_k, compute_dtype_name=self.compute_dtype,
            cross_window=_cross_window_for(enc_input, cfg),
            cache_len=(_cache_len_for(max_tokens, window or 0, cfg)
                       if cache_len is None
                       else _cache_len_for(cache_len, window or 0, cfg)),
            kv_quant=_kv_cache_quant(self.params),
        )
        # one host fetch for both outputs: on remote-attached TPUs every
        # device->host read pays a tunnel round trip, and the two reads were
        # serialized (tokens, then the scalar)
        tokens, final_step = jax.device_get((tokens, final_step))
        final_step = int(final_step)
        if verbose:
            dt = time.perf_counter() - t0
            steps = final_step + 1 - prefill_step
            print(f"generate: {steps} steps in {dt:.3f}s ({steps / max(dt, 1e-9):.2f} tokens/s)")

        generated = tokens[prefill_step : final_step + 1]  # (reference: dia/model.py:831)
        if generated.shape[0] == 0:
            return np.zeros((0, d.channels), dtype=np.int32)

        # Delay-revert + tail trim + clamp (reference: dia/model.py:490-530).
        # Host-side: the generated length varies per call and a jitted gather
        # would recompile for every new length.
        reverted = revert_audio_delay_np(
            generated[None], d.audio_pad_value, tuple(d.delay_pattern), generated.shape[0]
        )[0]
        reverted = reverted[: max(0, reverted.shape[0] - d.max_delay)]
        invalid = (reverted < 0) | (reverted > 1023)
        reverted = np.where(invalid, 0, reverted)
        return reverted.astype(np.int32)

    def generate_tokens_stream(
        self,
        text: str,
        segment_steps: int = 128,
        max_tokens: int | None = None,
        cfg_scale: float = 3.0,
        temperature: float = 1.3,
        top_p: float = 0.95,
        cfg_filter_top_k: int = 35,
        audio_prompt_codes: np.ndarray | None = None,
        audio_prompt_text: str | None = None,
        seed: int | None = None,
    ):
        """Stream undelayed codec frames as generation progresses.

        Runs the decode loop in resumable segments of ``segment_steps`` and
        yields the newly *finalized* undelayed frames after each segment (a
        frame is final once all raw rows it gathers from exist, i.e. trailing
        ``max_delay`` rows stay pending).  The concatenation of all yields is
        bit-identical to ``generate_tokens`` for the same arguments, including
        voice-clone prompts (prefill runs inside ``prepare_stream``).
        """
        cfg = self.config
        d = cfg.data
        max_tokens = d.audio_length if max_tokens is None else min(max_tokens, d.audio_length)
        if audio_prompt_codes is not None and not audio_prompt_text:
            raise ValueError("`audio_prompt_text` is required when `audio_prompt_codes` is provided.")

        effective_text = build_effective_text(text, audio_prompt_text)
        enc_input = encode_cfg_batch(effective_text, d.text_length, d.text_pad_value)
        delayed, prefill_step = prepare_audio_prompt(cfg, audio_prompt_codes)
        tokens_buf = np.full((d.audio_length, d.channels), -1, dtype=np.int32)
        tokens_buf[: delayed.shape[0]] = delayed

        window = None
        if prefill_step > 1:
            window = _bucket(prefill_step - 1, 128, d.audio_length)
        state, cross_cache, cross_mask = prepare_stream(
            self.params, cfg, jnp.asarray(enc_input), jnp.asarray(tokens_buf),
            jnp.asarray([prefill_step, _resolve_seed(seed)], jnp.int32),
            prefill_window=window, compute_dtype_name=self.compute_dtype,
            cross_window=_cross_window_for(enc_input, cfg),
            cache_len=_cache_len_for(max_tokens, window or 0, cfg),
            kv_quant=_kv_cache_quant(self.params),
        )
        greedy = temperature == 0.0
        f_cfg = jnp.asarray(cfg_scale, jnp.float32)
        f_temp = jnp.asarray(temperature, jnp.float32)
        f_topp = jnp.asarray(top_p, jnp.float32)
        mt = jnp.asarray(max_tokens, jnp.int32)

        import os

        pipelined = os.environ.get("DIA_STREAM_PIPELINE", "1") != "0"

        def run_segment(st, end):
            return decode_segment(
                self.params, cfg, st, cross_cache, cross_mask,
                jnp.asarray(end, jnp.int32), mt, f_cfg, f_temp, f_topp,
                greedy=greedy, cfg_filter_top_k=cfg_filter_top_k,
                compute_dtype_name=self.compute_dtype,
            )

        emitted = 0
        seg_end = min(prefill_step - 1 + segment_steps, max_tokens - 1)
        state = run_segment(state, seg_end)
        while True:
            if pipelined:
                # Double-buffer (round-5 task 6): snapshot the finished
                # segment's results on device, speculatively enqueue the NEXT
                # segment (donating the state), THEN fetch the snapshot — the
                # device decodes segment k+1 while the host pays the tunnel
                # round trip, the delay-revert, and (in stream_decode_wav)
                # the codec decode for segment k.  If the fetched snapshot
                # says stop, the in-flight segment's while_loop cond is False
                # on entry, so the wasted dispatch costs ~nothing.  Yields are
                # computed from the same snapshots as the serial path —
                # bit-identical output.
                snap = _stream_snapshot(state)
                if seg_end < max_tokens - 1:
                    seg_end = min(seg_end + segment_steps, max_tokens - 1)
                    state = run_segment(state, seg_end)
                dec_step, stop, host_tokens = jax.device_get(snap)
            else:
                # one tunnel round trip per segment instead of three serialized ones
                dec_step, stop, host_tokens = jax.device_get(
                    (state.dec_step, state.stop, state.tokens))
            dec_step, stop = int(dec_step), bool(stop)
            raw = host_tokens[prefill_step : dec_step + 1]
            n_final = max(0, raw.shape[0] - d.max_delay)
            if n_final > emitted:
                reverted = revert_audio_delay_np(
                    raw[None], d.audio_pad_value, tuple(d.delay_pattern), raw.shape[0]
                )[0][:n_final]
                reverted = np.where((reverted < 0) | (reverted > 1023), 0, reverted)
                yield reverted[emitted:].astype(np.int32)
                emitted = n_final
            if stop or dec_step >= max_tokens - 1:
                return
            if not pipelined:
                seg_end = min(seg_end + segment_steps, max_tokens - 1)
                state = run_segment(state, seg_end)

    def generate_tokens_batch(
        self,
        texts: list[str],
        max_tokens: int | None = None,
        cfg_scale: float = 3.0,
        temperature: float = 1.3,
        top_p: float = 0.95,
        cfg_filter_top_k: int = 35,
        audio_prompt_codes: "list[np.ndarray | None] | None" = None,
        audio_prompt_texts: "list[str | None] | None" = None,
        seed: int | None = None,
        seeds: "list[int | None] | None" = None,
        cache_len: int | None = None,
    ) -> list[np.ndarray]:
        """N independent prompts → N undelayed token arrays, decoded in one
        batched device-resident loop (2N CFG rows).  Aggregate throughput
        scales with N because every stream shares the per-step weight reads.

        ``seeds`` gives each stream its own PRNG seed (``None`` entries get a
        fresh random one); ``seed`` applies one seed to every stream.  Either
        way stream ``i`` samples from its own key chain, so its tokens equal
        the single-stream run with that seed regardless of batch composition.

        Per-stream voice-clone prompts are supported: prompt templates are
        left-padded to a shared 128-bucket window so all prompts end on the
        same row, and RoPE positions/attention masks stay row-local — each
        stream reproduces its single-stream run exactly (the reference app's
        rolling-prompt pipeline, /root/reference/app.py:221-226, needs
        exactly this: every batch conditioned on audio prompts).
        """
        cfg = self.config
        d = cfg.data
        max_tokens = d.audio_length if max_tokens is None else min(max_tokens, d.audio_length)
        N = len(texts)
        if N == 0:
            return []
        prompts = audio_prompt_codes or [None] * N
        prompt_texts = audio_prompt_texts or [None] * N
        if len(prompts) != N or len(prompt_texts) != N:
            raise ValueError("audio prompt lists must match len(texts)")
        for p, pt in zip(prompts, prompt_texts):
            if p is not None and not pt:
                raise ValueError("`audio_prompt_texts[i]` is required when `audio_prompt_codes[i]` is provided.")

        conds = [
            encode_cfg_batch(build_effective_text(t, pt), d.text_length, d.text_pad_value)
            for t, pt in zip(texts, prompt_texts)
        ]
        # rows [uncond×N ; cond×N]
        enc_input = np.concatenate(
            [np.stack([c[0] for c in conds]), np.stack([c[1] for c in conds])], axis=0
        )

        templates = [prepare_audio_prompt(cfg, p) for p in prompts]
        prefill_steps = np.asarray([t[1] for t in templates], np.int32)
        window = None
        max_p = int(prefill_steps.max())
        if max_p > 1:
            # 128-bucketed window for executable reuse across prompt lengths;
            # exact window when the bucket would eat the generation budget
            # (all streams start generating at row `window`, unlike the
            # single-stream path where the window never shifts the loop)
            window = _bucket(max_p, 128, d.audio_length)
            if window > d.audio_length - 32:
                window = max_p
        start = window if window is not None else 1
        tokens_buf = np.full((N, d.audio_length, d.channels), -1, dtype=np.int32)
        for i, (delayed, p_i) in enumerate(templates):
            off = start - p_i
            tokens_buf[i, off : off + delayed.shape[0]] = delayed

        caps = np.minimum(max_tokens + (start - prefill_steps), d.audio_length)
        if seeds is not None:
            if len(seeds) != N:
                raise ValueError("seeds must match len(texts)")
            seed_arr = np.asarray([_resolve_seed(s) for s in seeds], np.int32)
        else:
            shared = _resolve_seed(seed) if seed is not None else None
            seed_arr = np.asarray(
                [shared if shared is not None else _resolve_seed(None) for _ in range(N)],
                np.int32,
            )
        int_args = np.asarray([max_tokens], np.int32)
        float_args = np.asarray([cfg_scale, temperature, top_p], np.float32)
        tokens, final_steps = generate_fused_batch(
            self.params, cfg, jnp.asarray(enc_input), jnp.asarray(tokens_buf),
            jnp.asarray(prefill_steps), jnp.asarray(seed_arr),
            jnp.asarray(int_args), jnp.asarray(float_args),
            prefill_window=window,
            greedy=(temperature == 0.0), cfg_filter_top_k=cfg_filter_top_k,
            compute_dtype_name=self.compute_dtype,
            cross_window=_cross_window_for(enc_input, cfg),
            cache_len=_cache_len_for(cache_len or int(caps.max()), start, cfg),
            kv_quant=_kv_cache_quant(self.params, batch=True),
        )
        # single tunnel round trip for both outputs (remote-attached TPU)
        tokens, final_steps = jax.device_get((tokens, final_steps))

        outs = []
        for i in range(N):
            generated = tokens[i, start : int(final_steps[i]) + 1]
            if generated.shape[0] == 0:
                outs.append(np.zeros((0, d.channels), np.int32))
                continue
            reverted = revert_audio_delay_np(
                generated[None], d.audio_pad_value, tuple(d.delay_pattern),
                generated.shape[0],
            )[0]
            reverted = reverted[: max(0, reverted.shape[0] - d.max_delay)]
            reverted = np.where((reverted < 0) | (reverted > 1023), 0, reverted)
            outs.append(reverted.astype(np.int32))
        return outs
