"""Inference-state builders: positions, padding masks, decode-loop carry.

Functional replacement for the reference's mutable state objects
(dia/state.py:42-208).  All state is fixed-shape arrays carried through
``lax.while_loop`` — the KV caches live in ``models.dia.KVCache`` and the
generated-token buffer is a [T, C] array updated with dynamic slices.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import DiaConfig
from .models.dia import KVCache
from .ops.delay import apply_audio_delay_np
from .ops.masks import create_attn_mask


class EncoderState(NamedTuple):
    """Positions + masks for the encoder pass (reference: dia/state.py:42-69)."""

    positions: jax.Array  # [B, T]
    padding_mask: jax.Array  # bool [B, T]
    attn_mask: jax.Array  # bool [B, 1, T, T]


def new_encoder_state(config: DiaConfig, src_ids: jax.Array) -> EncoderState:
    B, T = src_ids.shape
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :], (B, T))
    padding_mask = src_ids != config.data.text_pad_value
    attn_mask = create_attn_mask(padding_mask, padding_mask, is_causal=False)
    return EncoderState(positions=positions, padding_mask=padding_mask, attn_mask=attn_mask)


def cross_attention_mask(enc_padding_mask: jax.Array) -> jax.Array:
    """Decoder→encoder mask for single-query decode: [B, 1, 1, S].

    Decoder queries are always treated as non-padding (reference:
    dia/state.py:138-140), so the mask reduces to the encoder key padding —
    the CFG unconditional row is fully masked and its cross-attn output is
    exactly zero (torch SDPA parity).
    """
    B, S = enc_padding_mask.shape
    q_mask = jnp.ones((B, 1), dtype=jnp.bool_)
    return create_attn_mask(q_mask, enc_padding_mask, is_causal=False)


class DecodeLoopState(NamedTuple):
    """Carry of the device-resident generation loop (replaces the per-token
    host bookkeeping at dia/model.py:738-815)."""

    tokens: jax.Array  # int32 [T_max, C] generated-token buffer (template = -1)
    cache: KVCache  # decoder self-attn KV
    key: jax.Array  # PRNG key
    dec_step: jax.Array  # int32 scalar — last completed step index
    eos_detected: jax.Array  # bool scalar
    eos_countdown: jax.Array  # int32 scalar (-1 = inactive)
    bos_countdown: jax.Array  # int32 scalar
    stop: jax.Array  # bool scalar
    # Perf carries: the loop body never READS the tokens buffer (write-only),
    # so each step's dynamic_update_slice stays off the serial critical path
    # (no HBM read-after-write between consecutive steps).
    prev_tok: jax.Array  # int32 [C] == tokens[dec_step] (next step's input)
    bos_rows: jax.Array  # int32 [max_delay, C] rolling window of the prompt
    # template at rows [dec_step+1, dec_step+1+max_delay) — feeds the
    # BOS-window masked write while bos_countdown > 0


def prepare_audio_prompt(
    config: DiaConfig, audio_codes: np.ndarray | None
) -> tuple[np.ndarray, int]:
    """BOS row + prompt codes + max-delay PAD rows, then the delay transform
    (reference: dia/model.py:291-353).  Host-side; returns (delayed [P+max_delay, C]
    int32, prefill_step = 1 + len(codes))."""
    d = config.data
    C = d.channels
    parts = [np.full((1, C), d.audio_bos_value, dtype=np.int32)]
    prefill_step = 1
    if audio_codes is not None:
        codes = np.asarray(audio_codes, dtype=np.int32)
        if codes.ndim == 3 and codes.shape[0] == 1:
            codes = codes[0]
        if codes.ndim != 2:
            raise ValueError(f"Unexpected audio prompt shape: {codes.shape}")
        prefill_step += codes.shape[0]
        parts.append(codes)
    parts.append(np.full((d.max_delay, C), d.audio_pad_value, dtype=np.int32))
    prefill_padded = np.concatenate(parts, axis=0)
    delayed = apply_audio_delay_np(
        prefill_padded[None],
        d.audio_pad_value,
        d.audio_bos_value,
        tuple(d.delay_pattern),
    )[0]
    return delayed, prefill_step
