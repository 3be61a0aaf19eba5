"""Attention-mask builders (JAX segment-id style).

Reproduces the reference mask semantics (dia/state.py:8-39): a query position
may attend a key position iff both are non-padding OR both are padding (the
pad↔pad rule keeps softmax rows from being all -inf on fully padded rows),
optionally AND-ed with a causal triangle.

Masks are boolean [B, 1, Tq, Tk] (True = attend), broadcast over heads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def create_attn_mask(
    q_padding_mask_1d: jax.Array,  # bool [B, Tq]
    k_padding_mask_1d: jax.Array,  # bool [B, Tk]
    is_causal: bool = False,
) -> jax.Array:
    """Segment-style padding mask, optionally causal (reference: dia/state.py:8-39)."""
    p_q = q_padding_mask_1d[:, :, None]  # [B, Tq, 1]
    p_k = k_padding_mask_1d[:, None, :]  # [B, 1, Tk]
    non_pad_attends_non_pad = p_q & p_k
    pad_attends_pad = (~p_q) & (~p_k)
    mask = non_pad_attends_non_pad | pad_attends_pad  # [B, Tq, Tk]
    if is_causal:
        Tq = q_padding_mask_1d.shape[1]
        Tk = k_padding_mask_1d.shape[1]
        causal = jnp.tril(jnp.ones((Tq, Tk), dtype=jnp.bool_))
        mask = mask & causal[None, :, :]
    return mask[:, None, :, :]  # [B, 1, Tq, Tk]
