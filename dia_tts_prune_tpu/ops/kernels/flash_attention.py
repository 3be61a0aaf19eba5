"""Pallas TPU kernel: flash attention with segment masking (+ causal).

Full-sequence attention for the encoder pass, decoder prompt prefill, and
teacher-forced training: blockwise online softmax so the [Tq, Tk] score
matrix never materializes in HBM, with the reference's segment-style mask
semantics (attend iff both positions share a segment id — the non-pad↔non-pad
OR pad↔pad rule of dia/state.py:8-39 is exactly segment equality of the
padding mask) and optional causal triangle.  Causal upper-triangle blocks are
skipped: compute is predicated off and the clamped index map suppresses their
DMAs.

GQA: query head ``n`` reads kv head ``n // group`` directly — no
repeat_interleave materialization (reference quirk at dia/layers.py:314-320).

Replaces: ATen fused SDPA on the reference's full-sequence paths
(dia/layers.py:329-337).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(q_ref, k_ref, v_ref, sq_ref, sk_ref, o_ref, m_scr, l_scr, acc_scr,
            *, bq, bk, causal):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(ik == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = iq * bq
    k_start = ik * bk
    run = (k_start <= q_start + bq - 1) if causal else True

    @pl.when(run)
    def _():
        q = q_ref[0, 0]  # [BQ, H]
        k = k_ref[0, 0]  # [BK, H]
        H = q.shape[-1]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (1.0 / math.sqrt(H))  # [BQ, BK]

        # segment ids come in as full [B, T] arrays (TPU block tiling rejects
        # (1, bq) blocks); slice the current tiles here
        seg_q = sq_ref[b, pl.ds(iq * bq, bq)]  # [BQ] int32
        k_blk = ik
        if causal:
            k_blk = jnp.minimum(ik, (iq * bq + bq - 1) // bk)
        seg_k = sk_ref[b, pl.ds(k_blk * bk, bk)]  # [BK]
        mask = seg_q[:, None] == seg_k[None, :]
        if causal:
            rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            mask = mask & (rows >= cols)
        s = jnp.where(mask, s, NEG)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        # fully-masked-so-far rows keep m == NEG; shift to 0 to avoid overflow
        m_safe = jnp.where(m_new <= NEG * 0.5, 0.0, m_new)
        alpha = jnp.exp(jnp.where(m_prev <= NEG * 0.5, m_prev, m_prev - m_safe))
        p = jnp.exp(s - m_safe)
        p = jnp.where(mask, p, 0.0)
        l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, H]
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == n_k - 1)
    def _():
        # zero output for fully-masked rows (torch SDPA parity on the CFG
        # unconditional branch)
        o_ref[0, 0] = (acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_k", "interpret"))
def flash_attention(
    q: jax.Array,  # [B, Tq, Nq, H]
    k: jax.Array,  # [B, Tk, Nkv, H]
    v: jax.Array,  # [B, Tk, Nkv, H]
    q_segment_ids: jax.Array,  # int32 [B, Tq] (padding mask works: 0=pad, 1=real)
    kv_segment_ids: jax.Array,  # int32 [B, Tk]
    causal: bool = False,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Returns [B, Tq, Nq, H] in q.dtype."""
    B, Tq, Nq, H = q.shape
    Tk, Nkv = k.shape[1], k.shape[2]
    group = Nq // Nkv
    bq = min(block_q, Tq)
    bk = min(block_k, Tk)
    n_q = pl.cdiv(Tq, bq)
    n_k = pl.cdiv(Tk, bk)

    # head-major layout so kernel tiles are (T, H)-shaped
    qt = q.transpose(0, 2, 1, 3)  # [B, Nq, Tq, H]
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    def k_index(b, n, iq, ik):
        if causal:
            # clamp blocks above the diagonal to the last needed block: the
            # repeated index suppresses their DMA and `run` skips compute
            ik = jnp.minimum(ik, (iq * bq + bq - 1) // bk)
        return (b, n // group, ik, 0)

    out = pl.pallas_call(
        functools.partial(_kernel, bq=bq, bk=bk, causal=causal),
        grid=(B, Nq, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, 1, bq, H), lambda b, n, iq, ik: (b, n, iq, 0)),
            pl.BlockSpec((1, 1, bk, H), k_index),
            pl.BlockSpec((1, 1, bk, H), k_index),
            pl.BlockSpec(q_segment_ids.shape, lambda b, n, iq, ik: (0, 0)),
            pl.BlockSpec(kv_segment_ids.shape, lambda b, n, iq, ik: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, H), lambda b, n, iq, ik: (b, n, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Nq, Tq, H), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, H), jnp.float32),
        ],
        interpret=interpret,
    )(qt, kt, vt, q_segment_ids.astype(jnp.int32), kv_segment_ids.astype(jnp.int32))
    return out.transpose(0, 2, 1, 3)


def flash_attention_reference(q, k, v, q_segment_ids, kv_segment_ids, causal=False):
    """XLA reference via the shared sdpa (segment mask = id equality)."""
    from ..modules import sdpa

    mask = (q_segment_ids[:, :, None] == kv_segment_ids[:, None, :])[:, None]
    return sdpa(q, k, v, mask, is_causal=causal)
