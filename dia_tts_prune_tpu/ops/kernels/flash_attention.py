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
        seg_q = sq_ref[b, pl.ds(pl.multiple_of(iq * bq, 128), bq)]  # [BQ] int32
        k_blk = ik
        if causal:
            k_blk = jnp.minimum(ik, (iq * bq + bq - 1) // bk)
        seg_k = sk_ref[b, pl.ds(pl.multiple_of(k_blk * bk, 128), bk)]  # [BK]
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


def _round_block(block: int, T: int) -> int:
    """Block sizes must be lane-aligned: Mosaic requires dynamic-slice starts
    provably divisible by 128, so blocks are 128-multiples (time axes are
    padded up to a block multiple)."""
    return -(-min(block, max(T, 1)) // 128) * 128


def _pad_time(x: jax.Array, seg: jax.Array, block: int, sentinel: int):
    """Pad the time axis to a block multiple.

    ``pl.ds`` on the full segment arrays clamps out-of-bounds starts, so
    ragged tail blocks would read wrong segment ids (pad keys masquerading as
    real).  Padding with a sentinel id that can never match (-1 for queries,
    -2 for keys) makes every padded position fully masked; padded outputs are
    sliced away by the callers.
    """
    T = x.shape[1]
    pad = (-T) % block
    if pad == 0:
        return x, seg.astype(jnp.int32), T
    x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
    seg = jnp.pad(seg.astype(jnp.int32), ((0, 0), (0, pad)), constant_values=sentinel)
    return x, seg, T


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
    Tq0 = q.shape[1]
    bq = _round_block(block_q, q.shape[1])
    bk = _round_block(block_k, k.shape[1])
    q, q_segment_ids, _ = _pad_time(q, q_segment_ids, bq, sentinel=-1)
    k, kv_segment_ids, _ = _pad_time(k, kv_segment_ids, bk, sentinel=-2)
    v = jnp.pad(v, ((0, 0), (0, k.shape[1] - v.shape[1]), (0, 0), (0, 0)))
    B, Tq, Nq, H = q.shape
    Tk, Nkv = k.shape[1], k.shape[2]
    group = Nq // Nkv
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
    )(qt, kt, vt, q_segment_ids, kv_segment_ids)
    return out.transpose(0, 2, 1, 3)[:, :Tq0]


# ---------------------------------------------------------------------------
# Backward (custom VJP): recompute-p flash backward in two kernels
# ---------------------------------------------------------------------------


def _fwd_kernel_lse(q_ref, k_ref, v_ref, sq_ref, sk_ref, o_ref, lse_ref,
                    m_scr, l_scr, acc_scr, *, bq, bk, causal):
    """Forward kernel variant that also emits the log-sum-exp rows."""
    b = pl.program_id(0)
    n = pl.program_id(1)
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
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        H = q.shape[-1]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (1.0 / math.sqrt(H))
        seg_q = sq_ref[b, pl.ds(pl.multiple_of(iq * bq, 128), bq)]
        k_blk = jnp.minimum(ik, (iq * bq + bq - 1) // bk) if causal else ik
        seg_k = sk_ref[b, pl.ds(pl.multiple_of(k_blk * bk, 128), bk)]
        mask = seg_q[:, None] == seg_k[None, :]
        if causal:
            rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            mask = mask & (rows >= cols)
        s = jnp.where(mask, s, NEG)
        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        m_safe = jnp.where(m_new <= NEG * 0.5, 0.0, m_new)
        alpha = jnp.exp(jnp.where(m_prev <= NEG * 0.5, m_prev, m_prev - m_safe))
        p = jnp.where(mask, jnp.exp(s - m_safe), 0.0)
        l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == n_k - 1)
    def _():
        l_safe = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0, 0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        m_val = m_scr[:, :1]
        m_val = jnp.where(m_val <= NEG * 0.5, 0.0, m_val)
        # lse written into the [B, Nq, Tq] buffer (full-block output per b)
        lse_ref[0, n, pl.ds(pl.multiple_of(iq * bq, 128), bq)] = (m_val + jnp.log(l_safe))[:, 0]


def _bwd_kv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref, sq_ref, sk_ref,
                   dk_ref, dv_ref, dk_scr, dv_scr, *, bq, bk, causal, scale):
    b = pl.program_id(0)
    n = pl.program_id(1)
    ikv = pl.program_id(2)
    iq = pl.program_id(3)
    n_q = pl.num_programs(3)

    @pl.when(iq == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    k_start = ikv * bk
    q_start = iq * bq
    run = (q_start + bq - 1 >= k_start) if causal else True

    @pl.when(run)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)  # [bq, H]
        k = k_ref[0, 0].astype(jnp.float32)  # [bk, H]
        v = v_ref[0, 0].astype(jnp.float32)
        do = do_ref[0, 0].astype(jnp.float32)  # [bq, H]
        lse = lse_ref[b, n, pl.ds(pl.multiple_of(q_start, 128), bq)]  # [bq]
        dd = dd_ref[b, n, pl.ds(pl.multiple_of(q_start, 128), bq)]  # [bq]
        seg_q = sq_ref[b, pl.ds(pl.multiple_of(q_start, 128), bq)]
        seg_k = sk_ref[b, pl.ds(pl.multiple_of(k_start, 128), bk)]
        mask = seg_q[:, None] == seg_k[None, :]
        if causal:
            rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            mask = mask & (rows >= cols)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        p = jnp.where(mask, jnp.exp(s - lse[:, None]), 0.0)  # [bq, bk]
        dv_scr[:] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bk, H]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        ds = p * (dp - dd[:, None]) * scale
        dk_scr[:] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bk, H]

    @pl.when(iq == n_q - 1)
    def _():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_q_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref, sq_ref, sk_ref,
                  dq_ref, dq_scr, *, bq, bk, causal, scale):
    b = pl.program_id(0)
    n = pl.program_id(1)
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(ik == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q_start = iq * bq
    k_start = ik * bk
    run = (k_start <= q_start + bq - 1) if causal else True

    @pl.when(run)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[b, n, pl.ds(pl.multiple_of(q_start, 128), bq)]
        dd = dd_ref[b, n, pl.ds(pl.multiple_of(q_start, 128), bq)]
        seg_q = sq_ref[b, pl.ds(pl.multiple_of(q_start, 128), bq)]
        k_blk = jnp.minimum(ik, (iq * bq + bq - 1) // bk) if causal else ik
        seg_k = sk_ref[b, pl.ds(pl.multiple_of(k_blk * bk, 128), bk)]
        mask = seg_q[:, None] == seg_k[None, :]
        if causal:
            rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            mask = mask & (rows >= cols)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        p = jnp.where(mask, jnp.exp(s - lse[:, None]), 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - dd[:, None]) * scale
        dq_scr[:] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, H]

    @pl.when(ik == n_k - 1)
    def _():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _fwd_with_lse(qt, kt, vt, sq, sk, causal, bq, bk, interpret):
    """Head-major forward returning (out [B,Nq,Tq,H], lse [B,Nq,Tq])."""
    B, Nq, Tq, H = qt.shape
    Nkv, Tk = kt.shape[1], kt.shape[2]
    group = Nq // Nkv
    n_q = pl.cdiv(Tq, bq)
    n_k = pl.cdiv(Tk, bk)

    def k_index(b, n, iq, ik):
        if causal:
            ik = jnp.minimum(ik, (iq * bq + bq - 1) // bk)
        return (b, n // group, ik, 0)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_lse, bq=bq, bk=bk, causal=causal),
        grid=(B, Nq, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, 1, bq, H), lambda b, n, iq, ik: (b, n, iq, 0)),
            pl.BlockSpec((1, 1, bk, H), k_index),
            pl.BlockSpec((1, 1, bk, H), k_index),
            pl.BlockSpec(sq.shape, lambda b, n, iq, ik: (0, 0)),
            pl.BlockSpec(sk.shape, lambda b, n, iq, ik: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, H), lambda b, n, iq, ik: (b, n, iq, 0)),
            pl.BlockSpec((1, Nq, Tq), lambda b, n, iq, ik: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Nq, Tq, H), qt.dtype),
            jax.ShapeDtypeStruct((B, Nq, Tq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, H), jnp.float32),
        ],
        interpret=interpret,
    )(qt, kt, vt, sq, sk)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def flash_attention_trainable(
    q: jax.Array,  # [B, Tq, Nq, H]
    k: jax.Array,  # [B, Tk, Nkv, H]
    v: jax.Array,
    q_segment_ids: jax.Array,  # int32 [B, Tq]
    kv_segment_ids: jax.Array,  # int32 [B, Tk]
    causal: bool = False,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention with a flash *backward* (recompute-p, two Pallas
    kernels) — usable inside training losses, unlike raw pallas_call which
    has no VJP.  GQA: dK/dV accumulate per query head, then reduce over the
    group."""
    out, _ = _flash_fwd(q, k, v, q_segment_ids, kv_segment_ids,
                        causal, block_q, block_k, interpret)
    return out


def _flash_fwd(q, k, v, q_seg, kv_seg, causal, block_q, block_k, interpret):
    Tq0, Tk0 = q.shape[1], k.shape[1]
    bq = _round_block(block_q, Tq0)
    bk = _round_block(block_k, Tk0)
    qp, q_seg_p, _ = _pad_time(q, q_seg, bq, sentinel=-1)
    kp, kv_seg_p, _ = _pad_time(k, kv_seg, bk, sentinel=-2)
    vp = jnp.pad(v, ((0, 0), (0, kp.shape[1] - v.shape[1]), (0, 0), (0, 0)))
    qt = qp.transpose(0, 2, 1, 3)
    kt = kp.transpose(0, 2, 1, 3)
    vt = vp.transpose(0, 2, 1, 3)
    out_t, lse = _fwd_with_lse(qt, kt, vt, q_seg_p, kv_seg_p, causal, bq, bk, interpret)
    res = (qp, kp, vp, q_seg_p, kv_seg_p, out_t, lse, Tq0, Tk0)
    return out_t.transpose(0, 2, 1, 3)[:, :Tq0], res


def _flash_fwd_vjp(q, k, v, q_seg, kv_seg, causal, block_q, block_k, interpret):
    out, res = _flash_fwd(q, k, v, q_seg, kv_seg, causal, block_q, block_k, interpret)
    return out, res


def _flash_bwd_vjp(causal, block_q, block_k, interpret, res, g):
    q, k, v, q_seg, kv_seg, out_t, lse, Tq0, Tk0 = res
    B, Tq, Nq, H = q.shape
    Tk, Nkv = k.shape[1], k.shape[2]
    group = Nq // Nkv
    bq = min(block_q, Tq)
    bk = min(block_k, Tk)
    scale = 1.0 / math.sqrt(H)
    n_q = pl.cdiv(Tq, bq)
    n_k = pl.cdiv(Tk, bk)

    # cotangent arrives at the true length; zero-pad to the kernel length
    # (padded rows have p == 0 everywhere, so they contribute nothing)
    g = jnp.pad(g, ((0, 0), (0, Tq - g.shape[1]), (0, 0), (0, 0)))
    gt = g.transpose(0, 2, 1, 3)  # [B, Nq, Tq, H]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    dd = jnp.sum(gt.astype(jnp.float32) * out_t.astype(jnp.float32), axis=-1)  # [B,Nq,Tq]
    sq = q_seg.astype(jnp.int32)
    sk = kv_seg.astype(jnp.int32)

    def kv_index(b, n, ikv, iq):
        return (b, n // group, ikv, 0)

    full2 = lambda arr: pl.BlockSpec(arr.shape, lambda b, n, i, j: (0, 0))
    full3 = lambda arr: pl.BlockSpec(arr.shape, lambda b, n, i, j: (0, 0, 0))

    dk_per_head, dv_per_head = pl.pallas_call(
        functools.partial(_bwd_kv_kernel, bq=bq, bk=bk, causal=causal, scale=scale),
        grid=(B, Nq, n_k, n_q),
        in_specs=[
            pl.BlockSpec((1, 1, bq, H), lambda b, n, ikv, iq: (b, n, iq, 0)),  # q
            pl.BlockSpec((1, 1, bk, H), kv_index),  # k
            pl.BlockSpec((1, 1, bk, H), kv_index),  # v
            pl.BlockSpec((1, 1, bq, H), lambda b, n, ikv, iq: (b, n, iq, 0)),  # dO
            full3(lse), full3(dd), full2(sq), full2(sk),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bk, H), lambda b, n, ikv, iq: (b, n, ikv, 0)),
            pl.BlockSpec((1, 1, bk, H), lambda b, n, ikv, iq: (b, n, ikv, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Nq, Tk, H), jnp.float32),
            jax.ShapeDtypeStruct((B, Nq, Tk, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, H), jnp.float32),
            pltpu.VMEM((bk, H), jnp.float32),
        ],
        interpret=interpret,
    )(qt, kt, vt, gt, lse, dd, sq, sk)

    dq_t = pl.pallas_call(
        functools.partial(_bwd_q_kernel, bq=bq, bk=bk, causal=causal, scale=scale),
        grid=(B, Nq, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, 1, bq, H), lambda b, n, iq, ik: (b, n, iq, 0)),
            pl.BlockSpec((1, 1, bk, H), lambda b, n, iq, ik: (b, n // group, ik, 0)),
            pl.BlockSpec((1, 1, bk, H), lambda b, n, iq, ik: (b, n // group, ik, 0)),
            pl.BlockSpec((1, 1, bq, H), lambda b, n, iq, ik: (b, n, iq, 0)),
            full3(lse), full3(dd), full2(sq), full2(sk),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, H), lambda b, n, iq, ik: (b, n, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Nq, Tq, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bq, H), jnp.float32)],
        interpret=interpret,
    )(qt, kt, vt, gt, lse, dd, sq, sk)

    dq = dq_t.transpose(0, 2, 1, 3).astype(q.dtype)[:, :Tq0]
    dk = (
        dk_per_head.reshape(B, Nkv, group, Tk, H).sum(axis=2)
        .transpose(0, 2, 1, 3).astype(k.dtype)[:, :Tk0]
    )
    dv = (
        dv_per_head.reshape(B, Nkv, group, Tk, H).sum(axis=2)
        .transpose(0, 2, 1, 3).astype(v.dtype)[:, :Tk0]
    )
    import numpy as _np

    zseg_q = _np.zeros((q_seg.shape[0], Tq0), dtype=jax.dtypes.float0)
    zseg_k = _np.zeros((kv_seg.shape[0], Tk0), dtype=jax.dtypes.float0)
    return dq, dk, dv, zseg_q, zseg_k


flash_attention_trainable.defvjp(_flash_fwd_vjp, _flash_bwd_vjp)


def flash_attention_reference(q, k, v, q_segment_ids, kv_segment_ids, causal=False):
    """XLA reference via the shared sdpa (segment mask = id equality)."""
    from ..modules import sdpa

    mask = (q_segment_ids[:, :, None] == kv_segment_ids[:, None, :])[:, None]
    return sdpa(q, k, v, mask, is_causal=causal)
