"""Pallas TPU kernel: single-step GQA decode attention over a KV cache.

The generation hot loop attends one query token against the cache prefix
``[0, valid_len)`` every step.  The XLA fallback masks a full fixed-length
attention (reads all T cache slots); this kernel reads only the valid prefix:
the chunk index map clamps trailing chunks to the last valid chunk, and
Mosaic's pipeline skips the DMA when the block index repeats — so HBM traffic
scales with the generated length, not the cache capacity.

Layout matches the model's cache ([B, T, Nkv, H]); GQA is computed without
materializing repeated KV heads (one MXU contraction per KV head over the
grouped queries).  Online (flash) softmax accumulates across chunks in VMEM
scratch.

Replaces: ATen fused SDPA on the reference's decode path
(dia/layers.py:329-337) — SURVEY.md §2b "single-query decode-step attention
against a device-resident KV cache".
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(valid_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, n_kv, group, chunk):
    c = pl.program_id(1)
    num_chunks = pl.num_programs(1)
    valid = valid_ref[0]

    @pl.when(c == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    chunk_start = c * chunk

    @pl.when(chunk_start < valid)
    def _():
        n_q = n_kv * group
        H = q_ref.shape[-1]
        scale = 1.0 / math.sqrt(H)
        q = q_ref[0]  # [Nq, H]

        # scores per kv head: grouped queries vs this head's keys
        parts = []
        for n in range(n_kv):
            qn = q[n * group : (n + 1) * group, :]
            kn = k_ref[0, :, n, :]  # [chunk, H]
            parts.append(
                jax.lax.dot_general(
                    qn, kn, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
            )
        s = jnp.concatenate(parts, axis=0) * scale  # [Nq, chunk] fp32

        pos = chunk_start + jax.lax.broadcasted_iota(jnp.int32, (n_q, chunk), 1)
        s = jnp.where(pos < valid, s, NEG)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # [Nq, chunk]
        l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)

        outs = []
        for n in range(n_kv):
            pn = p[n * group : (n + 1) * group, :]
            vn = v_ref[0, :, n, :].astype(jnp.float32)  # [chunk, H]
            outs.append(
                jax.lax.dot_general(
                    pn, vn, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
            )
        o = jnp.concatenate(outs, axis=0)  # [Nq, H]

        acc_scr[:] = acc_scr[:] * alpha + o
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(c == num_chunks - 1)
    def _():
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def decode_attention(
    q: jax.Array,  # [B, Nq, H] single-step queries (RoPE applied)
    k_cache: jax.Array,  # [B, T, Nkv, H]
    v_cache: jax.Array,  # [B, T, Nkv, H]
    valid_len: jax.Array,  # scalar int32: #valid slots (attend [0, valid_len))
    chunk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Returns [B, Nq, H] attention output in q.dtype."""
    B, Nq, H = q.shape
    T, Nkv = k_cache.shape[1], k_cache.shape[2]
    group = Nq // Nkv
    chunk = min(chunk, T)
    num_chunks = pl.cdiv(T, chunk)

    valid = jnp.asarray(valid_len, jnp.int32).reshape(1)

    def k_index(b, c, valid_ref):
        # index maps receive (grid indices..., scalar-prefetch refs...)
        last = jnp.maximum((valid_ref[0] - 1) // chunk, 0)
        return (b, jnp.minimum(c, last), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, num_chunks),
        in_specs=[
            pl.BlockSpec((1, Nq, H), lambda b, c, v: (b, 0, 0)),
            pl.BlockSpec((1, chunk, Nkv, H), k_index),
            pl.BlockSpec((1, chunk, Nkv, H), k_index),
        ],
        out_specs=pl.BlockSpec((1, Nq, H), lambda b, c, v: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Nq, 128), jnp.float32),
            pltpu.VMEM((Nq, 128), jnp.float32),
            pltpu.VMEM((Nq, H), jnp.float32),
        ],
    )
    kernel = functools.partial(_kernel, n_kv=Nkv, group=group, chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Nq, H), q.dtype),
        interpret=interpret,
    )(valid, q, k_cache, v_cache)


def decode_attention_reference(q, k_cache, v_cache, valid_len):
    """XLA reference implementation (full-length masked attention)."""
    from ..modules import sdpa

    T = k_cache.shape[1]
    mask = (jnp.arange(T) < valid_len)[None, None, None, :]
    return sdpa(q[:, None], k_cache, v_cache, mask)[:, 0]
