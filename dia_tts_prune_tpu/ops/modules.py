"""Core model ops: generalized dense, RMSNorm, RoPE, SwiGLU MLP, attention.

Everything here is a pure function over parameter pytrees — the TPU-native
replacement for the reference's ``nn.Module`` layer zoo (dia/layers.py).
Design notes:

* ``dense_general`` lowers to a single ``lax.dot_general`` (XLA tiles it onto
  the MXU); kernels are stored in the same ``in_shapes + out_features`` layout
  as the reference (dia/layers.py:35-53), so torch checkpoints convert by
  tree-renaming alone.
* GQA attention avoids the reference's ``repeat_interleave`` KV materialization
  (dia/layers.py:314-320): queries are reshaped to [B, T, Nkv, G, H] and
  contracted against un-repeated KV — less HBM traffic, same math.
* Numerically sensitive islands (norms, SiLU gate, RoPE trig, softmax) run in
  float32 regardless of compute dtype, matching the reference's stability
  policy (dia/layers.py:101,161-173,393).
* The reference's ``RotaryEmbedding.forward`` crashes on 4-D inputs as written
  (missing head-axis broadcast, dia/layers.py:135-173 — quirk Q11); we
  implement the intended split-half RoPE with sin/cos broadcast over heads.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Primitive ops
# ---------------------------------------------------------------------------


def _prec(x: jax.Array):
    """fp32 operands contract at HIGHEST precision (true fp32 — required for
    parity with the torch reference; JAX's default is reduced-precision
    passes); bf16/f16 use the fast MXU default."""
    return jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None


def dense_general(x: jax.Array, kernel, axis: tuple[int, ...] = (-1,)) -> jax.Array:
    """Generalized dense layer: contract ``axis`` of ``x`` against the leading
    axes of ``kernel`` (reference: dia/layers.py:55-66). No bias, matching the
    reference. Lowers to one ``dot_general``.

    ``kernel`` may be a ``QuantizedKernel`` (int8 values + per-channel
    scales), in which case the contraction runs through the int8 Pallas
    matmul on TPU (halved weight bytes on the bandwidth-bound decode path) or
    a dequantize-then-dot fallback elsewhere.  A ``BlockSparseKernel``
    (block-pruned weights, ops/sparse.py) routes to the block-sparse Pallas
    matmul that DMA-skips all-zero weight blocks.
    """
    if type(kernel).__name__ == "QuantizedKernel":
        return _dense_general_q(x, kernel, axis)
    if type(kernel).__name__ == "Quantized4Kernel":
        return _dense_general_q4(x, kernel, axis)
    if type(kernel).__name__ == "BlockSparseKernel":
        return _dense_general_sparse(x, kernel, axis)
    norm_axis = tuple(ax if ax >= 0 else x.ndim + ax for ax in axis)
    kernel_axes = tuple(range(len(norm_axis)))
    x = x.astype(kernel.dtype)
    out = jnp.tensordot(x, kernel, axes=(norm_axis, kernel_axes), precision=_prec(x))
    return out


def _dense_general_q4(x: jax.Array, qk, axis: tuple[int, ...]) -> jax.Array:
    """int4-kernel contraction (weight-only, plain or grouped scales).

    Mirrors ``_dense_general_q``: values are pre-flattened so the int4→bf16
    convert can fuse into the dot's HBM operand read (plain layout) or the
    per-group partial-dot reduction (grouped layout) — int4 HBM bytes,
    bf16 MXU math, activations never quantized."""
    import math as _math

    n_in = len(axis)
    if n_in != len(qk.in_shape):
        raise ValueError(
            f"kernel packed for {len(qk.in_shape)} contraction axes, called with {n_in}")
    K = _math.prod(qk.in_shape)
    lead = x.shape[: x.ndim - n_in]
    x2 = x.reshape(-1, K)
    from .kernels.int4_matmul import (
        int4_matmul_grouped,
        int4_matmul_nibble,
        int4_matmul_nibble_grouped,
        int4_matmul_upcast,
    )

    if getattr(qk, "halfsplit", False):
        import os as _os

        from .kernels.int4_gemv import halfsplit_supported, int4_gemv_halfsplit
        from .kernels.int4_matmul import (
            int4_matmul_halfsplit,
            int4_matmul_halfsplit_grouped,
        )

        interpret = _os.environ.get("DIA_INT4_INTERPRET") == "1"
        N = _math.prod(qk.out_shape)
        use_kernel = (
            (jax.default_backend() in ("tpu", "axon") or interpret)
            and _os.environ.get("DIA_INT4_IMPL", "pallas") == "pallas"
            and halfsplit_supported(x2.shape[0], K, N, qk.group)
        )
        if use_kernel:
            y = int4_gemv_halfsplit(x2, qk.values, qk.scale, interpret=interpret)
        elif qk.group is None:
            y = int4_matmul_halfsplit(x2, qk.values, qk.scale.reshape(-1))
        else:
            y = int4_matmul_halfsplit_grouped(x2, qk.values, qk.scale)
        return y.reshape(*lead, *qk.out_shape)
    if qk.nibble:
        if qk.group is None:
            y = int4_matmul_nibble(x2, qk.values, qk.scale.reshape(-1))
        else:
            y = int4_matmul_nibble_grouped(x2, qk.values, qk.scale)
    elif qk.group is None:
        y = int4_matmul_upcast(x2, qk.values, qk.scale.reshape(-1))
    elif getattr(qk, "layout", "kgn") == "kng":
        from .kernels.int4_matmul import int4_matmul_grouped_kng

        y = int4_matmul_grouped_kng(x2, qk.values, qk.scale)
    else:
        y = int4_matmul_grouped(x2, qk.values, qk.scale)
    return y.reshape(*lead, *qk.out_shape)


def _use_pallas_int8() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _dense_general_q(x: jax.Array, qk, axis: tuple[int, ...]) -> jax.Array:
    """int8-kernel contraction. Trailing contraction axes only (all call
    sites contract trailing axes).

    ``qk.values`` is ALREADY 2-D [K, N] (ops/quant.py packs kernels
    pre-flattened) — consuming it without any reshape is what lets XLA fuse
    the int8→compute-dtype convert into the dot's HBM operand read instead
    of staging the slice through VMEM (tools/trace_decode.py evidence)."""
    import math as _math

    n_in = len(axis)
    if n_in != len(qk.in_shape):
        raise ValueError(
            f"kernel packed for {len(qk.in_shape)} contraction axes, called with {n_in}")
    K = _math.prod(qk.in_shape)
    N = _math.prod(qk.out_shape)
    out_shape = qk.out_shape
    lead = x.shape[: x.ndim - n_in]
    x2 = x.reshape(-1, K)
    w2 = qk.values
    scale = qk.scale.reshape(N)
    import os as _os

    mode = _os.environ.get("DIA_INT8_IMPL", "upcast")
    if _use_pallas_int8() and x2.shape[0] <= 64 and mode == "pallas":
        # hand-rolled streaming kernel (kept for tuning; XLA's fused-convert
        # dot pipelines better)
        from .kernels.int8_matmul import int8_matmul

        y = int8_matmul(x2, w2, scale)
    elif mode == "upcast":
        # default: weight-only int8, convert fused into the dot's operand
        # load — int8 HBM bytes, bf16 MXU math, no activation quantization
        # (measured fastest: tools/microbench_decode.py / docs/PERF.md)
        from .kernels.int8_matmul import int8_matmul_upcast

        y = int8_matmul_upcast(x2, w2, scale)
    elif _use_pallas_int8() and mode != "dequant":
        # XLA-native dynamic int8: s8×s8 MXU contraction, int8 weight bytes
        from .kernels.int8_matmul import int8_matmul_xla

        y = int8_matmul_xla(x2, w2, scale)
    else:
        from .kernels.int8_matmul import int8_matmul_reference

        y = int8_matmul_reference(x2, w2, scale)
    return y.reshape(*lead, *out_shape)


def _dense_general_sparse(x: jax.Array, sk, axis: tuple[int, ...]) -> jax.Array:
    """Block-sparse contraction for pruned kernels (ops/sparse.py).

    On TPU (or under ``DIA_SPARSE_INTERPRET=1``) the block-sparse Pallas
    matmul reads only nonzero weight blocks — weight HBM bytes scale with
    block density on the bandwidth-bound decode path.  Elsewhere, a dense dot
    over the zero-filled values (bit-identical result, no savings)."""
    import math as _math
    import os as _os

    n_in = len(axis)
    if n_in != len(sk.in_shape):
        raise ValueError(
            f"kernel packed for {len(sk.in_shape)} contraction axes, called with {n_in}")
    K = _math.prod(sk.in_shape)
    lead = x.shape[: x.ndim - n_in]
    x2 = x.reshape(-1, K)
    interpret = _os.environ.get("DIA_SPARSE_INTERPRET") == "1"
    if (jax.default_backend() in ("tpu", "axon") or interpret) and (
        _os.environ.get("DIA_SPARSE_IMPL", "pallas") == "pallas"
    ):
        from .kernels.sparse_matmul import block_sparse_matmul

        y = block_sparse_matmul(
            x2.astype(sk.values.dtype), sk.values, sk.indices, sk.counts,
            block_k=sk.block_k, block_n=sk.block_n, interpret=interpret,
        )
    else:
        y = jnp.dot(x2.astype(sk.values.dtype), sk.values, precision=_prec(x2))
    return y.reshape(*lead, *sk.out_shape)


def rms_norm(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    """RMSNorm in float32 (reference: torch.nn.RMSNorm used at dia/layers.py:360-393)."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    normed = x32 * jax.lax.rsqrt(var + eps)
    return (normed * scale.astype(jnp.float32)).astype(x.dtype)


def rope(
    x: jax.Array,  # [B, T, N, H]
    position: jax.Array,  # [B, T]
    min_timescale: float,
    max_timescale: float,
) -> jax.Array:
    """Split-half rotary embedding, fp32 trig, broadcast over heads.

    freqs[i] = position / (min * (max/min)^(2i/H)); out = [x1*cos - x2*sin,
    x1*sin + x2*cos].  This is the intended semantics of the reference
    (dia/layers.py:108-173, with the Q11 head-broadcast fix applied).
    """
    H = x.shape[-1]
    half = H // 2
    fraction = (2.0 * jnp.arange(half, dtype=jnp.float32)) / H
    inv_freq = 1.0 / (min_timescale * (max_timescale / min_timescale) ** fraction)  # [H/2]
    freqs = position.astype(jnp.float32)[:, :, None, None] * inv_freq[None, None, None, :]
    sin = jnp.sin(freqs)  # [B, T, 1, H/2]
    cos = jnp.cos(freqs)
    x32 = x.astype(jnp.float32)
    x1, x2 = jnp.split(x32, 2, axis=-1)
    rotated = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return rotated.astype(x.dtype)


def mlp_block(params: Params, x: jax.Array) -> jax.Array:
    """SwiGLU MLP with fused gate/up projection (reference: dia/layers.py:69-105).

    params: {'wi_fused': {'kernel': [D, 2, F]}, 'wo': {'kernel': [F, D]}}.
    SiLU on the gate runs in float32.
    """
    fused = dense_general(x, params["wi_fused"]["kernel"])  # [..., 2, F]
    gate = fused[..., 0, :]
    up = fused[..., 1, :]
    hidden = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    return dense_general(hidden, params["wo"]["kernel"])


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


def _gqa_scores(q: jax.Array, k: jax.Array) -> jax.Array:
    """Attention logits without materializing repeated KV heads.

    q: [B, Tq, Nkv, G, H], k: [B, Tk, Nkv, H] -> [B, Nkv, G, Tq, Tk] (fp32).
    """
    return jnp.einsum(
        "btngh,bsnh->bngts", q, k,
        preferred_element_type=jnp.float32, precision=_prec(q),
    )


def sdpa(
    q: jax.Array,  # [B, Tq, Nq, H]
    k: jax.Array,  # [B, Tk, Nkv, H]
    v: jax.Array,  # [B, Tk, Nkv, H]
    mask: jax.Array | None,  # bool, broadcastable to [B, 1, Tq, Tk]; True = attend
    is_causal: bool = False,
) -> jax.Array:
    """Scaled dot-product attention with GQA, fp32 softmax.

    Matches ``F.scaled_dot_product_attention`` semantics as used by the
    reference (dia/layers.py:329-337): scale 1/sqrt(H), boolean mask where
    True means attend, optional causal triangle.
    Returns [B, Tq, Nq, H] in q.dtype.
    """
    B, Tq, Nq, H = q.shape
    Tk, Nkv = k.shape[1], k.shape[2]
    G = Nq // Nkv
    qg = q.reshape(B, Tq, Nkv, G, H)
    scores = _gqa_scores(qg, k) * (1.0 / math.sqrt(H))  # [B, Nkv, G, Tq, Tk] fp32

    # Large-negative (not -inf) masking + guarded normalization: fully masked
    # rows produce exactly-zero outputs, matching torch SDPA's behavior on the
    # CFG unconditional branch (all-padding text keys), with no NaNs anywhere.
    neg = jnp.float32(jnp.finfo(jnp.float32).min)
    if mask is not None:
        m = mask[:, :, None, :, :] if mask.ndim == 4 else mask  # [B,1,1,Tq,Tk]
        scores = jnp.where(m, scores, neg)
    if is_causal:
        causal = jnp.tril(jnp.ones((Tq, Tk), dtype=jnp.bool_))
        scores = jnp.where(causal[None, None, None, :, :], scores, neg)

    row_max = jax.lax.stop_gradient(jnp.max(scores, axis=-1, keepdims=True))
    row_max = jnp.where(row_max <= neg * 0.5, 0.0, row_max)
    unnorm = jnp.exp(scores - row_max)  # masked entries underflow to exactly 0
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    weights = (unnorm / jnp.maximum(denom, jnp.float32(1e-30))).astype(q.dtype)
    out = jnp.einsum("bngts,bsnh->btngh", weights, v, precision=_prec(q))
    return out.reshape(B, Tq, Nq, H)


def attention_qkv(
    params: Params,
    x_q: jax.Array,  # [B, Tq, Dq]
    x_kv: jax.Array,  # [B, Tkv, Dkv]
    q_positions: jax.Array,  # [B, Tq]
    kv_positions: jax.Array,  # [B, Tkv]
    rope_min: float,
    rope_max: float,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Project q/k/v and apply RoPE to q and k (reference: dia/layers.py:271-279).

    params: {'q_proj'|'k_proj'|'v_proj': {'kernel': [D, N, H]}, 'o_proj': ...}.
    Returns (q [B,Tq,Nq,H], k [B,Tkv,Nkv,H], v [B,Tkv,Nkv,H]).
    """
    q = dense_general(x_q, params["q_proj"]["kernel"])
    k = dense_general(x_kv, params["k_proj"]["kernel"])
    v = dense_general(x_kv, params["v_proj"]["kernel"])
    q = rope(q, q_positions, rope_min, rope_max)
    k = rope(k, kv_positions, rope_min, rope_max)
    return q, k, v


def attention_out(params: Params, attn: jax.Array) -> jax.Array:
    """Output projection contracting (head, head_dim) (reference: dia/layers.py:222-227)."""
    return dense_general(attn, params["o_proj"]["kernel"], axis=(-2, -1))


def _use_flash() -> bool:
    import os

    if os.environ.get("DIA_FLASH_INTERPRET") == "1":  # test hook (any backend)
        return True
    # default ON for TPU backends: measured 27% faster training steps and
    # parity on inference at Dia's sizes; DIA_FLASH_ATTN=0 opts out
    return (
        os.environ.get("DIA_FLASH_ATTN", "1") != "0"
        and jax.default_backend() in ("tpu", "axon")
    )


def full_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None,
    is_causal: bool,
    q_segment_ids: jax.Array | None = None,
    kv_segment_ids: jax.Array | None = None,
) -> jax.Array:
    """Full-sequence attention dispatcher.

    When segment ids are available (they carry the same information as the
    reference's segment-style mask — see ops/masks.py) and DIA_FLASH_ATTN=1
    on a TPU backend, route through the blockwise flash kernel: the [Tq, Tk]
    score matrix never materializes, which is the memory (and often speed)
    win for 3072-length training/prefill.  Otherwise, masked XLA attention.
    """
    H = q.shape[-1]
    if _use_flash() and q_segment_ids is not None and kv_segment_ids is not None:
        import math
        import os

        from .kernels.flash_attention import flash_attention_trainable

        interpret = os.environ.get("DIA_FLASH_INTERPRET") == "1"
        # Mosaic tiles are 128 lanes wide: lane-pad head_dim up to 128 (the
        # kernel handles time-axis padding itself).  Pre-scaling q keeps
        # softmax(q·k/√H) exact — the kernel divides by √H_pad — and the
        # zero-padded v columns are trimmed after.  Real Dia configs have
        # head_dim 128 (no padding); this keeps small test/ablation configs
        # on the SAME kernel code path instead of silently falling back.
        Hpad = -(-H // 128) * 128
        if Hpad != H:
            q = q * math.sqrt(Hpad / H)
            padw = ((0, 0), (0, 0), (0, 0), (0, Hpad - H))
            q, k, v = (jnp.pad(a, padw) for a in (q, k, v))
        # the trainable variant (custom VJP with flash backward kernels) is
        # the single entry — identical forward, differentiable
        out = flash_attention_trainable(q, k, v, q_segment_ids, kv_segment_ids,
                                        is_causal, 256, 512, interpret)
        return out[..., :H] if Hpad != H else out
    return sdpa(q, k, v, mask, is_causal=is_causal)


def attention(
    params: Params,
    x_q: jax.Array,
    x_kv: jax.Array,
    q_positions: jax.Array,
    kv_positions: jax.Array,
    mask: jax.Array | None,
    rope_min: float,
    rope_max: float,
    is_causal: bool = False,
    q_segment_ids: jax.Array | None = None,
    kv_segment_ids: jax.Array | None = None,
) -> jax.Array:
    """Full-sequence attention (no cache) — encoder self-attn / training decoder."""
    q, k, v = attention_qkv(params, x_q, x_kv, q_positions, kv_positions, rope_min, rope_max)
    out = full_attention(q, k, v, mask, is_causal, q_segment_ids, kv_segment_ids)
    return attention_out(params, out)
