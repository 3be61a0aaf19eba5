"""int4-weight matmul variants for the bandwidth-bound decode path.

Same playbook as the int8 path (int8_matmul.py): per-token decoding at
batch≈2 is a GEMV whose cost is weight bytes / HBM bandwidth, so int4
storage halves the traffic *again* versus int8 — IF the contraction consumes
the int4 values directly (XLA fusing the int4→bf16 convert into the dot's
operand load) instead of materializing a dequantized copy.

Two layouts:

* **plain** — values ``int4 [K, N]`` with one scale per output column.
  Structurally identical to ``int8_matmul_upcast``; cheapest metadata but a
  single scale must cover the whole column (coarse at 4 bits).
* **grouped** — values ``int4 [K//G, G, N]`` with a scale per
  ``(group, column)`` pair (G = 128 by default).  The quality-preserving
  layout (error is localized per 128-row group); the contraction becomes a
  per-group partial-dot + scaled reduction.

The reference has no 4-bit story at all (its int8 path is a no-op on the
transformer, quirk Q7 — /root/reference/app.py:51-63); this module exists
for the TPU serving headline where weight streaming is the entire decode
cost (docs/PERF.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mm_dtype(x):
    """XLA:CPU's thunk runtime cannot execute BF16×BF16→F32 dots
    (UNIMPLEMENTED DotThunk); do the math in f32 there — bf16 values are
    exact in f32, so only test-environment numerics change.  TPU keeps the
    bf16 MXU path."""
    if x.dtype == jnp.bfloat16 and jax.default_backend() == "cpu":
        return jnp.float32
    return x.dtype


def int4_matmul_upcast(x, w_q, scale):
    """Plain layout: x [B, K] @ w_q int4 [K, N], scale f32 [N].

    The int4→activation-dtype convert sits inside the dot so XLA can fuse it
    into the operand load — int4 HBM bytes, bf16 MXU math, activations never
    quantized (same contract as ``int8_matmul_upcast``)."""
    dt = _mm_dtype(x)
    w = w_q.astype(dt)
    y = jnp.dot(x.astype(dt), w, preferred_element_type=jnp.float32)
    return (y * scale[None, :]).astype(x.dtype)


def int4_matmul_grouped(x, w_q, scale):
    """Grouped layout: x [B, K], w_q int4 [K//G, G, N], scale f32 [K//G, N].

    Contract each G-row group against its own int4 block, then reduce the
    per-group partials with their scales:  y[b,n] = Σ_k s[k,n]·(x_k · W_k)[b,n].
    """
    n_groups, G, N = w_q.shape
    dt = _mm_dtype(x)
    x3 = x.reshape(x.shape[0], n_groups, G).astype(dt)
    part = jnp.einsum(
        "bkg,kgn->bkn", x3, w_q.astype(dt),
        preferred_element_type=jnp.float32)
    y = jnp.einsum("bkn,kn->bn", part, scale.astype(jnp.float32))
    return y.astype(x.dtype)


def int4_matmul_grouped_kng(x, w_q, scale):
    """Contraction-minor grouped layout: w_q int4 [K//G, N, G], scale
    [K//G, N].  Same math as ``int4_matmul_grouped``; the G-minor order
    streams measurably faster on v5e GEMV shapes (docs/PERF.md round 5)."""
    n_groups, N, G = w_q.shape
    dt = _mm_dtype(x)
    x3 = x.reshape(x.shape[0], n_groups, G).astype(dt)
    part = jnp.einsum(
        "bkg,kng->bkn", x3, w_q.astype(dt),
        preferred_element_type=jnp.float32)
    y = jnp.einsum("bkn,kn->bn", part, scale.astype(jnp.float32))
    return y.astype(x.dtype)


def int4_matmul_nibble(x, w_b, scale):
    """Nibble layout, per-column scales: x [B, K] @ bytes int8 [K//2, N].

    Byte k2 packs rows (2k2 → low nibble, 2k2+1 → high).  Splitting the dot
    by row parity needs NO interleave: unpack is two arithmetic shifts
    (sign-extending) that XLA fuses into the two dots' operand reads —
    int4 HBM bytes, bf16 MXU math.

      y = x[:, 0::2] @ sext(b << 4 >> 4)  +  x[:, 1::2] @ (b >> 4)
    """
    dt = _mm_dtype(x)
    wl = ((w_b << 4) >> 4).astype(dt)
    wh = (w_b >> 4).astype(dt)
    y = jnp.dot(x[:, 0::2].astype(dt), wl, preferred_element_type=jnp.float32)
    y = y + jnp.dot(x[:, 1::2].astype(dt), wh, preferred_element_type=jnp.float32)
    return (y * scale[None, :]).astype(x.dtype)


def int4_matmul_nibble_grouped(x, w_b, scale):
    """Nibble layout, grouped scales: bytes [K//2, N], scale [K//G, N].

    Group g covers ORIGINAL rows [gG, (g+1)G) — bytes [gG/2, (g+1)G/2) —
    so the parity-split partials stay group-aligned (G even by
    construction, ops/quant.py)."""
    n_groups, N = scale.shape
    K2 = w_b.shape[0]
    gh = K2 // n_groups  # = G // 2
    dt = _mm_dtype(x)
    wl = ((w_b << 4) >> 4).astype(dt).reshape(n_groups, gh, N)
    wh = (w_b >> 4).astype(dt).reshape(n_groups, gh, N)
    xe = x[:, 0::2].reshape(x.shape[0], n_groups, gh).astype(dt)
    xo = x[:, 1::2].reshape(x.shape[0], n_groups, gh).astype(dt)
    part = jnp.einsum("bkg,kgn->bkn", xe, wl, preferred_element_type=jnp.float32)
    part = part + jnp.einsum("bkg,kgn->bkn", xo, wh, preferred_element_type=jnp.float32)
    y = jnp.einsum("bkn,kn->bn", part, scale.astype(jnp.float32))
    return y.astype(x.dtype)


def int4_matmul_halfsplit(x, w_b, scale):
    """Halfsplit nibble layout, per-column scales: bytes [K//2, N] pairing
    row k (lo) with row k + K/2 (hi).  Both half-dots consume CONTIGUOUS
    activation slices — no strided gathers:

      y = x[:, :K/2] @ sext(b << 4 >> 4)  +  x[:, K/2:] @ (b >> 4)
    """
    dt = _mm_dtype(x)
    K2 = w_b.shape[0]
    wl = ((w_b << 4) >> 4).astype(dt)
    wh = (w_b >> 4).astype(dt)
    y = jnp.dot(x[:, :K2].astype(dt), wl, preferred_element_type=jnp.float32)
    y = y + jnp.dot(x[:, K2:].astype(dt), wh, preferred_element_type=jnp.float32)
    return (y * scale[None, :]).astype(x.dtype)


def int4_matmul_halfsplit_grouped(x, w_b, scale):
    """Halfsplit nibble layout, grouped scales: bytes [K//2, N], scale
    [K//G, N].  The lo plane covers original rows [0, K/2) — scale rows
    [0, K/(2G)) — and the hi plane rows [K/2, K): group alignment is
    guaranteed at pack time ((K/2) % G == 0, ops/quant.py)."""
    n_groups, N = scale.shape
    K2 = w_b.shape[0]
    gh = n_groups // 2
    dt = _mm_dtype(x)
    wl = ((w_b << 4) >> 4).astype(dt).reshape(gh, K2 // gh, N)
    wh = (w_b >> 4).astype(dt).reshape(gh, K2 // gh, N)
    xl = x[:, :K2].reshape(x.shape[0], gh, K2 // gh).astype(dt)
    xh = x[:, K2:].reshape(x.shape[0], gh, K2 // gh).astype(dt)
    pl_ = jnp.einsum("bkg,kgn->bkn", xl, wl, preferred_element_type=jnp.float32)
    ph = jnp.einsum("bkg,kgn->bkn", xh, wh, preferred_element_type=jnp.float32)
    part = jnp.concatenate([pl_, ph], axis=1)  # [B, n_groups, N]
    y = jnp.einsum("bkn,kn->bn", part, scale.astype(jnp.float32))
    return y.astype(x.dtype)


def int4_matmul_reference(x, w_q, scale):
    """Dequantize-then-dot (numerics reference for both layouts)."""
    if w_q.ndim == 3:
        n_groups, G, N = w_q.shape
        w = (w_q.astype(jnp.float32) * scale[:, None, :]).reshape(n_groups * G, N)
    else:
        w = w_q.astype(jnp.float32) * scale[None, :]
    return jnp.dot(
        x.astype(jnp.float32), w, preferred_element_type=jnp.float32
    ).astype(x.dtype)
