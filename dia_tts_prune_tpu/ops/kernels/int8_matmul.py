"""Pallas TPU kernel: int8-weight matmul for the bandwidth-bound decode path.

Per-token decoding at batch≈2 is a GEMV: arithmetic is negligible and speed
equals weight bytes / HBM bandwidth.  Storing dense kernels as symmetric
per-output-channel int8 halves the bytes versus bf16 — but only if the
*matmul consumes int8 directly*; a dequantize-then-dot graph materializes the
bf16 weight in HBM and loses the win.  This kernel streams int8 weight tiles
into VMEM, converts on-chip, contracts on the MXU, and applies the scales to
the fp32 accumulator.

Used by ``ops.modules.dense_general`` when a kernel leaf is a
``QuantizedKernel`` (see ops/quant.py); the reference's int8 story was a
no-op (quirk Q7) — this is the real thing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[:]  # [B, K] compute dtype
    w = w_ref[:].astype(x.dtype)  # [K, TN] int8 → compute dtype on-chip
    acc = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, TN] fp32
    o_ref[:] = (acc * s_ref[0][None, :]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def int8_matmul(
    x: jax.Array,  # [B, K] activations
    w_q: jax.Array,  # [K, N] int8 weights
    scale: jax.Array,  # [N] f32 per-output-channel scales
    tile_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Returns x @ (w_q * scale) in x.dtype, shape [B, N]."""
    B, K = x.shape
    N = w_q.shape[1]
    # keep the streamed weight block ≤ ~2 MB (double-buffered in VMEM)
    while K * tile_n > 4 * 1024 * 1024 and tile_n > 128:
        tile_n //= 2
    tile_n = min(tile_n, N)
    grid = (pl.cdiv(N, tile_n),)

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        interpret=interpret,
    )(x, w_q, scale.reshape(1, N).astype(jnp.float32))


def int8_matmul_xla(x: jax.Array, w_q: jax.Array, scale: jax.Array) -> jax.Array:
    """XLA-native dynamic int8: quantize activations per row, contract
    s8×s8 on the MXU (int8 throughput, int8 weight bytes from HBM), rescale.

    This is true dynamic quantization — the semantics the reference *claims*
    for its CPU int8 path (app.py:51-63, a no-op there, quirk Q7).
    """
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.maximum(absmax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * sx * scale[None, :]).astype(x.dtype)


def int8_matmul_upcast(x: jax.Array, w_q: jax.Array, scale: jax.Array) -> jax.Array:
    """Weight-only int8: upcast the int8 kernel to the activation dtype
    INSIDE the dot — XLA fuses the convert into the contraction's operand
    load, so HBM streams int8 bytes while the MXU runs bf16 math.

    Measured on v5e (tools/microbench_decode.py, 18-layer GEMV chain):
    0.835 ms/step vs 1.629 bf16 (723 GB/s effective at int8 bytes) — the
    convert is free, the bandwidth halving is real.  Beats the s8×s8
    dynamic path (0.895 ms/step) AND avoids activation-quantization error:
    activations stay bf16 end-to-end, only weights are quantized.
    """
    w = w_q.astype(x.dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return (y * scale[None, :]).astype(x.dtype)


def int8_matmul_reference(x, w_q, scale):
    """Dequantize-then-dot (numerics reference)."""
    w = w_q.astype(jnp.float32) * scale[None, :]
    return jnp.dot(
        x.astype(jnp.float32), w, preferred_element_type=jnp.float32
    ).astype(x.dtype)
