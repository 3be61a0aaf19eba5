"""Pallas TPU kernel: int4-weight (nibble, halfsplit) matmul for the decode path.

The XLA int4 story (int4_matmul.py) loses to int8 because XLA will not fuse
the nibble unpack into a dot's HBM operand read: it materializes the
unpacked bf16 weights, paying write+read traffic that eats the 4-bit byte
savings (measured: nibble 1.44 ms vs int8 0.87 ms on the 18-layer MLP GEMV
chain — docs/PERF.md).  This kernel does the unpack IN REGISTERS: the byte
block streams HBM→VMEM once at int4 density, two arithmetic shifts produce
the (lo, hi) planes on-chip, and each plane contracts against its
contiguous activation half.  Weight HBM bytes truly halve vs int8.

Layout contract (ops/quant.py, ``halfsplit=True``): byte[k, n] packs
original row k in the low nibble and row k + K/2 in the high nibble, so

    y = x[:, :K/2] @ sext(b << 4 >> 4)  +  x[:, K/2:] @ (b >> 4)

with no strided slices or sublane shuffles anywhere (the same pairing trick
as the fused whole-step kernel's ``_q4_nibble`` — ops/kernels/fused_step.py
— whose Mosaic lowering was verified in round 3; this kernel is the small,
compilable extraction of that idea).  Grouped scales apply per
(128-row-group, column) partial dot, numerically matching
``int4_matmul_halfsplit_grouped``.

The reference has no 4-bit path at all (its int8 quantization is a no-op on
the transformer, quirk Q7 — /root/reference/app.py:51-63); with QAT
(``finetune --qat int4``) making the format quality-free, this kernel is
what makes it FAST.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(K2: int, group: int | None, cdt, shift_width: int = 32):
    """Kernel body for one [B, tile_n] output block: full-K reduction.

    Unpack shifts run in a wide integer type (Mosaic rejects ``arith.shli``
    on int8; ``shift_width`` selects i32 or i16 — i16 halves the register
    traffic of the unpack), dequantization multiplies the converted planes
    by their grouped scales in registers, and each plane contracts in ONE
    MXU dot — the first kernel revision did one dot per (group, plane) and
    measured compute-bound at 30×+ the DMA time (16–64 serialized
    [B,128]×[128,TN] micro-dots per grid step).
    """
    if shift_width not in (16, 32):
        raise ValueError(f"shift_width must be 16 or 32, got {shift_width}")
    wdt = jnp.int32 if shift_width == 32 else jnp.int16
    sext = shift_width - 4

    def kernel(x_ref, w_ref, s_ref, o_ref):
        x = x_ref[:]                       # [B, K] compute dtype
        w32 = w_ref[:].astype(wdt)         # Mosaic legalizes shifts on i16/i32
        lo8 = (w32 << sext) >> sext        # only (arith.shli on i8 is rejected)
        hi8 = w32 >> 4
        xl = x[:, :K2]
        xh = x[:, K2:]
        TN = w32.shape[1]
        if group is None:
            lo = lo8.astype(cdt)
            hi = hi8.astype(cdt)
            acc = jax.lax.dot_general(
                xl, lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = acc + jax.lax.dot_general(
                xh, hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[:] = (acc * s_ref[0][None, :]).astype(o_ref.dtype)
            return
        gh = K2 // group  # groups per plane; scale rows: lo [0,gh), hi [gh,2gh)
        sl = s_ref[:gh].astype(cdt).reshape(gh, 1, TN)
        sh = s_ref[gh:].astype(cdt).reshape(gh, 1, TN)
        lo = (lo8.astype(cdt).reshape(gh, group, TN) * sl).reshape(K2, TN)
        hi = (hi8.astype(cdt).reshape(gh, group, TN) * sh).reshape(K2, TN)
        acc = jax.lax.dot_general(
            xl, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(
            xh, hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        o_ref[:] = acc.astype(o_ref.dtype)

    return kernel


def halfsplit_supported(B: int, K: int, N: int, group: int | None) -> bool:
    """Shape gate for the kernel: contiguous halves must sit on lane-tile
    boundaries and groups must align to the halves."""
    if K % 256:                      # K/2 must be a multiple of 128 lanes
        return False
    if group is not None and (K // 2) % group:
        return False
    if N % 128:
        return False
    return B <= 64


@functools.partial(
    jax.jit, static_argnames=("tile_n", "interpret", "shift_width", "tile_cap"))
def int4_gemv_halfsplit(
    x: jax.Array,       # [B, K] activations (bf16/f32)
    w_b: jax.Array,     # [K//2, N] int8 bytes, halfsplit nibble layout
    scale: jax.Array,   # [K//G, N] f32 grouped | [N] per-column
    tile_n: int = 512,
    interpret: bool = False,
    shift_width: int = 32,
    tile_cap: int = 2 * 1024 * 1024,
) -> jax.Array:
    """Returns x @ dequant(w_b, scale) in x.dtype, shape [B, N]."""
    B, K = x.shape
    K2, N = w_b.shape
    assert K2 * 2 == K, (K, w_b.shape)
    grouped = scale.ndim == 2
    group = K // scale.shape[0] if grouped else None
    # keep the streamed byte block ≤ tile_cap (double-buffered in VMEM)
    while K2 * tile_n > tile_cap and tile_n > 128:
        tile_n //= 2
    tile_n = min(tile_n, N)
    grid = (pl.cdiv(N, tile_n),)
    s_rows = scale.shape[0] if grouped else 1
    s2 = (scale if grouped else scale.reshape(1, N)).astype(jnp.float32)

    cdt = jnp.float32 if (
        interpret or jax.default_backend() == "cpu") and x.dtype == jnp.bfloat16 \
        else x.dtype
    return pl.pallas_call(
        _make_kernel(K2, group, cdt, shift_width),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_rows, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        interpret=interpret,
    )(x.astype(cdt), w_b, s2)
