"""Pallas TPU kernel: block-sparse matmul for pruned weights.

The reference's pruning only zero-masks weights (dia/pruning_utils.py) — the
matmuls still read and multiply every zero.  On TPU, sparsity pays only at
DMA granularity: this kernel skips whole weight blocks that are entirely
zero, so HBM traffic (the decode bottleneck) scales with block density.

Offline, ``plan_block_sparsity`` compresses a pruned [K, N] weight into
per-output-tile lists of nonzero K-block indices (padded + counts).  The
kernel iterates ``(n_tile, slot)`` with the block index scalar-prefetched;
slots past the count clamp to the previous index (DMA suppressed by the
pipeline) and compute is predicated off.

Element-level unstructured pruning rarely zeroes whole blocks — pair this
with ``prune.block_masks`` (block-granular magnitude pruning), the
TPU-native pruning mode whose zeros this kernel is guaranteed to exploit
(SURVEY.md §2b: "block-sparse masked-matmul Pallas kernel for
unstructured-pruned weights").
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class BlockSparsePlan(NamedTuple):
    indices: jax.Array  # int32 [n_tiles_n, max_blocks] k-block ids (padded)
    counts: jax.Array  # int32 [n_tiles_n]
    block_k: int
    block_n: int
    density: float


def plan_block_sparsity(w: np.ndarray, block_k: int = 256, block_n: int = 256) -> BlockSparsePlan:
    """Compress the zero-block structure of a pruned [K, N] weight."""
    w = np.asarray(w)
    K, N = w.shape
    nk, nn = -(-K // block_k), -(-N // block_n)
    nonzero = np.zeros((nk, nn), bool)
    for i in range(nk):
        for j in range(nn):
            blk = w[i * block_k : (i + 1) * block_k, j * block_n : (j + 1) * block_n]
            nonzero[i, j] = bool(np.any(blk != 0))
    counts = nonzero.sum(axis=0).astype(np.int32)
    max_blocks = max(1, int(counts.max()))
    indices = np.zeros((nn, max_blocks), np.int32)
    for j in range(nn):
        ids = np.nonzero(nonzero[:, j])[0]
        indices[j, : len(ids)] = ids
        if len(ids):
            indices[j, len(ids):] = ids[-1]  # clamp padding to the last real id
    return BlockSparsePlan(
        indices=jnp.asarray(indices),
        counts=jnp.asarray(counts),
        block_k=block_k,
        block_n=block_n,
        density=float(nonzero.mean()),
    )


def _kernel(idx_ref, cnt_ref, x_ref, w_ref, o_ref, acc_scr, *, max_blocks):
    j = pl.program_id(0)
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(m < cnt_ref[j])
    def _():
        acc_scr[:] += jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(m == max_blocks - 1)
    def _():
        o_ref[:] = acc_scr[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "block_n", "interpret"))
def block_sparse_matmul(
    x: jax.Array,  # [B, K]
    w: jax.Array,  # [K, N] (pruned dense storage)
    indices: jax.Array,  # [n_tiles_n, max_blocks]
    counts: jax.Array,  # [n_tiles_n]
    block_k: int = 256,
    block_n: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """x @ w reading only nonzero weight blocks. Returns [B, N] in x.dtype."""
    B, K = x.shape
    N = w.shape[1]
    nn, max_blocks = indices.shape

    def x_index(j, m, idx_ref, cnt_ref):
        slot = jnp.minimum(m, jnp.maximum(cnt_ref[j] - 1, 0))
        return (0, idx_ref[j, slot])

    def w_index(j, m, idx_ref, cnt_ref):
        slot = jnp.minimum(m, jnp.maximum(cnt_ref[j] - 1, 0))
        return (idx_ref[j, slot], j)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nn, max_blocks),
        in_specs=[
            pl.BlockSpec((B, block_k), x_index),
            pl.BlockSpec((block_k, block_n), w_index),
        ],
        out_specs=pl.BlockSpec((B, block_n), lambda j, m, i, c: (0, j)),
        scratch_shapes=[pltpu.VMEM((B, block_n), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_kernel, max_blocks=max_blocks),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        interpret=interpret,
    )(indices, counts, x, w)


def block_sparse_matmul_reference(x, w):
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
