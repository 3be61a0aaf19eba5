"""Block-sparse dense kernels for pruned inference.

The reference's pruning zero-masks weights and keeps multiplying the zeros
(/root/reference/dia/pruning_utils.py:42-119) — on a bandwidth-bound decode
path that saves nothing.  Here block-pruned kernels are stored as
``BlockSparseKernel`` pytree leaves: flattened ``[K, N]`` values plus the
compressed nonzero-block structure (per-output-tile K-block index lists).
``ops.modules.dense_general`` dispatches them to the block-sparse Pallas
matmul (ops/kernels/sparse_matmul.py), which DMA-skips all-zero weight
blocks — HBM traffic, the decode bottleneck, scales with block density.

Mirror of the ``QuantizedKernel`` dispatch pattern (ops/quant.py): values are
pre-flattened 2-D (``[L, K, N]`` stacked per layer) so the kernel reads HBM
directly; logical dims are static metadata.  Build with
``sparsify_params_block`` after ``prune.block_masks`` + ``prune.apply_masks``
(block-granular pruning guarantees whole-block zeros; element-level masks
rarely produce any).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


@jax.tree_util.register_pytree_node_class
class BlockSparseKernel:
    """Block-pruned dense kernel: 2-D values + compressed block structure.

    values: ``[K, N]`` (``[L, K, N]`` stacked) in the compute dtype; pruned
    blocks are stored as zeros (dense fallback stays exact).
    indices: int32 ``[nn, max_blocks]`` (``[L, nn, max_blocks]``) nonzero
    K-block ids per N-tile, padded by clamping to the last real id.
    counts: int32 ``[nn]`` (``[L, nn]``) nonzero-block counts per N-tile.
    block_k/block_n/in_shape/out_shape: static aux data (jit cache keys).
    """

    __slots__ = ("values", "indices", "counts", "block_k", "block_n",
                 "in_shape", "out_shape")

    def __init__(self, values, indices, counts, block_k, block_n, in_shape, out_shape):
        self.values = values
        self.indices = indices
        self.counts = counts
        self.block_k = int(block_k)
        self.block_n = int(block_n)
        self.in_shape = tuple(in_shape)
        self.out_shape = tuple(out_shape)

    def tree_flatten(self):
        return (self.values, self.indices, self.counts), (
            self.block_k, self.block_n, self.in_shape, self.out_shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], *aux)

    def __repr__(self):
        return (f"BlockSparseKernel(values={getattr(self.values, 'shape', None)}, "
                f"block=({self.block_k},{self.block_n}), in_shape={self.in_shape}, "
                f"out_shape={self.out_shape})")

    @property
    def density(self) -> float:
        """Fraction of weight blocks the kernel actually reads."""
        counts = np.asarray(self.counts, np.float64)
        nk = -(-math.prod(self.in_shape) // self.block_k)
        return float(counts.sum() / (counts.size * nk))


def _plan_one(w2: np.ndarray, block_k: int, block_n: int):
    """Zero-block structure of one [K, N] module (vectorized reduction)."""
    K, N = w2.shape
    nk, nn = -(-K // block_k), -(-N // block_n)
    padded = np.zeros((nk * block_k, nn * block_n), bool)
    padded[:K, :N] = w2 != 0
    nonzero = padded.reshape(nk, block_k, nn, block_n).any(axis=(1, 3))  # [nk, nn]
    counts = nonzero.sum(axis=0).astype(np.int32)  # [nn]
    return nonzero, counts


def _pack_indices(nonzero: np.ndarray, counts: np.ndarray, max_blocks: int) -> np.ndarray:
    """[nk, nn] block map → [nn, max_blocks] padded index lists (clamp-padded
    so suppressed slots re-address an already-fetched block)."""
    nk, nn = nonzero.shape
    indices = np.zeros((nn, max_blocks), np.int32)
    for j in range(nn):
        ids = np.nonzero(nonzero[:, j])[0]
        indices[j, : len(ids)] = ids
        if len(ids):
            indices[j, len(ids):] = ids[-1]
    return indices


def sparse_kernel_from_weight(
    w, n_in: int, stacked: bool, block_k: int = 256, block_n: int = 256,
) -> BlockSparseKernel:
    """Pack one (possibly layer-stacked) pruned kernel.

    Stacked kernels get per-layer plans padded to a shared ``max_blocks`` so
    the scan-over-layers decode step slices them uniformly.
    """
    lead = w.shape[:1] if stacked else ()
    in_shape = w.shape[len(lead): len(lead) + n_in]
    out_shape = w.shape[len(lead) + n_in:]
    K, N = math.prod(in_shape), math.prod(out_shape)
    w_np = np.asarray(w)
    w2 = w_np.reshape(*(lead or (1,)), K, N)
    plans = [_plan_one(w2[i], block_k, block_n) for i in range(w2.shape[0])]
    max_blocks = max(1, max(int(c.max(initial=0)) for _, c in plans))
    indices = np.stack([_pack_indices(nz, c, max_blocks) for nz, c in plans])
    counts = np.stack([c for _, c in plans])
    values = jnp.asarray(w_np.reshape(*lead, K, N) if lead else w_np.reshape(K, N))
    return BlockSparseKernel(
        values=values,
        indices=jnp.asarray(indices if lead else indices[0]),
        counts=jnp.asarray(counts if lead else counts[0]),
        block_k=block_k, block_n=block_n,
        in_shape=in_shape, out_shape=out_shape,
    )


def sparsify_params_block(
    params: Params, scope: str | None = "decoder",
    block_k: int = 256, block_n: int = 256,
) -> Params:
    """Swap (already block-pruned) dense kernels for BlockSparseKernels.

    ``scope`` defaults to the decoder — the decode loop re-reads its weights
    every token, so that's where skipped blocks buy bandwidth; the encoder
    runs once per call.  Usage::

        masks = prune.block_masks(params, amount=0.5, block=(256, 256))
        pruned = prune.apply_masks(params, masks)
        sparse = sparsify_params_block(pruned)

    Matches the reference's pruned-checkpoint inference
    (/root/reference/offline_prune.py:82-162 → dia/model.py:139-187), with
    the matmuls actually skipping the pruned weights.
    """
    from .quant import _map_kernels, _quant_args_for

    def pack(w, path):
        a = _quant_args_for(path)
        return sparse_kernel_from_weight(
            w, n_in=a["n_in"], stacked=a["stacked"], block_k=block_k, block_n=block_n)

    if scope is not None and scope in params:
        out = dict(params)
        out[scope] = _map_kernels(params[scope], lambda w, p: pack(w, (scope,) + p))
        return out
    return _map_kernels(params, pack)


def sparsity_summary(params: Params) -> dict[str, float]:
    """Per-module block density of the BlockSparseKernels in a tree."""
    out = {}

    def walk(tree, path):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
            elif isinstance(v, BlockSparseKernel):
                out[".".join(path + (k,))] = v.density

    walk(params, ())
    return out
