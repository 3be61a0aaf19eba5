"""Magnitude pruning as functional mask pytrees.

TPU-native replacement for torch's hook-based pruning machinery
(reference: dia/pruning_utils.py):

* **Unstructured**: global L1 threshold over every dense kernel (the
  DenseGeneral population the reference targets, dia/pruning_utils.py:11,
  42-62) → boolean mask pytree.
* **Structured**: per-module (per-layer) Ln-norm ranking of slices along a
  chosen dimension (torch ``prune.ln_structured`` semantics,
  dia/pruning_utils.py:64-119); modules whose weights lack the dim are
  skipped, as in the reference.
* **Permanent apply** = ``weight * mask`` (reference ``make_pruning_permanent``,
  dia/pruning_utils.py:122-151) — no reparameterization hooks to remove.
* **Sparsity report** over the prunable population
  (dia/pruning_utils.py:153-179).
* **Physical shrinking** for structured FFN pruning: gate/up rows of
  ``wi_fused`` and matching ``wo`` columns are removed *for real*, producing a
  smaller config that recompiles to genuinely faster matmuls — beyond the
  reference, which only zero-masks (SURVEY.md §7 hard part 5).

Masks are ordinary pytrees; apply them at load time and the pruned model runs
through the identical jitted code path (XLA sees dense tensors with zeros; the
block-sparse Pallas matmul in ops/kernels exploits high sparsity).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from .config import DiaConfig

Params = dict[str, Any]

# Dense kernels are the prunable population (reference: DenseGeneral modules).
# Embeddings and norm scales are excluded, matching the reference's module-type
# filter (dia/pruning_utils.py:11).
_PRUNABLE_LEAF = "kernel"


def prunable_items(params: Params) -> list[tuple[tuple[str, ...], jax.Array]]:
    """All (path, kernel) pairs in the prunable population."""
    out = []

    def walk(tree, path):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
            elif k == _PRUNABLE_LEAF:
                out.append((path + (k,), v))

    walk(params, ())
    return out


def _mask_tree_like(params: Params, fn: Callable[[tuple[str, ...], jax.Array], jax.Array | None]) -> Params:
    def walk(tree, path):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v, path + (k,))
            elif k == _PRUNABLE_LEAF:
                out[k] = fn(path + (k,), v)
            else:
                out[k] = None
        return out

    return walk(params, ())


def unstructured_masks(params: Params, amount: float) -> Params:
    """Global L1 magnitude masks: zero the ``amount`` fraction of smallest-|w|
    entries across ALL prunable kernels jointly (torch
    ``prune.global_unstructured`` + ``L1Unstructured`` semantics,
    dia/pruning_utils.py:42-62)."""
    if not 0.0 <= amount < 1.0:
        raise ValueError(f"amount must be in [0, 1): {amount}")
    items = prunable_items(params)
    if amount == 0.0:
        return _mask_tree_like(params, lambda p, w: jnp.ones_like(w, dtype=jnp.bool_))
    mags = np.concatenate([np.abs(np.asarray(w, dtype=np.float32)).ravel() for _, w in items])
    k = int(round(amount * mags.size))
    if k <= 0:
        threshold = -np.inf
    else:
        # torch zeroes exactly k smallest; threshold at the k-th smallest value
        threshold = np.partition(mags, k - 1)[k - 1]

    def fn(path, w):
        return jnp.abs(w.astype(jnp.float32)) > threshold

    return _mask_tree_like(params, fn)


def structured_masks(
    params: Params, amount: float, dim: int, n: int = 2, stacked_layer_axis: bool = True
) -> Params:
    """Per-module Ln structured masks along ``dim`` of the *per-layer* weight
    (torch ``prune.ln_structured`` semantics, dia/pruning_utils.py:64-119).

    Our kernels are stacked with a leading layer axis; ``dim`` refers to the
    reference per-module layout, so ranking is done independently per layer
    slice.  Kernels whose per-module rank <= dim are skipped (reference
    behavior at dia/pruning_utils.py:91-94).
    """

    def per_module_mask(w):  # w: per-layer kernel
        if dim >= w.ndim:
            return None
        axes = tuple(a for a in range(w.ndim) if a != dim)
        norms = jnp.sum(jnp.abs(w.astype(jnp.float32)) ** n, axis=axes) ** (1.0 / n)
        size = norms.shape[0]
        k = int(round(amount * size))  # torch: number of structures to remove
        if k <= 0:
            return jnp.ones_like(w, dtype=jnp.bool_)
        # keep the (size - k) largest-norm slices
        order = jnp.argsort(norms)
        keep = jnp.ones((size,), jnp.bool_).at[order[:k]].set(False)
        shape = [1] * w.ndim
        shape[dim] = size
        return jnp.broadcast_to(keep.reshape(shape), w.shape)

    def fn(path, w):
        if stacked_layer_axis and ("layers" in path):
            m = jax.vmap(per_module_mask)(w) if per_module_mask(w[0]) is not None else None
            return m if m is not None else jnp.ones_like(w, dtype=jnp.bool_)
        m = per_module_mask(w)
        return m if m is not None else jnp.ones_like(w, dtype=jnp.bool_)

    return _mask_tree_like(params, fn)


def apply_masks(params: Params, masks: Params) -> Params:
    """Permanent pruning: weight * mask (reference make_pruning_permanent)."""

    def combine(w, m):
        if m is None or not hasattr(m, "dtype"):
            return w
        return w * m.astype(w.dtype)

    return jax.tree.map(combine, params, masks, is_leaf=lambda x: x is None)


def sparsity_report(params: Params) -> dict[str, float | int]:
    """Zero-count sparsity over the prunable population
    (reference: dia/pruning_utils.py:153-179)."""
    total = 0
    zeros = 0
    per_module = {}
    for path, w in prunable_items(params):
        wz = int(np.sum(np.asarray(w) == 0))
        total += int(w.size)
        zeros += wz
        per_module[".".join(path[:-1])] = wz / w.size
    return {
        "total_params": total,
        "zero_params": zeros,
        "sparsity": zeros / total if total else 0.0,
        "per_module": per_module,
    }


def block_masks(
    params: Params, amount: float, block: tuple[int, int] = (256, 256),
    scope: str = "global",
) -> Params:
    """Block-granular magnitude masks — the TPU-native pruning mode.

    Ranks (block_k, block_n) weight blocks by L1 norm over the flattened
    per-module [K, N] view and zeroes the ``amount`` fraction with the
    smallest norms (globally across modules by default, per torch's
    global_unstructured spirit).  The resulting zeros align with the
    block-sparse matmul kernel's DMA granularity, so pruned inference reads
    proportionally fewer weight bytes (ops/kernels/sparse_matmul.py) —
    unlike element-level masks, which leave HBM traffic unchanged.

    Stacked layer kernels are ranked per layer slice (each [in..., out...]
    module flattened to 2D).
    """
    if not 0.0 <= amount < 1.0:
        raise ValueError(f"amount must be in [0, 1): {amount}")
    bk, bn = block

    def module_block_norms(w2):  # [K, N] → block norm grid + shapes
        K, N = w2.shape
        nk, nn = -(-K // bk), -(-N // bn)
        padded = jnp.zeros((nk * bk, nn * bn), jnp.float32).at[:K, :N].set(
            jnp.abs(w2.astype(jnp.float32))
        )
        blocks = padded.reshape(nk, bk, nn, bn)
        return jnp.sum(blocks, axis=(1, 3))  # [nk, nn] L1 norms

    items = prunable_items(params)
    norms = []
    metas = []
    for path, w in items:
        stacked = "layers" in path
        ws = w if stacked else w[None]
        L = ws.shape[0]
        # flatten per module to 2D [K, N]: K = first in-dim, N = rest
        w2 = ws.reshape(L, ws.shape[1], -1)
        g = jax.vmap(module_block_norms)(w2)  # [L, nk, nn]
        norms.append(np.asarray(g).ravel())
        metas.append((path, w2.shape, g.shape))

    if scope == "global":
        all_norms = np.concatenate(norms)
        k = int(round(amount * all_norms.size))
        threshold = -np.inf if k <= 0 else np.partition(all_norms, k - 1)[k - 1]
    else:
        threshold = None  # per-module below

    masks_by_path = {}
    for (path, w2_shape, g_shape), n in zip(metas, norms):
        if threshold is None:
            k = int(round(amount * n.size))
            thr = -np.inf if k <= 0 else np.partition(n, k - 1)[k - 1]
        else:
            thr = threshold
        keep = (n > thr).reshape(g_shape)  # [L, nk, nn]
        masks_by_path[path] = (keep, w2_shape)

    def fn(path, w):
        keep, (L, K, N) = masks_by_path[path]
        m = np.repeat(np.repeat(np.asarray(keep), bk, axis=1), bn, axis=2)[:, :K, :N]
        if "layers" in path:
            return jnp.asarray(m.reshape(w.shape))
        return jnp.asarray(m[0].reshape(w.shape))

    return _mask_tree_like(params, fn)


# ---------------------------------------------------------------------------
# Physical structured shrinking (beyond the reference's zero-masking)
# ---------------------------------------------------------------------------


def shrink_heads(params: Params, config: DiaConfig, keep_fraction: float) -> tuple[Params, DiaConfig]:
    """Physically remove the lowest-importance attention heads.

    Head removal must stay shape-consistent across q/k/v/o (SURVEY.md §7 hard
    part 5) and respect GQA structure: in the decoder's self-attention a KV
    head and its whole query group are removed together (so the group size is
    preserved); encoder and cross attention are MHA and prune per head.  Head
    importance = L2 norm of the head's q/k/v/o kernel slices, per layer
    stack summed (uniform head count across layers keeps the scanned layout).
    Kept counts are floored at 1 KV head / 1 head.

    Returns (new_params, new_config) — recompiles to genuinely smaller
    attention matmuls, beyond the reference's zero-masking.
    """
    if not 0.0 < keep_fraction <= 1.0:
        raise ValueError(f"keep_fraction must be in (0, 1]: {keep_fraction}")

    def head_importance(attn: Params, group: int) -> jax.Array:
        # kernels: q [L, D, Nq, H], k/v [L, Dk, Nkv, H], o [L, Nq, H, D]
        q = attn["q_proj"]["kernel"].astype(jnp.float32)
        k = attn["k_proj"]["kernel"].astype(jnp.float32)
        v = attn["v_proj"]["kernel"].astype(jnp.float32)
        o = attn["o_proj"]["kernel"].astype(jnp.float32)
        L, _, Nq, H = q.shape
        Nkv = k.shape[2]
        qg = jnp.sum(q**2, axis=(0, 1, 3)).reshape(Nkv, group).sum(axis=1)
        og = jnp.sum(o**2, axis=(0, 2, 3)).reshape(Nkv, group).sum(axis=1)
        kg = jnp.sum(k**2, axis=(0, 1, 3))
        vg = jnp.sum(v**2, axis=(0, 1, 3))
        return qg + og + kg + vg  # [Nkv]

    def shrink_attn(attn: Params, group: int, keep_kv: int) -> Params:
        imp = head_importance(attn, group)
        order = jnp.sort(jnp.argsort(-imp)[:keep_kv])  # kept kv-head ids, ascending
        q_ids = (order[:, None] * group + jnp.arange(group)[None, :]).reshape(-1)
        return {
            "q_proj": {"kernel": jnp.take(attn["q_proj"]["kernel"], q_ids, axis=2)},
            "k_proj": {"kernel": jnp.take(attn["k_proj"]["kernel"], order, axis=2)},
            "v_proj": {"kernel": jnp.take(attn["v_proj"]["kernel"], order, axis=2)},
            "o_proj": {"kernel": jnp.take(attn["o_proj"]["kernel"], q_ids, axis=1)},
        }

    m = config.model
    enc, dec = m.encoder, m.decoder

    enc_keep = max(1, int(round(keep_fraction * enc.n_head)))
    dec_group = dec.gqa_query_heads // dec.kv_heads
    dec_kv_keep = max(1, int(round(keep_fraction * dec.kv_heads)))
    cross_keep = max(1, int(round(keep_fraction * dec.cross_query_heads)))

    new_params = {k: dict(v) for k, v in params.items()}
    enc_layers = dict(params["encoder"]["layers"])
    enc_layers["self_attention"] = shrink_attn(enc_layers["self_attention"], 1, enc_keep)
    dec_layers = dict(params["decoder"]["layers"])
    dec_layers["self_attention"] = shrink_attn(dec_layers["self_attention"], dec_group, dec_kv_keep)
    dec_layers["cross_attention"] = shrink_attn(dec_layers["cross_attention"], 1, cross_keep)
    new_params["encoder"] = dict(params["encoder"], layers=enc_layers)
    new_params["decoder"] = dict(params["decoder"], layers=dec_layers)

    new_config = config.model_copy(update={
        "model": m.model_copy(update={
            "encoder": enc.model_copy(update={"n_head": enc_keep}),
            "decoder": dec.model_copy(update={
                "gqa_query_heads": dec_kv_keep * dec_group,
                "kv_heads": dec_kv_keep,
                "cross_query_heads": cross_keep,
            }),
        })
    })
    return new_params, new_config


def shrink_ffn(params: Params, config: DiaConfig, keep_fraction: float) -> tuple[Params, DiaConfig]:
    """Physically remove the lowest-importance FFN hidden channels.

    Channel importance = L2 norm over the channel's gate row, up row
    (``wi_fused`` [L, D, 2, F]) and ``wo`` input row ([L, F, D]), computed
    per layer; the kept channel count is rounded to a multiple of 128 so the
    shrunken matmuls stay MXU-tile-aligned.  Returns (new_params, new_config)
    — the recompiled model does proportionally less real work, unlike the
    reference's masked weights (dia/pruning_utils.py:64-119 only zero-fill).

    All layers keep the same channel *count* (uniform shapes keep the stacked
    scan layout) but each layer keeps its own best channels.
    """
    if not 0.0 < keep_fraction <= 1.0:
        raise ValueError(f"keep_fraction must be in (0, 1]: {keep_fraction}")

    def shrink_stack(layers: Params, n_hidden: int) -> tuple[Params, int]:
        wi = layers["mlp"]["wi_fused"]["kernel"]  # [L, D, 2, F]
        wo = layers["mlp"]["wo"]["kernel"]  # [L, F, D]
        F_dim = wi.shape[-1]
        keep = max(128, int(round(keep_fraction * F_dim / 128)) * 128)
        keep = min(keep, F_dim)
        importance = (
            jnp.sum(wi.astype(jnp.float32) ** 2, axis=(1, 2))
            + jnp.sum(wo.astype(jnp.float32) ** 2, axis=2)
        )  # [L, F]
        order = jnp.argsort(-importance, axis=1)[:, :keep]  # [L, keep]
        order = jnp.sort(order, axis=1)

        wi_s = jnp.take_along_axis(wi, order[:, None, None, :], axis=3)
        wo_s = jnp.take_along_axis(wo, order[:, :, None], axis=1)
        new_layers = dict(layers)
        new_layers["mlp"] = {
            "wi_fused": {"kernel": wi_s},
            "wo": {"kernel": wo_s},
        }
        return new_layers, keep

    new_params = {k: dict(v) for k, v in params.items()}
    enc_layers, enc_hidden = shrink_stack(params["encoder"]["layers"], config.model.encoder.n_hidden)
    dec_layers, dec_hidden = shrink_stack(params["decoder"]["layers"], config.model.decoder.n_hidden)
    new_params["encoder"] = dict(params["encoder"], layers=enc_layers)
    new_params["decoder"] = dict(params["decoder"], layers=dec_layers)

    new_config = config.model_copy(
        update={
            "model": config.model.model_copy(
                update={
                    "encoder": config.model.encoder.model_copy(update={"n_hidden": enc_hidden}),
                    "decoder": config.model.decoder.model_copy(update={"n_hidden": dec_hidden}),
                }
            )
        }
    )
    return new_params, new_config
