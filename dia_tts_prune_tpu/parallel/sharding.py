"""Mesh construction and sharding rules — the multi-chip layer.

The reference is strictly single-device (SURVEY.md §2c: no torch.distributed,
no process groups); scale-out here is designed TPU-first:

* a ``jax.sharding.Mesh`` over ICI with axes ``("data", "model")``;
* tensor parallelism (model axis) over attention heads and FFN hidden dims —
  on a v5e-4, the decoder's 4 KV heads shard exactly 1 per chip, so
  decode-step attention reads only local KV cache;
* data parallelism (data axis) over the batch for training (and the CFG pair
  / multi-stream serving batches at inference);
* all collectives (o_proj/wo partial-sum reductions, gradient all-reduces)
  are emitted by XLA's SPMD partitioner from these shardings — there is no
  hand-written communication backend to maintain.

Everything here is declarative: ``param_specs`` mirrors the parameter pytree
with ``PartitionSpec`` leaves; ``shard_params`` commits arrays to the mesh.
Functions jitted with these inputs are automatically partitioned.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DiaConfig

Params = dict[str, Any]

AXIS_DATA = "data"
AXIS_MODEL = "model"
AXIS_REPLICA = "replica"  # DCN (cross-host/slice) pure data parallelism


def make_mesh(data: int | None = None, model: int | None = None, devices=None,
              replica: int | None = None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults: use every device on the model axis (TP-first — the Dia workload
    is latency-bound single-stream generation, where TP cuts per-token HBM
    traffic by the model-axis size).

    ``replica`` adds a leading DCN axis for multi-host/multi-slice scale-out
    (see ``make_hybrid_mesh``); omitted, the mesh is the 2-axis ICI layout.
    """
    if replica is not None:
        return make_hybrid_mesh(replica=replica, data=data, model=model,
                                devices=devices)
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if model is None and data is None:
        data, model = 1, n
    elif model is None:
        model = n // data
    elif data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    return Mesh(devices.reshape(data, model), (AXIS_DATA, AXIS_MODEL))


def make_hybrid_mesh(replica: int, data: int | None = None,
                     model: int | None = None, devices=None) -> Mesh:
    """(replica, data, model) mesh for multi-host / multi-slice training.

    The reference is strictly single-device (SURVEY.md §2c); TPU pods scale
    past one host over DCN, which is an order of magnitude slower than ICI —
    so the plan keeps *all* model communication (TP psums, FSDP gathers) on
    the intra-slice ICI axes and puts only pure data parallelism on the
    ``replica`` axis: params/optimizer state are replicated across it and the
    single per-step gradient all-reduce is the only DCN traffic.

    Under real multi-process JAX the device grid comes from
    ``mesh_utils.create_hybrid_device_mesh`` so the replica axis lands
    exactly on slice (DCN) boundaries; single-process (tests, the virtual
    CPU mesh) falls back to a plain reshape, which is numerically identical.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    per_replica = n // replica
    if model is None and data is None:
        data, model = 1, per_replica
    elif model is None:
        model = per_replica // data
    elif data is None:
        data = per_replica // model
    if replica * data * model != n:
        raise ValueError(f"mesh {replica}x{data}x{model} != {n} devices")
    axes = (AXIS_REPLICA, AXIS_DATA, AXIS_MODEL)
    if jax.process_count() > 1 and devices.ndim == 1:
        from jax.experimental import mesh_utils

        # the replica axis must land exactly on slice (DCN) boundaries:
        # replica == number of slices and data*model == devices per slice.
        # Validate here — create_hybrid_device_mesh's own failure mode for a
        # mismatched topology is an opaque reshape error.
        num_slices = len({getattr(d, "slice_index", 0) for d in devices.tolist()})
        per_slice = n // max(num_slices, 1)
        if replica != num_slices or data * model != per_slice:
            raise ValueError(
                f"hybrid mesh {replica}x{data}x{model} does not match the "
                f"topology: {num_slices} slice(s) x {per_slice} device(s); "
                f"replica must equal the slice count and data*model the "
                f"per-slice device count"
            )
        grid = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, data, model), dcn_mesh_shape=(replica, 1, 1),
            devices=devices.tolist())
        return Mesh(grid, axes)
    return Mesh(devices.reshape(replica, data, model), axes)


def _attn_specs(shard_heads: bool) -> Params:
    h = AXIS_MODEL if shard_heads else None
    return {
        "q_proj": {"kernel": P(None, None, h, None)},  # [L, D, N, H]
        "k_proj": {"kernel": P(None, None, h, None)},
        "v_proj": {"kernel": P(None, None, h, None)},
        "o_proj": {"kernel": P(None, h, None, None)},  # [L, N, H, D] → psum on D
    }


def param_specs(config: DiaConfig) -> Params:
    """PartitionSpec pytree matching ``models.dia.init_params`` exactly.

    TP plan (SURVEY.md §2c): attention kernels shard on the head axis, FFN on
    the hidden axis; embeddings, norms and the (small) logits head replicate.
    """
    mlp = {
        "wi_fused": {"kernel": P(None, None, None, AXIS_MODEL)},  # [L, D, 2, F]
        "wo": {"kernel": P(None, AXIS_MODEL, None)},  # [L, F, D] → psum on D
    }
    return {
        "encoder": {
            "embedding": {"embedding": P(None, None)},
            "layers": {
                "pre_sa_norm": {"scale": P(None, None)},
                "self_attention": _attn_specs(True),
                "post_sa_norm": {"scale": P(None, None)},
                "mlp": dict(mlp),
            },
            "norm": {"scale": P(None)},
        },
        "decoder": {
            "embeddings": {"embedding": P(None, None, None)},
            "layers": {
                "pre_sa_norm": {"scale": P(None, None)},
                "self_attention": _attn_specs(True),
                "pre_ca_norm": {"scale": P(None, None)},
                "cross_attention": _attn_specs(True),
                "pre_mlp_norm": {"scale": P(None, None)},
                "mlp": dict(mlp),
            },
            "norm": {"scale": P(None)},
            # V=1028 is not 128-divisible across 8 chips; replicate (37 MB bf16)
            "logits_dense": {"kernel": P(None, None, None)},
        },
    }


def fsdp_param_specs(config: DiaConfig, params: Params, mesh: Mesh,
                     min_elements: int = 1 << 16) -> Params:
    """ZeRO-style fully-sharded specs: the TP plan plus a ``data``-axis shard
    on one free dimension of every large leaf.

    The reference has no distributed training at all (SURVEY.md §2c); full
    fine-tuning of the 1.6B needs ~12.8 GB of fp32 AdamW state, which does
    not fit one v5e chip next to params + activations.  TPU-native FSDP is
    purely declarative: storing params (and therefore the optimizer moments,
    which ``optax`` builds with ``zeros_like`` and so inherit the sharding)
    split over the ``data`` axis makes GSPMD emit the all-gather-on-use /
    reduce-scatter-on-grad pattern — there is no hand-written parameter
    partitioning or gather schedule to maintain.

    Leaf rule: keep the TP axes from ``param_specs``; among the remaining
    free dimensions pick the largest one divisible by the data-axis size
    (weight matrices shard on the embedding dim; tiny norm/scale vectors
    below ``min_elements`` stay replicated — sharding them would cost more
    in collective latency than the bytes saved).
    """
    base = param_specs(config)
    dsize = mesh.shape[AXIS_DATA]

    def add_data_axis(spec: P, leaf) -> P:
        shape = tuple(np.shape(leaf))
        if int(np.prod(shape)) < min_elements or dsize <= 1:
            return spec
        dims = list(spec) + [None] * (len(shape) - len(spec))
        best = None
        for d, (size, axis) in enumerate(zip(shape, dims)):
            if axis is None and size % dsize == 0:
                if best is None or size > shape[best]:
                    best = d
        if best is None:
            return spec
        dims[best] = AXIS_DATA
        return P(*dims)

    return jax.tree.map(add_data_axis, base, params,
                        is_leaf=lambda x: isinstance(x, P))


def self_cache_spec() -> P:
    """KV cache [L, B, T, Nkv, H]: shard the head axis (1 head/chip on v5e-4)."""
    return P(None, None, None, AXIS_MODEL, None)


def cross_cache_spec() -> P:
    """Cross-attn cache [L, B, S, N, H]: shard the head axis."""
    return P(None, None, None, AXIS_MODEL, None)


def batch_spec(ndim: int, mesh: Mesh | None = None) -> P:
    """Shard the leading batch axis over data (and the DCN ``replica`` axis
    when the mesh has one — global batch = replica × data shards)."""
    batch_axes: Any = AXIS_DATA
    if mesh is not None and AXIS_REPLICA in mesh.axis_names:
        batch_axes = (AXIS_REPLICA, AXIS_DATA)
    return P(batch_axes, *([None] * (ndim - 1)))


def active_mesh() -> Mesh | None:
    """The mesh installed by an enclosing ``with mesh:`` block (at trace
    time), or None.  Lets jitted inference code apply sharding constraints
    only when the caller is actually running multi-chip."""
    from jax._src import mesh as mesh_lib

    m = mesh_lib.thread_resources.env.physical_mesh
    return None if m.empty else m


def constrain(x, spec: P):
    """``with_sharding_constraint`` against the active mesh, or identity.

    Axes in ``spec`` whose corresponding dimension is not divisible by the
    mesh-axis size are dropped (replicated) rather than left to GSPMD
    padding, keeping shapes exact inside the decode loop.
    """
    mesh = active_mesh()
    if mesh is None:
        return x
    fixed = []
    for dim, axis in enumerate(spec):
        if axis is None:
            fixed.append(None)
            continue
        # a spec entry may be one axis name or a tuple of axes (e.g. the
        # hybrid batch spec's ('replica', 'data')) — divisibility is against
        # the product of the named axis sizes
        axes = axis if isinstance(axis, tuple) else (axis,)
        size = int(np.prod([mesh.shape.get(a, 1) for a in axes]))
        fixed.append(axis if x.shape[dim] % size == 0 else None)
    fixed.extend([None] * (x.ndim - len(fixed)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*fixed)))


def shard_params(params: Params, mesh: Mesh, specs: Params | None = None,
                 config: DiaConfig | None = None, fsdp: bool = False) -> Params:
    """Commit the parameter pytree to the mesh with the TP layout
    (``fsdp=True`` additionally splits storage over the data axis —
    see ``fsdp_param_specs``)."""
    if specs is None:
        specs = (fsdp_param_specs(config, params, mesh) if fsdp
                 else param_specs(config))
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_batch(tree, mesh: Mesh):
    """Commit input arrays with the batch axis over data."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, batch_spec(np.ndim(x), mesh))), tree
    )


def replicate(tree, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def validate_divisibility(config: DiaConfig, model_size: int) -> list[str]:
    """Report TP-plan dimensions not divisible by the model-axis size
    (those fall back to replication-by-XLA; informational)."""
    issues = []
    m = config.model
    checks = {
        "encoder heads": m.encoder.n_head,
        "decoder q heads": m.decoder.gqa_query_heads,
        "decoder kv heads": m.decoder.kv_heads,
        "cross heads": m.decoder.cross_query_heads,
        "encoder ffn": m.encoder.n_hidden,
        "decoder ffn": m.decoder.n_hidden,
    }
    for name, dim in checks.items():
        if dim % model_size != 0:
            issues.append(f"{name} ({dim}) not divisible by model axis ({model_size})")
    return issues
