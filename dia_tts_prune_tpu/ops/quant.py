"""Int8 weight quantization for dense kernels.

The reference "quantization" applies torch ``quantize_dynamic`` over
``nn.Linear`` modules the model doesn't contain — a no-op on the transformer
(app.py:51-63, quirk Q7).  This module provides real symmetric per-channel
int8 quantization of the dense-kernel population:

* ``quantize_params_int8(params)`` — quantize→dequantize ("fake quant"):
  weights carry int8 precision but keep the compute dtype, so the standard
  jitted path runs unchanged.  This is the quality-equivalent of dynamic int8
  quantization for serving.
* ``quantize_params_int8_packed(params)`` — kernels stored as (int8 values,
  fp32 scales) for the bandwidth-saving int8 compute path.

Packed layout (perf-critical): values are stored PRE-FLATTENED to 2-D
``[K, N]`` (``[L, K, N]`` for stacked per-layer trees), K = contracted dims,
N = output columns, with the logical kernel dims kept as static metadata.
XLA only fuses the int8→bf16 convert into the dot's HBM operand read when
the weight is a plain 2-D slice; the model's logical 3-/4-D kernel shapes
(``[D,2,F]``, ``[D,N,H]``) make XLA pick a non-streamable layout and stage
each slice through VMEM with a separate layout-munging copy — measured
+0.5 ms/step on the 18-layer decode (hlo_stats via tools/trace_decode.py:
the ``wi_fused`` slice copy alone was 28% of step time).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


@jax.tree_util.register_pytree_node_class
class QuantizedKernel:
    """Packed int8 dense kernel: 2-D values + per-output-column scales.

    values: int8 ``[K, N]`` (``[L, K, N]`` inside stacked per-layer trees —
    scan/vmap slicing strips the leading axis, the static metadata survives).
    scale: f32 ``[1, N]`` (``[L, 1, N]`` stacked).
    in_shape/out_shape: the kernel's logical contracted/output dims
    (``K = prod(in_shape)``, ``N = prod(out_shape)``); static aux data, so
    jit caches key on them.
    """

    __slots__ = ("values", "scale", "in_shape", "out_shape")

    def __init__(self, values, scale, in_shape, out_shape):
        self.values = values
        self.scale = scale
        self.in_shape = tuple(in_shape)
        self.out_shape = tuple(out_shape)

    def tree_flatten(self):
        return (self.values, self.scale), (self.in_shape, self.out_shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)

    def __repr__(self):
        return (f"QuantizedKernel(values={getattr(self.values, 'shape', None)}, "
                f"in_shape={self.in_shape}, out_shape={self.out_shape})")


def quantize_int8(w: jax.Array, n_in: int = 1, stacked: bool = False) -> QuantizedKernel:
    """Symmetric per-output-column int8: q = round(w / s), s = max|w| / 127.

    ``n_in`` — number of leading (contracted) kernel axes; the rest are
    output axes, flattened into N columns with one scale each.  ``stacked``
    — the kernel carries a leading per-layer L axis (kept on values and
    scales so scanned layer pytrees stay uniform; each layer gets its own
    scales).
    """
    lead = w.shape[:1] if stacked else ()
    in_shape = w.shape[len(lead): len(lead) + n_in]
    out_shape = w.shape[len(lead) + n_in:]
    K = math.prod(in_shape)
    N = math.prod(out_shape)
    w2 = w.astype(jnp.float32).reshape(*lead, K, N)
    absmax = jnp.max(jnp.abs(w2), axis=-2, keepdims=True)  # [*, 1, N]
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w2 / scale), -127, 127).astype(jnp.int8)
    return QuantizedKernel(values=q, scale=scale, in_shape=in_shape, out_shape=out_shape)


def dequantize(qk: QuantizedKernel, dtype=jnp.float32) -> jax.Array:
    """Reconstruct the kernel at its logical shape."""
    w2 = qk.values.astype(jnp.float32) * qk.scale
    lead = w2.shape[:-2] if w2.ndim > 2 else ()
    return w2.reshape(*lead, *qk.in_shape, *qk.out_shape).astype(dtype)


def _map_kernels(params: Params, fn) -> Params:
    def walk(tree, path):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v, path + (k,))
            elif k == "kernel":
                out[k] = fn(v, path + (k,))
            else:
                out[k] = v
        return out

    return walk(params, ())


def _quant_args_for(path: tuple[str, ...]) -> dict:
    """Kernel-layout metadata by tree position: ``o_proj`` kernels contract
    two axes ([N, H, D], dense_general axis=(-2,-1)); everything else one.
    Kernels under a ``layers`` node are per-layer-stacked (leading L axis)."""
    return {"n_in": 2 if "o_proj" in path else 1, "stacked": "layers" in path}


def quantize_params_int8(params: Params) -> Params:
    """Fake-quantize every dense kernel (int8 precision, original dtype)."""

    def fq(w, path):
        return dequantize(quantize_int8(w, **_quant_args_for(path)), dtype=w.dtype)

    return _map_kernels(params, fq)


def fake_quant_ste(w: jax.Array, fq: jax.Array) -> jax.Array:
    """Straight-through estimator: forward sees ``fq``, backward sees ``w``.

    round() has zero gradient almost everywhere, so QAT passes gradients
    straight through the quantizer: d(loss)/d(w) := d(loss)/d(fq)."""
    return w + jax.lax.stop_gradient(fq.astype(w.dtype) - w)


def fake_quant_params_ste(
    params: Params, mode: str, scope: str | None = "decoder",
    group: int | None = 128,
) -> Params:
    """Quantization-aware-training view of the params.

    Every dense kernel inside ``scope`` is replaced by its fake-quantized
    value wired through a straight-through estimator, so the forward pass
    sees EXACTLY the serving quantizer's numerics (same per-column /
    per-group symmetric grids as ``quantize_params_int8_packed`` /
    ``quantize_params_int4_packed``) while gradients flow to the underlying
    fp weights.  ``mode``: ``int8`` | ``int4`` (grouped, ``group`` rows per
    scale) | ``int4_hybrid`` (int4 MLP kernels, int8 elsewhere — the hybrid
    serving config).  ``scope`` defaults to ``decoder``, matching the
    serving quantization scope (the encoder serves at bf16).

    Scales are recomputed from the live weights every step (dynamic-range
    QAT): the grid tracks the weights as they move, and at export time
    ``quantize_params_int8_packed``/``int4`` reproduce the exact forward
    numerics seen in training.
    """
    if mode not in ("int8", "int4", "int4_hybrid"):
        raise ValueError(f"Unknown QAT mode: {mode!r}")

    def fq(w, path):
        a = _quant_args_for(path)
        use_int4 = mode == "int4" or (mode == "int4_hybrid" and "mlp" in path)
        if use_int4:
            deq = dequantize4(quantize_int4(w, group=group, **a), dtype=w.dtype)
        else:
            deq = dequantize(quantize_int8(w, **a), dtype=w.dtype)
        return fake_quant_ste(w, deq)

    if scope is not None and scope in params:
        out = dict(params)
        out[scope] = _map_kernels(params[scope], lambda w, p: fq(w, (scope,) + p))
        return out
    return _map_kernels(params, fq)


def quantize_params_int8_packed(
    params: Params, scope: str | None = "decoder", fused: bool = True
) -> Params:
    """Pack dense kernels as QuantizedKernels (int8 + scales).

    ``scope`` limits packing to one top-level subtree — default ``"decoder"``:
    the decode loop streams decoder weights every step (bandwidth-bound GEMV,
    int8 halves the bytes), while the encoder runs ONCE per generate call as
    a compute-bound GEMM where the int8 2-D layout measured slower
    (time-to-first-audio 0.21→0.84 s when the encoder was packed too).
    Pass ``scope=None`` to pack the whole tree (memory-at-rest).

    ``fused`` additionally builds the fused-decode-step weight pack
    (``params["decoder"]["fused_pack"]``, see ops/kernels/fused_step.py) from
    the raw weights BEFORE quantization — norm gains fold into the int8
    quantization at no extra error.  The fused kernel is the fastest TPU
    decode path; the QuantizedKernel tree remains the prefill/fallback path."""
    import os

    fused_pack = None
    if fused and "decoder" in params:
        try:
            from .kernels.fused_step import repack_decoder_fused

            # DIA_FUSED_INT4=1: nibble-pack the MLP matrices (73% of the
            # per-step weight bytes) int4 inside the fused pack — only the
            # Pallas kernel can exploit the layout (one HBM read feeds both
            # contraction halves), so the knob lives here with the pack.
            # The int4 wm pairing is per-K-tile: match the kernel's tiling
            # knob (DIA_FUSED_MT) so the knobs compose.
            fused_pack = repack_decoder_fused(
                params, mlp_int4=os.environ.get("DIA_FUSED_INT4") == "1",
                mlp_tiles=int(os.environ.get("DIA_FUSED_MT", "4")))
        except (KeyError, TypeError, AttributeError):
            fused_pack = None  # pruned/packed/nonstandard layouts: unavailable

    def pk(w, path):
        if type(w).__name__ in ("QuantizedKernel", "Quantized4Kernel",
                                "BlockSparseKernel"):
            return w  # already packed (e.g. int4-MLP hybrid composition)
        return quantize_int8(w, **_quant_args_for(path))

    if scope is not None and scope in params:
        out = dict(params)
        out[scope] = _map_kernels(params[scope], lambda w, p: pk(w, (scope,) + p))
    else:
        out = _map_kernels(params, pk)
    if fused_pack is not None:
        out["decoder"] = dict(out["decoder"])
        out["decoder"]["fused_pack"] = fused_pack
    return out


@jax.tree_util.register_pytree_node_class
class Quantized4Kernel:
    """Packed int4 dense kernel (weight-only, grouped or per-column scales).

    values: int4 — plain ``[K, N]`` (group=None) or grouped ``[K//G, G, N]``;
    stacked per-layer trees carry a leading L axis on values and scales.
    scale: f32 — ``[N]`` plain / ``[K//G, N]`` grouped (``[L, ...]`` stacked).
    in_shape/out_shape: logical kernel dims (static aux data, like
    ``QuantizedKernel``).  group: the contraction-group size or None.

    nibble: values are int8 BYTES ``[K//2, N]`` holding two int4 rows each
    (byte k2 = row 2k2 in the low nibble, row 2k2+1 in the high nibble,
    two's complement).  No ``S4``-dtype array ever exists — required on
    backends whose int4 device transfer is broken (axon) — and the
    contraction splits by row parity so unpack is two arithmetic shifts
    fused into the dot operand reads (ops/kernels/int4_matmul.py).
    Grouped nibble keeps values FLAT ``[K//2, N]`` with scale ``[K//G, N]``.

    halfsplit: nibble layout paired across CONTRACTION HALVES instead of
    row parity — byte k2 = row k2 (low nibble) | row k2 + K/2 (high) —
    so both the XLA contraction and the Pallas int4 GEMV kernel
    (ops/kernels/int4_gemv.py) consume CONTIGUOUS activation/weight halves:
    no strided slices, no sublane shuffles, shift-only unpack.  Same
    quantization grid (values and scales identical to the parity layout;
    only the stored byte order differs).  Requires (K/2) % group == 0 so
    scale rows split cleanly between halves.
    """

    __slots__ = ("values", "scale", "in_shape", "out_shape", "group", "nibble",
                 "halfsplit", "layout")

    def __init__(self, values, scale, in_shape, out_shape, group, nibble=False,
                 halfsplit=False, layout="kgn"):
        self.values = values
        self.scale = scale
        self.in_shape = tuple(in_shape)
        self.out_shape = tuple(out_shape)
        self.group = group
        self.nibble = bool(nibble)
        self.halfsplit = bool(halfsplit)
        # grouped S4 memory order: "kgn" = [K/G, G, N] (classic) or "kng" =
        # [K/G, N, G] (contraction-minor; measured faster on v5e — PERF.md r5)
        self.layout = layout

    def tree_flatten(self):
        return (self.values, self.scale), (
            self.in_shape, self.out_shape, self.group, self.nibble,
            self.halfsplit, self.layout)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)

    def __repr__(self):
        return (f"Quantized4Kernel(values={getattr(self.values, 'shape', None)}, "
                f"group={self.group}, nibble={self.nibble}, "
                f"halfsplit={self.halfsplit}, "
                f"in_shape={self.in_shape}, out_shape={self.out_shape})")


def _pack_nibble_rows(q: jax.Array) -> jax.Array:
    """int8 rows ∈ [-7, 7] ``[*, K, N]`` → bytes ``[*, K//2, N]``."""
    lo = q[..., 0::2, :]
    hi = q[..., 1::2, :]
    return ((hi << 4) | (lo & 0x0F)).astype(jnp.int8)


def _pack_nibble_rows_halfsplit(q: jax.Array) -> jax.Array:
    """int8 rows ∈ [-7, 7] ``[*, K, N]`` → bytes ``[*, K//2, N]``, pairing
    row k (low nibble) with row k + K/2 (high): contiguous-half layout for
    the Pallas int4 GEMV (ops/kernels/int4_gemv.py)."""
    K = q.shape[-2]
    lo = q[..., : K // 2, :]
    hi = q[..., K // 2:, :]
    return ((hi << 4) | (lo & 0x0F)).astype(jnp.int8)


def quantize_int4(
    w: jax.Array, n_in: int = 1, stacked: bool = False, group: int | None = 128,
    nibble: bool = False, halfsplit: bool = False,
) -> Quantized4Kernel:
    """Symmetric int4: q = round(w / s) ∈ [-7, 7].

    ``group`` — rows of the contracted K axis sharing one scale per output
    column (the quality-preserving layout at 4 bits: error stays local to a
    128-row group).  ``group=None`` uses one scale per column, the same
    granularity as the int8 path.  K must divide by ``group``.

    ``nibble`` — store the int4 values two-per-int8-byte (``[K//2, N]``)
    instead of an ``S4``-dtype array; identical numerics, works on backends
    with broken int4 transfer, and the XLA contraction streams half the int8
    bytes (see Quantized4Kernel).  Requires even K (and even ``group``).

    ``halfsplit`` — pair contraction HALVES per byte instead of adjacent
    rows (see Quantized4Kernel): the layout the Pallas int4 GEMV consumes.
    Same grid/scales; falls back to parity pairing when (K/2) % group != 0
    or K/2 is odd.
    """
    lead = w.shape[:1] if stacked else ()
    in_shape = w.shape[len(lead): len(lead) + n_in]
    out_shape = w.shape[len(lead) + n_in:]
    K = math.prod(in_shape)
    N = math.prod(out_shape)
    w2 = w.astype(jnp.float32).reshape(*lead, K, N)
    if nibble and K % 2:
        nibble = False  # odd contraction (tiny/pruned shapes): S4 fallback
    if group is not None:
        group = min(group, K)
        if K % group or (nibble and group % 2):
            group = None  # indivisible: fall back to per-column scales
    if halfsplit and not (nibble and K % 2 == 0
                          and (group is None or (K // 2) % group == 0)):
        halfsplit = False  # halves must be group-aligned
    pack = _pack_nibble_rows_halfsplit if halfsplit else _pack_nibble_rows
    if group is None:
        absmax = jnp.max(jnp.abs(w2), axis=-2, keepdims=True)  # [*, 1, N]
        scale = jnp.maximum(absmax, 1e-12) / 7.0
        q = jnp.clip(jnp.round(w2 / scale), -7, 7)
        v = pack(q.astype(jnp.int8)) if nibble else q.astype(jnp.int4)
        return Quantized4Kernel(
            v, scale.reshape(*lead, N), in_shape, out_shape, None, nibble,
            halfsplit)
    wg = w2.reshape(*lead, K // group, group, N)
    absmax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)  # [*, K//G, 1, N]
    scale = jnp.maximum(absmax, 1e-12) / 7.0
    q = jnp.clip(jnp.round(wg / scale), -7, 7)
    if nibble:
        v = pack(q.astype(jnp.int8).reshape(*lead, K, N))
    else:
        v = q.astype(jnp.int4)
    return Quantized4Kernel(
        v, scale.reshape(*lead, K // group, N), in_shape, out_shape, group,
        nibble, halfsplit)


def unpack_nibble_rows(b: jax.Array, halfsplit: bool = False) -> jax.Array:
    """Bytes ``[*, K//2, N]`` → int8 rows ``[*, K, N]`` (sign-extended)."""
    lo = (b << 4) >> 4
    hi = b >> 4
    if halfsplit:
        return jnp.concatenate([lo, hi], axis=-2)  # [*, K, N]
    q = jnp.stack([lo, hi], axis=-2)  # [*, K//2, 2, N]
    return q.reshape(*b.shape[:-2], 2 * b.shape[-2], b.shape[-1])


def unpack_to_s4(qk: Quantized4Kernel) -> Quantized4Kernel:
    """Nibble-byte kernel → XLA-native int4 (S4 dtype) kernel. Traceable.

    MUST run inside a jit on remote-attached backends: S4 arrays work on
    device but crash the moment one crosses a jit/transfer boundary (axon
    RecursionError — tools/probe_s4_device.py, tools/probe_int4_deviceput.py).
    Called once at the top of the fused generate programs, BEFORE the decode
    loop, so XLA holds the packed-int4 tensor resident across steps and
    fuses the int4→bf16 upcast into each dot's HBM operand read.  Measured
    0.45–0.51 ms per 18-layer MLP GEMV chain vs 0.84 ms int8 and 1.01 ms for
    the best Pallas shift-unpack kernel (docs/PERF.md round 4): XLA's native
    4-bit storage is the only path that actually streams at 4-bit density.

    Grid/scales are untouched — numerics identical to the nibble layout.
    """
    if not qk.nibble:
        return qk
    import os as _os

    v8 = unpack_nibble_rows(qk.values, qk.halfsplit)  # [*, K, N] int8
    v4 = v8.astype(jnp.int4)
    layout = "kgn"
    if qk.group is not None:
        lead = v4.shape[:-2]
        K, N = v4.shape[-2], v4.shape[-1]
        v4 = v4.reshape(*lead, K // qk.group, qk.group, N)
        # contraction-minor order: -38% on the ISOLATED 18-layer MLP chain
        # (tools/microbench_int4.py s4_kng_res 0.571 vs s4_kgn_res 0.921 ms)
        # but +16% on the FULL decode step (1.695 vs 1.46 ms/step, r5 —
        # the win does not survive scheduling against the interleaved
        # attention/cache ops).  Default stays kgn; DIA_INT4_LAYOUT=kng is
        # the recorded negative (trace-time flag).
        if _os.environ.get("DIA_INT4_LAYOUT", "kgn") == "kng":
            perm = tuple(range(len(lead))) + (
                len(lead), len(lead) + 2, len(lead) + 1)
            v4 = v4.transpose(perm)
            layout = "kng"
    return Quantized4Kernel(
        v4, qk.scale, qk.in_shape, qk.out_shape, qk.group,
        nibble=False, halfsplit=False, layout=layout)


def unpack_params_s4(params: Params) -> Params:
    """Map ``unpack_to_s4`` over every Quantized4Kernel in a params tree.

    No-op on trees without nibble int4 kernels (returns leaves unchanged,
    so jit retracing keys stay stable for int8/bf16 configs)."""

    changed = False

    def visit(v):
        nonlocal changed
        if isinstance(v, Quantized4Kernel) and v.nibble:
            changed = True
            return unpack_to_s4(v)
        return v

    # Walk via tree_util with is_leaf so nibble kernels are found in ANY
    # container (dicts, tuples like the DIA_FUSED_INT4 pack, lists), not
    # only dict values.
    out = jax.tree_util.tree_map(
        visit, params, is_leaf=lambda x: isinstance(x, Quantized4Kernel))
    return out if changed else params


def dequantize4(qk: Quantized4Kernel, dtype=jnp.float32) -> jax.Array:
    """Reconstruct the kernel at its logical shape."""
    if qk.nibble:
        v = unpack_nibble_rows(
            qk.values, getattr(qk, "halfsplit", False)).astype(jnp.float32)  # [*, K, N]
        lead = v.shape[:-2]
        K, N = v.shape[-2], v.shape[-1]
        if qk.group is None:
            w2 = v * qk.scale.reshape(*lead, 1, N)
        else:
            vg = v.reshape(*lead, K // qk.group, qk.group, N)
            s = qk.scale.reshape(*lead, K // qk.group, 1, N)
            w2 = (vg * s).reshape(*lead, K, N)
        return w2.reshape(*lead, *qk.in_shape, *qk.out_shape).astype(dtype)
    v = qk.values.astype(jnp.float32)
    if qk.group is None:
        lead = v.shape[:-2]
        w2 = v * qk.scale.reshape(*lead, 1, v.shape[-1])
    else:
        lead = v.shape[:-3]
        if getattr(qk, "layout", "kgn") == "kng":
            # [*, K/G, N, G] -> [*, K/G, G, N]
            perm = tuple(range(len(lead))) + (
                len(lead), len(lead) + 2, len(lead) + 1)
            v = v.transpose(perm)
        s = qk.scale.reshape(*lead, v.shape[-3], 1, v.shape[-1])
        w2 = (v * s).reshape(*lead, v.shape[-3] * v.shape[-2], v.shape[-1])
    return w2.reshape(*lead, *qk.in_shape, *qk.out_shape).astype(dtype)


def quantize_params_int4_packed(
    params: Params,
    scope: str | None = "decoder",
    group: int | None = 128,
    mlp_only: bool = False,
    nibble: bool = False,
    halfsplit: bool = False,
) -> Params:
    """Pack dense kernels as Quantized4Kernels (int4 + grouped scales).

    Same scoping rationale as ``quantize_params_int8_packed`` (the decode
    loop is where weight bytes recur; the encoder runs once).  ``mlp_only``
    packs only the MLP kernels (wi_fused/wo — ~57% of per-layer weight
    bytes, the least quantization-sensitive population) at int4 and leaves
    the rest for the caller — compose with the int8 packer for the hybrid
    config:  ``quantize_params_int8_packed(quantize_params_int4_packed(p,
    mlp_only=True))`` (the int8 walk skips non-array leaves).
    """

    def pk(w, path):
        if mlp_only and "mlp" not in path:
            return w
        a = _quant_args_for(path)
        return quantize_int4(w, group=group, nibble=nibble,
                             halfsplit=halfsplit, **a)

    if scope is not None and scope in params:
        out = dict(params)
        out[scope] = _map_kernels(params[scope], lambda w, p: pk(w, (scope,) + p))
    else:
        out = _map_kernels(params, pk)
    return out


def quantization_error(params: Params) -> float:
    """Max relative RMS error introduced by int8 quantization (diagnostics)."""
    worst = 0.0
    leaves = []

    def walk(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v)
            elif k == "kernel":
                leaves.append(v)

    walk(params)
    import numpy as np

    for w in leaves:
        w32 = np.asarray(w, np.float32)
        deq = np.asarray(dequantize(quantize_int8(jnp.asarray(w32))))
        rms = float(np.sqrt(np.mean((w32 - deq) ** 2)) / (np.sqrt(np.mean(w32**2)) + 1e-12))
        worst = max(worst, rms)
    return worst
