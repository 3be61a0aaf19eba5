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
  fp32 scales) for the bandwidth-saving int8 compute path (Pallas int8
  matmul kernels consume this layout).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

Params = dict[str, Any]


class QuantizedKernel(NamedTuple):
    values: jax.Array  # int8, original kernel shape
    scale: jax.Array  # fp32, broadcastable per-output-channel scales


def quantize_int8(
    w: jax.Array, channel_axis: int = -1, preserve_axes: tuple[int, ...] = ()
) -> QuantizedKernel:
    """Symmetric per-channel int8: q = round(w / s), s = max|w| / 127.

    ``preserve_axes`` keeps additional axes in the scale (e.g. the stacked
    layer axis, so scanned layer pytrees keep a leading ``L`` on every leaf
    and each layer gets its own scales)."""
    keep = {channel_axis % w.ndim} | {a % w.ndim for a in preserve_axes}
    axes = tuple(a for a in range(w.ndim) if a not in keep)
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axes, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return QuantizedKernel(values=q, scale=scale)


def dequantize(qk: QuantizedKernel, dtype=jnp.float32) -> jax.Array:
    return (qk.values.astype(jnp.float32) * qk.scale).astype(dtype)


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


def _preserve_for(path: tuple[str, ...]) -> tuple[int, ...]:
    # stacked per-layer kernels carry a leading L axis that scan requires on
    # every leaf — keep it in the scale (per-layer scales are also better)
    return (0,) if "layers" in path else ()


def quantize_params_int8(params: Params) -> Params:
    """Fake-quantize every dense kernel (int8 precision, original dtype)."""

    def fq(w, path):
        return dequantize(quantize_int8(w, preserve_axes=_preserve_for(path)), dtype=w.dtype)

    return _map_kernels(params, fq)


def quantize_params_int8_packed(params: Params) -> Params:
    """Pack every dense kernel as a QuantizedKernel (int8 + scales)."""

    def pk(w, path):
        return quantize_int8(w, preserve_axes=_preserve_for(path))

    return _map_kernels(params, pk)


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
