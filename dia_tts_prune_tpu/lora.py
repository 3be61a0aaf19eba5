"""First-class LoRA adapters over the stacked parameter pytree.

The reference delegates LoRA to the ``peft`` library wrapping torch modules
(finetune.py:374-396, default targets ["q_proj", "v_proj"]); here adapters are
native pytrees:

* ``init_lora(params, config)`` creates A/B factors per targeted kernel, with
  the layer axis stacked like the base params (scan-compatible).
* ``merge_lora(params, adapter)`` fuses ``W + (alpha/r)·A@B`` into the base
  kernels — the "adapter fusion for inference" requirement (BASELINE.json):
  fused inference runs the exact base-model code path at zero overhead.
* Training applies the merge *inside* the loss under ``stop_gradient`` on the
  base weights, so gradients flow only to A/B (see train.py).

A is initialized Kaiming-ish normal, B zero — merged delta starts at 0,
matching peft semantics.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

# target name -> (#input axes, #output axes) of the kernel *after* the stacked
# layer axis (reference DenseGeneral layouts, dia/layers.py:204-227, 77-90, 622-628)
_TARGET_SPLITS = {
    "q_proj": 1,
    "k_proj": 1,
    "v_proj": 1,
    "o_proj": 2,
    "wi_fused": 1,
    "wo": 1,
    "logits_dense": 1,
}


@dataclass(frozen=True)
class LoraConfig:
    """Mirrors the reference CLI surface (finetune.py:374-396)."""

    r: int = 8
    alpha: float = 16.0
    dropout: float = 0.0
    target_modules: tuple[str, ...] = ("q_proj", "v_proj")

    @property
    def scale(self) -> float:
        return self.alpha / self.r


def _split_in_out(name: str, shape: tuple[int, ...], stacked: bool) -> tuple[int, int, int]:
    """Return (L or 1, fan_in, fan_out) for a kernel."""
    n_in = _TARGET_SPLITS[name]
    dims = shape[1:] if stacked else shape
    fan_in = int(np.prod(dims[:n_in]))
    fan_out = int(np.prod(dims[n_in:]))
    L = shape[0] if stacked else 1
    return L, fan_in, fan_out


def init_lora(params: Params, config: LoraConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    """Build the adapter pytree: mirrors params, with {'a','b'} at targets."""
    keys = iter(jax.random.split(key, 128))

    def walk(tree, path):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if k in config.target_modules and "kernel" in v and k in _TARGET_SPLITS:
                    stacked = "layers" in path
                    L, fan_in, fan_out = _split_in_out(k, v["kernel"].shape, stacked)
                    a_shape = (L, fan_in, config.r) if stacked else (fan_in, config.r)
                    b_shape = (L, config.r, fan_out) if stacked else (config.r, fan_out)
                    a = (
                        jax.random.normal(next(keys), a_shape, jnp.float32)
                        / np.sqrt(fan_in)
                    ).astype(dtype)
                    out[k] = {"a": a, "b": jnp.zeros(b_shape, dtype)}
                else:
                    sub = walk(v, path + (k,))
                    if sub:
                        out[k] = sub
        return out

    weights = walk(params, ())
    return {"config": _config_leaves(config), "weights": weights}


def _config_leaves(config: LoraConfig) -> dict:
    return {
        "r": config.r,
        "alpha": config.alpha,
        "dropout": config.dropout,
        "target_modules": list(config.target_modules),
    }


def lora_delta(name: str, ab: Params, kernel_shape: tuple[int, ...], scale: float, stacked: bool) -> jax.Array:
    """(alpha/r)·A@B reshaped to the kernel's layout."""
    a, b = ab["a"], ab["b"]
    if stacked:
        delta = jnp.einsum("lir,lro->lio", a, b)
    else:
        delta = a @ b
    return (scale * delta).reshape(kernel_shape)


def merge_lora(params: Params, adapter: Params, sign: float = 1.0) -> Params:
    """Fuse the adapter into base kernels: W + sign·(alpha/r)·A@B.

    ``sign=-1`` un-merges (exact inverse in fp32)."""
    cfg = adapter["config"]
    scale = cfg["alpha"] / cfg["r"]
    weights = adapter["weights"]

    def walk(tree, sub, path):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if k in sub and "a" in sub[k]:
                    stacked = "layers" in path
                    delta = lora_delta(k, sub[k], v["kernel"].shape, scale, stacked)
                    out[k] = {"kernel": (v["kernel"] + sign * delta.astype(v["kernel"].dtype))}
                elif k in sub:
                    out[k] = walk(v, sub[k], path + (k,))
                else:
                    out[k] = v
            else:
                out[k] = v
        return out

    return walk(params, weights, ())


def save_adapter(path: str | Path, adapter: Params) -> None:
    """Persist as adapter_config.json + adapter_weights.npz (peft-style layout,
    reference: finetune.py:574,605)."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "adapter_config.json").write_text(json.dumps(adapter["config"], indent=2))
    flat = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, f"{prefix}{k}.")
            else:
                flat[f"{prefix}{k}"] = np.asarray(v)

    walk(adapter["weights"], "")
    np.savez(path / "adapter_weights.npz", **flat)


def load_adapter(path: str | Path) -> Params:
    path = Path(path)
    config = json.loads((path / "adapter_config.json").read_text())
    data = np.load(path / "adapter_weights.npz")
    weights: Params = {}
    for key in data.files:
        parts = key.split(".")
        node = weights
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return {"config": config, "weights": weights}


def lora_param_count(adapter: Params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(adapter["weights"]))
