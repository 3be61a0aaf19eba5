"""Checkpoint conversion and persistence.

Two jobs (reference equivalents: dia/model.py:139-236 load paths and the
``torch.save(state_dict)`` save path in offline_prune.py:153-155 /
finetune.py:578-580):

1. **torch ↔ JAX conversion.**  The reference's ``DenseGeneral`` stores
   kernels in JAX layout ``in_shapes + out_features`` (dia/layers.py:19-53),
   so the published ``pytorch_model.bin`` converts by key-renaming plus
   stacking per-layer tensors onto a leading ``L`` axis (our stacks are
   scanned).  ``lora_``-prefixed keys are filtered as in the reference loader
   (dia/model.py:172).
2. **Native JAX persistence** via orbax (params + optimizer state + step),
   which the reference lacks entirely (SURVEY.md §5: no optimizer-state
   saving, no resume).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from .config import DiaConfig

Params = dict[str, Any]


def _to_numpy(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    try:  # torch tensor without importing torch at module scope
        return x.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(x)


_ATTN_KEYS = ("q_proj", "k_proj", "v_proj", "o_proj")


def convert_torch_state_dict(
    state_dict: Mapping[str, Any], config: DiaConfig, dtype=jnp.float32
) -> Params:
    """Torch ``state_dict`` (tensors or numpy) → stacked JAX param pytree.

    Accepts the reference checkpoint key schema (dia/layers.py:419-814):
    ``encoder.layers.{i}.…``, ``decoder.embeddings.{c}.weight`` etc.
    """
    sd = {k: _to_numpy(v) for k, v in state_dict.items() if "lora_" not in k}
    enc_L = config.model.encoder.n_layer
    dec_L = config.model.decoder.n_layer
    C = config.data.channels

    def get(key):
        if key not in sd:
            raise KeyError(f"Missing checkpoint key: {key}")
        return sd[key]

    def stack(fmt, L):
        return jnp.asarray(np.stack([get(fmt.format(i=i)) for i in range(L)]), dtype=dtype)

    def enc_attn(name):
        return {
            p: {"kernel": stack(f"encoder.layers.{{i}}.{name}.{p}.weight", enc_L)}
            for p in _ATTN_KEYS
        }

    def dec_attn(name):
        return {
            p: {"kernel": stack(f"decoder.layers.{{i}}.{name}.{p}.weight", dec_L)}
            for p in _ATTN_KEYS
        }

    params: Params = {
        "encoder": {
            "embedding": {"embedding": jnp.asarray(get("encoder.embedding.weight"), dtype=dtype)},
            "layers": {
                "pre_sa_norm": {"scale": stack("encoder.layers.{i}.pre_sa_norm.weight", enc_L)},
                "self_attention": enc_attn("self_attention"),
                "post_sa_norm": {"scale": stack("encoder.layers.{i}.post_sa_norm.weight", enc_L)},
                "mlp": {
                    "wi_fused": {"kernel": stack("encoder.layers.{i}.mlp.wi_fused.weight", enc_L)},
                    "wo": {"kernel": stack("encoder.layers.{i}.mlp.wo.weight", enc_L)},
                },
            },
            "norm": {"scale": jnp.asarray(get("encoder.norm.weight"), dtype=dtype)},
        },
        "decoder": {
            "embeddings": {
                "embedding": jnp.asarray(
                    np.stack([get(f"decoder.embeddings.{c}.weight") for c in range(C)]),
                    dtype=dtype,
                )
            },
            "layers": {
                "pre_sa_norm": {"scale": stack("decoder.layers.{i}.pre_sa_norm.weight", dec_L)},
                "self_attention": dec_attn("self_attention"),
                "pre_ca_norm": {"scale": stack("decoder.layers.{i}.pre_ca_norm.weight", dec_L)},
                "cross_attention": dec_attn("cross_attention"),
                "pre_mlp_norm": {"scale": stack("decoder.layers.{i}.pre_mlp_norm.weight", dec_L)},
                "mlp": {
                    "wi_fused": {"kernel": stack("decoder.layers.{i}.mlp.wi_fused.weight", dec_L)},
                    "wo": {"kernel": stack("decoder.layers.{i}.mlp.wo.weight", dec_L)},
                },
            },
            "norm": {"scale": jnp.asarray(get("decoder.norm.weight"), dtype=dtype)},
            "logits_dense": {"kernel": jnp.asarray(get("decoder.logits_dense.weight"), dtype=dtype)},
        },
    }
    return params


def to_torch_state_dict(params: Params, config: DiaConfig) -> dict[str, np.ndarray]:
    """Inverse conversion: stacked pytree → reference-schema flat dict (numpy).

    Useful for exporting checkpoints consumable by the torch reference."""
    out: dict[str, np.ndarray] = {}
    enc = params["encoder"]
    dec = params["decoder"]
    out["encoder.embedding.weight"] = np.asarray(enc["embedding"]["embedding"])
    out["encoder.norm.weight"] = np.asarray(enc["norm"]["scale"])
    out["decoder.norm.weight"] = np.asarray(dec["norm"]["scale"])
    out["decoder.logits_dense.weight"] = np.asarray(dec["logits_dense"]["kernel"])
    for c in range(config.data.channels):
        out[f"decoder.embeddings.{c}.weight"] = np.asarray(dec["embeddings"]["embedding"][c])

    def unstack(prefix, tree, L):
        flat = _flatten(tree)
        for path, arr in flat.items():
            arr = np.asarray(arr)
            for i in range(L):
                out[f"{prefix}.{i}.{path}"] = arr[i]

    unstack("encoder.layers", enc["layers"], config.model.encoder.n_layer)
    unstack("decoder.layers", dec["layers"], config.model.decoder.n_layer)
    return out


def _flatten(tree: Params, prefix: str = "") -> dict[str, Any]:
    """Flatten param subtree to reference key names (kernel→weight, scale→weight)."""
    flat = {}
    for k, v in tree.items():
        name = {"kernel": "weight", "scale": "weight", "embedding": "weight"}.get(k, k)
        key = f"{prefix}.{name}" if prefix else name
        if isinstance(v, dict):
            flat.update(_flatten(v, f"{prefix}.{k}" if prefix else k))
        else:
            flat[key] = v
    return flat


def load_torch_checkpoint(path: str | Path, config: DiaConfig, dtype=jnp.float32) -> Params:
    """Load a reference ``pytorch_model.bin``/``.pth`` and convert
    (reference load path: dia/model.py:139-187)."""
    import torch

    state_dict = torch.load(str(path), map_location="cpu", weights_only=True)
    return convert_torch_state_dict(state_dict, config, dtype=dtype)


def load_safetensors_checkpoint(path: str | Path, config: DiaConfig, dtype=jnp.float32) -> Params:
    """Load a safetensors checkpoint with the reference key schema."""
    from safetensors.numpy import load_file

    return convert_torch_state_dict(load_file(str(path)), config, dtype=dtype)


# ---------------------------------------------------------------------------
# Orbax persistence (params + opt state + step) — resume support the reference
# lacks (SURVEY.md §5 checkpoint/resume).
# ---------------------------------------------------------------------------


def save_checkpoint(directory: str | Path, payload: Params, step: int | None = None) -> None:
    import orbax.checkpoint as ocp

    path = Path(directory).absolute()
    if step is not None:
        path = path / f"step_{step}"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(directory: str | Path, template: Params) -> Params:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(directory).absolute(), target=template)


def latest_step_dir(directory: str | Path) -> Path | None:
    """Find the newest ``step_{N}`` subdirectory for resume."""
    directory = Path(directory)
    if not directory.exists():
        return None
    best, best_step = None, -1
    for p in directory.iterdir():
        m = re.fullmatch(r"step_(\d+)", p.name)
        if m and int(m.group(1)) > best_step:
            best, best_step = p, int(m.group(1))
    return best
