"""Offline pruning CLI (reference: offline_prune.py:28-178).

load → prune (unstructured global-L1 | structured per-layer Ln | physical FFN
shrink) → sparsity report → save a reference-compatible checkpoint
(config.json + pytorch_model.bin when torch is available, else safetensors)
so both this framework and the torch reference can consume the result.

Run: ``python -m dia_tts_prune_tpu.offline_prune --model-path … --output-dir …
--prune-mode unstructured --prune-amount 0.6``
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Offline pruning for the TPU-native Dia model")
    parser.add_argument("--model-path", type=str, required=True,
                        help="Local model dir (config.json + weights) or HF repo id.")
    parser.add_argument("--output-dir", type=str, required=True)
    parser.add_argument("--prune-mode", type=str, required=True,
                        choices=["unstructured", "structured", "block", "shrink-ffn", "shrink-heads"])
    parser.add_argument("--prune-amount", type=float, required=True,
                        help="Fraction of weights/structures to prune (0, 1).")
    parser.add_argument("--prune-dim", type=int, default=0,
                        help="Structured mode: dimension of the per-module weight to prune along.")
    parser.add_argument("--prune-norm", type=int, default=2, choices=[1, 2])
    parser.add_argument("--block-size", type=int, nargs=2, default=[256, 256],
                        metavar=("BK", "BN"),
                        help="block mode: block granularity (matches the "
                             "block-sparse matmul kernel's DMA tiles)")
    parser.add_argument("--compute-dtype", type=str, default="float32", choices=["float32"])
    parser.add_argument("--save-format", type=str, default="auto",
                        choices=["auto", "torch", "safetensors"])
    args = parser.parse_args(argv)

    if not (0.0 < args.prune_amount < 1.0):
        parser.error("--prune-amount must be in (0.0, 1.0) exclusive.")

    from .api import Dia
    from .checkpoint import to_torch_state_dict
    from .prune import (
        apply_masks,
        block_masks,
        shrink_ffn,
        sparsity_report,
        structured_masks,
        unstructured_masks,
    )

    t0 = time.time()
    dia = Dia.from_pretrained(args.model_path, compute_dtype=args.compute_dtype)
    config = dia.config
    params = dia.params
    print(f"Loaded model from {args.model_path} in {time.time() - t0:.1f}s")

    if args.prune_mode == "unstructured":
        masks = unstructured_masks(params, args.prune_amount)
        pruned = apply_masks(params, masks)
    elif args.prune_mode == "structured":
        masks = structured_masks(params, args.prune_amount, dim=args.prune_dim, n=args.prune_norm)
        pruned = apply_masks(params, masks)
    elif args.prune_mode == "block":
        masks = block_masks(params, args.prune_amount, block=tuple(args.block_size))
        pruned = apply_masks(params, masks)
    elif args.prune_mode == "shrink-heads":
        from .prune import shrink_heads

        pruned, config = shrink_heads(params, config, keep_fraction=1.0 - args.prune_amount)
    else:  # shrink-ffn: physically smaller shapes (beyond the reference)
        pruned, config = shrink_ffn(params, config, keep_fraction=1.0 - args.prune_amount)

    report = sparsity_report(pruned)
    print(f"Sparsity: {report['sparsity']:.4f} "
          f"({report['zero_params']}/{report['total_params']} zero parameters)")

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    config.save(out / "config.json")
    (out / "prune_report.json").write_text(
        json.dumps({k: v for k, v in report.items() if k != "per_module"}, indent=2)
    )

    fmt = args.save_format
    if fmt == "auto":
        try:
            import torch  # noqa: F401

            fmt = "torch"
        except ImportError:
            fmt = "safetensors"
    sd = to_torch_state_dict(pruned, config)
    if fmt == "torch":
        import numpy as np
        import torch

        torch_sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
        torch.save(torch_sd, out / "pytorch_model.bin")
        print(f"Saved pruned checkpoint to {out / 'pytorch_model.bin'}")
    else:
        from safetensors.numpy import save_file

        save_file(sd, str(out / "model.safetensors"))
        print(f"Saved pruned checkpoint to {out / 'model.safetensors'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
