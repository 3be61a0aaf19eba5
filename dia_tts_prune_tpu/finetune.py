"""Fine-tuning CLI (reference: finetune.py:266-623).

Full or LoRA fine-tuning over an LJSpeech-format dataset, with optional
pruning before fine-tuning (reference :359-372), periodic checkpointing
(:563-581) and a final save (:588-621).  Unlike the reference this also
persists optimizer state and supports resume (SURVEY.md §5).

Run: ``python -m dia_tts_prune_tpu.finetune --model-path … --dataset-dir …
--output-dir … --adapter-mode lora``
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Fine-tune the TPU-native Dia model")
    p.add_argument("--model-path", type=str, required=True)
    p.add_argument("--dac-checkpoint", type=str, default=None)
    p.add_argument("--dataset-dir", type=str, required=True,
                   help="Directory containing metadata.csv and wavs/")
    p.add_argument("--output-dir", type=str, required=True)

    t = p.add_argument_group("Training")
    t.add_argument("--epochs", type=int, default=1)
    t.add_argument("--batch-size", type=int, default=2)
    t.add_argument("--learning-rate", type=float, default=1e-5)
    t.add_argument("--gradient-accumulation-steps", type=int, default=1)
    t.add_argument("--max-grad-norm", type=float, default=1.0)
    t.add_argument("--weight-decay", type=float, default=0.0)
    t.add_argument("--lr-scheduler-type", type=str, default="cosine",
                   choices=["linear", "cosine", "step", "constant"])
    t.add_argument("--warmup-steps", type=int, default=0)
    t.add_argument("--seed", type=int, default=42)
    t.add_argument("--compute-dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    t.add_argument("--loss-mode", type=str, default="delayed", choices=["delayed", "reference"])
    t.add_argument("--qat", type=str, default="none",
                   choices=["none", "int8", "int4", "int4_hybrid"],
                   help="Quantization-aware training: run the forward through "
                        "the serving quantizer (decoder-scope fake-quant, "
                        "straight-through gradients) so int8/int4 export is "
                        "near-lossless. Full fine-tune only.")
    t.add_argument("--no-remat", action="store_true")
    t.add_argument("--logging-steps", type=int, default=10)
    t.add_argument("--save-steps", type=int, default=200)
    t.add_argument("--resume-from", type=str, default=None,
                   help="checkpoint dir (or its parent) written by a previous run")

    a = p.add_argument_group("Adapters (LoRA)")
    a.add_argument("--adapter-mode", type=str, default="none", choices=["none", "lora"])
    a.add_argument("--merge-adapter", type=str, default=None,
                   help="merge a saved LoRA adapter dir (native save_adapter "
                        "format, or a torch-peft dir) into the base weights "
                        "before training starts.  The tested route from an "
                        "adapter to int4 serving: "
                        "--merge-adapter <dir> --qat int4 (QAT trains the "
                        "merged model against the serving quantizer's exact "
                        "numerics; QAT+LoRA directly is rejected — the fp "
                        "adapter over a fake-quant base would train against "
                        "different numerics than it serves)")
    a.add_argument("--lora-r", type=int, default=8)
    a.add_argument("--lora-alpha", type=float, default=16.0)
    a.add_argument("--lora-dropout", type=float, default=0.0)
    a.add_argument("--lora-target-modules", type=str, nargs="+",
                   default=["q_proj", "v_proj"])

    pr = p.add_argument_group("Pruning before fine-tuning")
    pr.add_argument("--prune-before", type=str, default=None,
                    choices=["unstructured", "structured"])
    pr.add_argument("--prune-amount", type=float, default=0.5)
    pr.add_argument("--prune-dim", type=int, default=0)

    m = p.add_argument_group("Parallelism")
    m.add_argument("--mesh-data", type=int, default=None)
    m.add_argument("--mesh-model", type=int, default=None)
    m.add_argument("--fsdp", action="store_true",
                   help="additionally shard parameter/optimizer storage over "
                        "the data axis (ZeRO-style; needed for full 1.6B "
                        "fine-tuning — fp32 AdamW state alone is ~12.8 GB)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import numpy as np

    from .api import Dia
    from .data import FineTuneDataset
    from .lora import LoraConfig, save_adapter
    from .train import TrainConfig, Trainer

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "training_args.json").write_text(json.dumps(vars(args), indent=2, default=str))

    dia = Dia.from_pretrained(args.model_path, compute_dtype=args.compute_dtype,
                              dac_checkpoint=args.dac_checkpoint)
    params, config = dia.params, dia.config

    if args.merge_adapter:
        from .lora import load_adapter, load_peft_adapter, lora_param_count, merge_lora

        apath = Path(args.merge_adapter)
        try:
            adapter = load_adapter(apath)
        except (FileNotFoundError, KeyError):
            adapter = load_peft_adapter(apath)
        params = merge_lora(params, adapter)
        print(f"Merged adapter {apath} into base weights "
              f"({lora_param_count(adapter)} adapter params)")

    if args.prune_before:
        from .prune import apply_masks, sparsity_report, structured_masks, unstructured_masks

        if args.prune_before == "unstructured":
            params = apply_masks(params, unstructured_masks(params, args.prune_amount))
        else:
            params = apply_masks(
                params, structured_masks(params, args.prune_amount, dim=args.prune_dim)
            )
        print(f"Pruned before fine-tuning: sparsity={sparsity_report(params)['sparsity']:.4f}")

    dia._require_dac()
    dataset = FineTuneDataset(
        Path(args.dataset_dir) / "metadata.csv", Path(args.dataset_dir) / "wavs",
        config, dia.dac_params, dia.dac_config, loss_mode=args.loss_mode,
    )
    steps_per_epoch = max(1, len(dataset) // args.batch_size)
    num_training_steps = args.epochs * steps_per_epoch

    tc = TrainConfig(
        learning_rate=args.learning_rate,
        epochs=args.epochs,
        batch_size=args.batch_size,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        max_grad_norm=args.max_grad_norm,
        lr_scheduler_type=args.lr_scheduler_type,
        warmup_steps=args.warmup_steps,
        weight_decay=args.weight_decay,
        adapter_mode=args.adapter_mode,
        lora=LoraConfig(r=args.lora_r, alpha=args.lora_alpha, dropout=args.lora_dropout,
                        target_modules=tuple(args.lora_target_modules)),
        loss_mode=args.loss_mode,
        qat_mode=args.qat,
        remat=not args.no_remat,
        compute_dtype=args.compute_dtype,
        seed=args.seed,
        logging_steps=args.logging_steps,
        save_steps=args.save_steps,
    )

    mesh = None
    if args.mesh_data or args.mesh_model:
        from .parallel.sharding import make_mesh, shard_params

        mesh = make_mesh(data=args.mesh_data, model=args.mesh_model)
        params = shard_params(params, mesh, config=config, fsdp=args.fsdp)
        print(f"Sharded params over mesh {dict(mesh.shape)}"
              + (" (FSDP storage)" if args.fsdp else ""))

    trainer = Trainer(params, config, tc, num_training_steps, mesh=mesh)
    if args.resume_from:
        step = trainer.restore(args.resume_from)
        print(f"Resumed from step {step} ({args.resume_from})")

    print(f"Fine-tuning: {len(dataset)} items, {num_training_steps} steps, "
          f"mode={args.adapter_mode}"
          + (f", qat={args.qat}" if args.qat != "none" else ""))
    from .utils.prefetch import prefetch

    t0 = time.time()
    window: list[float] = []
    for epoch in range(args.epochs):
        # prepare batches (WAV read + DAC encode + delay transforms) on a
        # background thread while the accelerator runs the train step
        for batch in prefetch(
            dataset.batches(args.batch_size, shuffle=True, seed=args.seed + epoch)
        ):
            metrics = trainer.step(batch)
            window.append(metrics["loss"])
            step = metrics["step"]
            if step % args.logging_steps == 0:
                print(f"step {step}/{num_training_steps} "
                      f"loss={np.mean(window):.4f} ({time.time() - t0:.1f}s)")
                window.clear()
            if args.save_steps > 0 and step % args.save_steps == 0:
                trainer.save(out / "checkpoints", step=step)

    # Final save (reference: finetune.py:588-621)
    config.save(out / "config.json")
    if args.adapter_mode == "lora":
        save_adapter(out / "adapter", trainer.adapter())
        print(f"Saved LoRA adapter to {out / 'adapter'}")
    final = trainer.trained_params()
    try:
        import torch

        from .checkpoint import to_torch_state_dict

        sd = {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v, np.float32)))
              for k, v in to_torch_state_dict(final, config).items()}
        torch.save(sd, out / "pytorch_model.bin")
        print(f"Saved fine-tuned model to {out / 'pytorch_model.bin'}")
    except ImportError:
        from safetensors.numpy import save_file

        from .checkpoint import to_torch_state_dict

        save_file({k: np.asarray(v, np.float32) for k, v in to_torch_state_dict(final, config).items()},
                  str(out / "model.safetensors"))
        print(f"Saved fine-tuned model to {out / 'model.safetensors'}")
    if dia.dac_params is not None:
        # keep the output dir self-contained, like api.save_pretrained: the
        # codec weights were needed to fine-tune, so the result should be
        # generable without hunting down the same DAC checkpoint again
        import json as _json
        from dataclasses import asdict

        from safetensors.numpy import save_file as _save_file

        from .api import _flatten_tree

        _save_file({k: np.ascontiguousarray(v)
                    for k, v in _flatten_tree(dia.dac_params).items()},
                   str(out / "dac.safetensors"))
        (out / "dac_config.json").write_text(
            _json.dumps(asdict(dia.dac_config), indent=2))
        print(f"Bundled DAC weights into {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
