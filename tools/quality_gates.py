"""Run EVERY quality gate on trained weights (round-3 verdict, item 1).

Gates previously ran on random weights — the builder-fixable worst case.
This tool loads a trained save_pretrained dir (default: the in-repo fixture
trained by tools/make_trained_fixture.py) and reports, as JSON:

* int8 / int4 / hybrid quantization quality (greedy trajectory agreement +
  on-distribution teacher-forced argmax agreement)  — tools/int8_quality.py
* int8 KV-cache quality (same int8 weights, cache on/off)
* pruning quality at 0.3/0.5/0.7 unstructured + 0.5 block sparsity:
  held-batch teacher-forced CE delta and greedy-token agreement
  (reference quality guidance: /root/reference/README.md:366-367 recommends
  50-70% sparsity and listening evaluation; this is the measurable proxy)
* speculative decoding acceptance alpha (layer-skip draft) at several draft
  depths — the number that decides whether speculation pays off
  (speedup model: tools/spec_cost.py)

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/quality_gates.py
      (or on TPU with a real checkpoint dir via --model-dir)
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

DEFAULT_DIR = REPO / "tests" / "fixtures" / "trained_small"


def prune_gate(params, config, held_batch, text: str, seed: int,
               base_tokens, amounts=(0.3, 0.5, 0.7)) -> list[dict]:
    import jax.numpy as jnp
    import numpy as np

    from dia_tts_prune_tpu.generate import DiaGenerator
    from dia_tts_prune_tpu.prune import apply_masks, block_masks, unstructured_masks
    from dia_tts_prune_tpu.train import compute_loss

    batch = {k: jnp.asarray(v) for k, v in held_batch.items()}
    base_loss = float(compute_loss(params, config, batch))
    max_tokens = base_tokens.shape[0] + config.data.max_delay + 2
    results = [{"mode": "dense", "amount": 0.0, "heldout_ce": round(base_loss, 4)}]

    def eval_pruned(pruned, mode, amount):
        loss = float(compute_loss(pruned, config, batch))
        gen = DiaGenerator(pruned, config, "float32")
        toks = np.asarray(gen.generate_tokens(text, max_tokens=max_tokens,
                                              temperature=0.0, seed=seed))
        n = min(len(toks), len(base_tokens))
        agree = float((toks[:n] == base_tokens[:n]).mean()) if n else float("nan")
        results.append({
            "mode": mode, "amount": amount,
            "heldout_ce": round(loss, 4),
            "heldout_ce_delta": round(loss - base_loss, 4),
            "greedy_token_agreement_vs_dense": round(agree, 4),
            "generated_len": int(len(toks)),
        })

    for amount in amounts:
        eval_pruned(apply_masks(params, unstructured_masks(params, amount)),
                    "unstructured", amount)
    eval_pruned(apply_masks(params, block_masks(params, 0.5, block=(64, 64))),
                "block64", 0.5)
    return results


def spec_gate(params, config, text: str, seed: int, draft_depths=(1, 2),
              window: int = 8, max_tokens: int | None = None) -> list[dict]:
    import numpy as np

    from dia_tts_prune_tpu.generate import DiaGenerator
    from dia_tts_prune_tpu.speculative import SpeculativeGenerator

    if max_tokens is None:
        max_tokens = config.data.audio_length - 16
    base = np.asarray(DiaGenerator(params, config, "float32").generate_tokens(
        text, max_tokens=max_tokens, temperature=0.0, seed=seed))
    out = []
    n_layers = config.model.decoder.n_layer
    for depth in draft_depths:
        gen = SpeculativeGenerator(params, config, "float32",
                                   n_draft_layers=depth, window=window)
        toks = np.asarray(gen.generate_tokens(text, max_tokens=max_tokens,
                                              temperature=0.0, seed=seed))
        exact = (toks.shape == base.shape) and bool((toks == base).all())
        st = gen.stats
        windows = st["windows"]  # one full-model verify pass per window
        out.append({
            "draft_layers": depth, "of_layers": n_layers, "window": window,
            "alpha_acceptance": round(gen.acceptance_rate, 4),
            "accepted_drafts": st["accepted_drafts"], "drafted": st["drafted"],
            "tokens_per_verify_pass": round(st["tokens"] / windows, 2) if windows else None,
            "greedy_token_exact_vs_baseline": exact,
        })
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model-dir", type=str, default=str(DEFAULT_DIR))
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gates", type=str, nargs="+",
                   default=["int8", "int4", "hybrid", "kv", "prune", "spec"])
    args = p.parse_args(argv)

    import numpy as np

    from dia_tts_prune_tpu.api import Dia

    sys.path.insert(0, str(REPO / "tools"))
    from int8_quality import compare, compare_kv_int8

    model_dir = Path(args.model_dir)
    golden = np.load(model_dir / "golden.npz")
    meta = json.loads((model_dir / "FIXTURE.json").read_text())
    text = meta["prompt"]
    held_batch = {k[len("batch_"):]: golden[k] for k in golden.files
                  if k.startswith("batch_")}
    label = f"trained:{model_dir.name}"

    report = {"model_dir": str(model_dir), "weights": label,
              "train_loss": meta.get("train_loss_window")}

    quant_dia = Dia.from_pretrained(str(model_dir), compute_dtype="bfloat16")
    for mode in ("int8", "int4", "hybrid"):
        if mode in args.gates:
            report[mode] = compare(quant_dia.params, quant_dia.config,
                                   steps=args.steps, seed=args.seed, text=text,
                                   weights_label=label, mode=mode)
            print(json.dumps(report[mode]))
    if "kv" in args.gates:
        report["kv_int8"] = compare_kv_int8(quant_dia.params, quant_dia.config,
                                            steps=args.steps, seed=args.seed,
                                            text=text, weights_label=label)
        print(json.dumps(report["kv_int8"]))
    del quant_dia

    dia = Dia.from_pretrained(str(model_dir), compute_dtype="float32")
    if "prune" in args.gates:
        report["prune"] = prune_gate(dia.params, dia.config, held_batch, text,
                                     args.seed, golden["tokens"])
        for r in report["prune"]:
            print(json.dumps(r))
    if "spec" in args.gates:
        # draft depths scale with decoder depth: 2/4/6-of-18 for the deep
        # fixture (the regime layer-skip drafts actually run in at 1.6B);
        # 1/2-of-4 for the small one
        n_layer = dia.config.model.decoder.n_layer
        depths = tuple(d for d in ((2, 4, 6) if n_layer >= 12 else (1, 2))
                       if d < n_layer)
        report["spec"] = spec_gate(dia.params, dia.config, text, args.seed,
                                   draft_depths=depths)
        for r in report["spec"]:
            print(json.dumps(r))

    out_path = model_dir / "QUALITY.json"
    out_path.write_text(json.dumps(report, indent=2))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
