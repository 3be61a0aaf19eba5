"""Recover int4 serving quality with QAT on the trained fixture.

The round-4 quality gates (tools/quality_gates.py) measured post-hoc int4
quantization at 54% teacher-forced argmax agreement on trained weights —
"NOT serving-quality without QAT" (docs/PERF.md).  This tool runs that QAT:
it QAT-finetunes the fixture (straight-through fake-quant through the exact
serving quantizer — train.TrainConfig(qat_mode=...), the capability the
reference stack would reach via torch.ao QAT) on its own regenerated
dataset, then re-measures the same gate.

A CONTROL arm (plain fine-tune, same steps/lr/data, qat_mode="none") runs
first: QAT trains extra steps, so every number is reported against the
control, not the frozen fixture — otherwise "more training" masquerades as
"QAT won".

Reported per mode (int4 / int4_hybrid):
* the serving gate: held-batch CE UNDER quantization and pad-masked
  teacher-forced argmax agreement of the QUANTIZED model vs the ORIGINAL
  fixture fp model — for QAT weights vs control weights.  (This is the
  deployment question: serve int4(QAT) instead of bf16(original).)
* fp-vs-quant self-consistency (tools/int8_quality.py compare, the
  QUALITY.json method) — reported for completeness; post-QAT it is the
  WRONG headline lens: STE makes the quantized forward the trained model,
  the fp weights are latent parameters, so fp/quant agreement needn't rise.
* drift: CE and agreement of the QAT fp model vs the original (QAT must
  not trade the model away).

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/qat_recover.py
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

DEFAULT_DIR = REPO / "tests" / "fixtures" / "trained_small"


def regen_dataset(seed: int, preset: str = "small"):
    """Recreate the fixture's training dataset: datagen ran on the RANDOM
    init model (tools/make_trained_fixture.py step 1-2), which is fully
    deterministic from the config + seeds on CPU."""
    from dia_tts_prune_tpu.api import Dia
    from dia_tts_prune_tpu.datagen import generate_dataset
    from dia_tts_prune_tpu.models.dac import DACConfig, init_dac_params

    sys.path.insert(0, str(REPO / "tools"))
    from make_trained_fixture import deep_train_config, small_train_config

    import jax

    config = small_train_config() if preset == "small" else deep_train_config()
    dia = Dia.random_init(config, seed=seed)
    dia.dac_config = DACConfig(
        encoder_dim=8, encoder_rates=(2, 4), decoder_dim=32, decoder_rates=(4, 2),
        n_codebooks=9, codebook_size=1024, codebook_dim=4,
    )
    dia.dac_params = init_dac_params(dia.dac_config, jax.random.PRNGKey(seed + 1))
    data_dir = Path(tempfile.mkdtemp(prefix="dia_qat_data_"))
    rows = generate_dataset(dia, data_dir, num_samples=16, seed=seed + 100,
                            min_len_sec=0.0)
    return config, data_dir, len(rows)


def teacher_forced_agreement(params_a, params_b, config, batch) -> float:
    """Argmax agreement of two param sets on the same teacher-forced batch."""
    import jax.numpy as jnp
    import numpy as np

    from dia_tts_prune_tpu.models.dia import decoder_forward, encoder_forward
    from dia_tts_prune_tpu.ops.masks import create_attn_mask
    from dia_tts_prune_tpu.state import cross_attention_mask

    d = config.data
    text_ids = jnp.asarray(batch["text_ids"])
    B, T_text = text_ids.shape
    enc_padding = text_ids != d.text_pad_value
    enc_mask = create_attn_mask(enc_padding, enc_padding, is_causal=False)
    positions = jnp.broadcast_to(jnp.arange(T_text, dtype=jnp.int32)[None], (B, T_text))
    dec_in = jnp.asarray(batch["decoder_input_ids"])
    T = dec_in.shape[1]
    dec_positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))

    def logits_of(p):
        enc_out = encoder_forward(p, config, text_ids, positions, enc_mask, jnp.float32)
        return decoder_forward(p, config, dec_in, enc_out, positions, dec_positions,
                               None, cross_attention_mask(enc_padding), jnp.float32,
                               enc_padding_mask=enc_padding)

    am_a = np.asarray(jnp.argmax(logits_of(params_a), axis=-1))
    am_b = np.asarray(jnp.argmax(logits_of(params_b), axis=-1))
    mask = np.asarray(batch["target_ids"]) != d.audio_pad_value
    return float((am_a == am_b)[mask].mean())


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model-dir", type=str, default=str(DEFAULT_DIR))
    p.add_argument("--modes", type=str, nargs="+", default=["int4", "int4_hybrid"])
    p.add_argument("--steps", type=int, default=150)
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--gate-steps", type=int, default=200,
                   help="on-distribution rows for the int8_quality gate")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from dia_tts_prune_tpu.api import Dia
    from dia_tts_prune_tpu.data import FineTuneDataset
    from dia_tts_prune_tpu.train import TrainConfig, Trainer, compute_loss

    sys.path.insert(0, str(REPO / "tools"))
    from int8_quality import compare

    model_dir = Path(args.model_dir)
    golden = np.load(model_dir / "golden.npz")
    meta = json.loads((model_dir / "FIXTURE.json").read_text())
    held = {k[len("batch_"):]: golden[k] for k in golden.files if k.startswith("batch_")}
    jheld = {k: jnp.asarray(v) for k, v in held.items()}

    dia = Dia.from_pretrained(str(model_dir), compute_dtype="float32")
    config, params0 = dia.config, dia.params

    print("regenerating the fixture's dataset …", flush=True)
    t0 = time.time()
    _, data_dir, n_rows = regen_dataset(meta["seed"], meta.get("preset", "small"))
    print(f"datagen: {n_rows} rows in {time.time()-t0:.0f}s")
    dia._require_dac()
    dataset = FineTuneDataset(data_dir / "metadata.csv", data_dir / "wavs", config,
                              dia.dac_params, dia.dac_config)

    from dia_tts_prune_tpu.ops.quant import fake_quant_params_ste

    def finetune(mode):
        label = "control (qat=none)" if mode == "none" else f"QAT {mode}"
        print(f"\n=== finetune: {label} ===", flush=True)
        tc = TrainConfig(learning_rate=args.learning_rate, lr_scheduler_type="cosine",
                         warmup_steps=10, batch_size=args.batch_size, remat=False,
                         compute_dtype="float32", seed=args.seed, qat_mode=mode)
        trainer = Trainer(params0, config, tc, num_training_steps=args.steps)
        t0, epoch = time.time(), 0
        while trainer.global_step < args.steps:
            for batch in dataset.batches(args.batch_size, shuffle=True,
                                         seed=args.seed + epoch, drop_last=True):
                m = trainer.step(batch)
                if m["step"] % 50 == 0:
                    print(f"  step {m['step']}  loss={m['loss']:.4f}", flush=True)
                if trainer.global_step >= args.steps:
                    break
            epoch += 1
        print(f"  trained {trainer.global_step} steps in {time.time()-t0:.0f}s")
        return trainer.trained_params()

    def serving_gate(p, mode):
        """CE + agreement of the QUANTIZED model (fake-quant value == packed
        serving numerics) against the ORIGINAL fixture fp model."""
        quant_view = fake_quant_params_ste(p, mode)
        return {
            "ce_under_quant": round(float(
                compute_loss(p, config, jheld, qat_mode=mode)), 4),
            "ce_fp": round(float(compute_loss(p, config, jheld)), 4),
            "tf_agreement_quant_vs_original_fp": round(
                teacher_forced_agreement(quant_view, params0, config, held), 4),
        }

    gate_mode = {"int4": "int4", "int4_hybrid": "hybrid"}
    report = {"model_dir": str(model_dir), "steps": args.steps,
              "learning_rate": args.learning_rate,
              "heldout_ce_fp_fixture": round(float(compute_loss(params0, config, jheld)), 4)}

    control = finetune("none")
    report["control"] = {m: serving_gate(control, m) for m in args.modes}
    print(json.dumps({"control": report["control"]}))

    for mode in args.modes:
        qat_params = finetune(mode)
        report[mode] = {
            "qat": serving_gate(qat_params, mode),
            "drift_tf_agreement_qatfp_vs_original": round(
                teacher_forced_agreement(qat_params, params0, config, held), 4),
            "self_consistency_compare": compare(
                qat_params, config, steps=args.gate_steps, seed=args.seed,
                text=meta["prompt"], weights_label=f"fixture:QAT-{mode}",
                mode=gate_mode[mode]),
        }
        print(json.dumps(report[mode]))

    out = model_dir / "QAT.json"
    out.write_text(json.dumps(report, indent=2))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
