"""Build the trained-weights test fixture (tests/fixtures/trained_small/).

Round-3 verdict, item 1: every quality gate previously ran on RANDOM weights —
the worst case for judging int8/int4/kv-int8 quantization, pruning quality,
and speculative acceptance.  This tool trains a small Dia model to convergent
loss using the COMPLETE in-repo pipeline the user would run:

    datagen.generate_dataset      (synthesize wavs + LJSpeech metadata;
                                   reference: generate_finetune_data.py)
    data.FineTuneDataset          (WAV -> DAC codes -> delayed batches;
                                   reference: finetune.py:59-228)
    train.Trainer                 (teacher-forced CE, AdamW, cosine schedule;
                                   reference: finetune.py:458-585)
    api.Dia.save_pretrained       (self-contained dir: model + codec weights)

then writes the fixture dir plus golden greedy tokens and a held training
batch, so tests and quality tools run on weights with *trained* structure.

Deterministic by construction: fixed seeds everywhere and CPU execution, so
the pinned golden tokens match the CPU test environment bit-for-bit.

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/make_trained_fixture.py
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

FIXTURE_DIR = REPO / "tests" / "fixtures" / "trained_small"
PROMPT = "[S1] The birch canoe slid on the smooth planks. [S2]"


def small_train_config():
    """~10M-param config: big enough that quantization/pruning error behaves
    like a real model (dense 256-wide contractions, GQA, 9 channels), small
    enough to train on CPU in minutes and check into git at fp16."""
    from dia_tts_prune_tpu.config import (
        DataConfig,
        DecoderConfig,
        DiaConfig,
        EncoderConfig,
        ModelConfig,
    )

    return DiaConfig(
        model=ModelConfig(
            encoder=EncoderConfig(n_layer=2, n_embd=128, n_hidden=512, n_head=4, head_dim=32),
            decoder=DecoderConfig(
                n_layer=4,
                n_embd=256,
                n_hidden=1024,
                gqa_query_heads=4,
                kv_heads=2,
                gqa_head_dim=64,
                cross_query_heads=4,
                cross_head_dim=64,
            ),
            src_vocab_size=256,
            tgt_vocab_size=1028,
            weight_dtype="float32",
        ),
        data=DataConfig(text_length=128, audio_length=256),
    )


def deep_train_config():
    """Reference-shaped DEPTH at trainable width (round-5 verdict, item 2):
    18 decoder layers — matching Dia-1.6B's decoder depth exactly — at 256d
    (~25M params, ~50 MB fp16 in git).  Quantization error compounds per
    layer and layer-skip speculative drafts discard a fixed FRACTION of
    depth, so quant quality and acceptance α measured on the 4-layer fixture
    extrapolate with unknown sign; this config pins the depth-dependent
    numbers."""
    from dia_tts_prune_tpu.config import (
        DataConfig,
        DecoderConfig,
        DiaConfig,
        EncoderConfig,
        ModelConfig,
    )

    return DiaConfig(
        model=ModelConfig(
            encoder=EncoderConfig(n_layer=6, n_embd=256, n_hidden=1024, n_head=4, head_dim=64),
            decoder=DecoderConfig(
                n_layer=18,
                n_embd=256,
                n_hidden=1024,
                gqa_query_heads=4,
                kv_heads=2,
                gqa_head_dim=64,
                cross_query_heads=4,
                cross_head_dim=64,
            ),
            src_vocab_size=256,
            tgt_vocab_size=1028,
            weight_dtype="float32",
        ),
        data=DataConfig(text_length=128, audio_length=256),
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--preset", type=str, default="small", choices=["small", "deep"],
                   help="small = 10M/4-dec-layer (fast gates); deep = 25M/"
                        "18-dec-layer, reference decoder depth (quant + "
                        "speculative quality whose depth-dependence matches "
                        "Dia-1.6B)")
    p.add_argument("--num-samples", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--max-steps", type=int, default=2000)
    p.add_argument("--target-loss", type=float, default=0.25)
    p.add_argument("--learning-rate", type=float, default=5e-4)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    if args.out is None:
        args.out = str(FIXTURE_DIR.with_name(
            "trained_small" if args.preset == "small" else "trained_deep"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.devices()[0].platform == "cpu", (
        "Run on CPU (PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu): the golden "
        "tokens must match the CPU test environment."
    )

    from dia_tts_prune_tpu.api import Dia
    from dia_tts_prune_tpu.data import FineTuneDataset
    from dia_tts_prune_tpu.datagen import generate_dataset
    from dia_tts_prune_tpu.models.dac import DACConfig, init_dac_params
    from dia_tts_prune_tpu.train import TrainConfig, Trainer

    config = small_train_config() if args.preset == "small" else deep_train_config()
    n_params_model = None

    # --- 1. base model + small codec ----------------------------------
    dia = Dia.random_init(config, seed=args.seed)
    dia.dac_config = DACConfig(
        encoder_dim=8, encoder_rates=(2, 4), decoder_dim=32, decoder_rates=(4, 2),
        n_codebooks=9, codebook_size=1024, codebook_dim=4,
    )
    dia.dac_params = init_dac_params(dia.dac_config, jax.random.PRNGKey(args.seed + 1))
    n_params_model = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(dia.params))
    print(f"model params: {n_params_model/1e6:.1f}M")

    # --- 2. synthesize the dataset with the in-repo datagen pipeline ---
    data_dir = Path(tempfile.mkdtemp(prefix="dia_fixture_data_"))
    t0 = time.time()
    rows = generate_dataset(
        dia, data_dir, num_samples=args.num_samples, seed=args.seed + 100,
        min_len_sec=0.0,  # small model; keep every prompt grouping
    )
    print(f"datagen: {len(rows)} samples in {time.time()-t0:.0f}s -> {data_dir}")
    if len(rows) < args.batch_size:
        raise SystemExit("datagen produced too few samples")

    # --- 3. train to convergence ---------------------------------------
    dataset = FineTuneDataset(
        data_dir / "metadata.csv", data_dir / "wavs", config,
        dia.dac_params, dia.dac_config,
    )
    steps_per_epoch = max(1, len(dataset) // args.batch_size)
    tc = TrainConfig(
        learning_rate=args.learning_rate,
        lr_scheduler_type="cosine",
        warmup_steps=20,
        max_grad_norm=1.0,
        batch_size=args.batch_size,
        remat=False,
        compute_dtype="float32",
        seed=args.seed,
    )
    trainer = Trainer(dia.params, config, tc, num_training_steps=args.max_steps)

    t0 = time.time()
    held_batch = None
    loss = float("inf")
    window: list[float] = []
    epoch = 0
    while trainer.global_step < args.max_steps:
        for batch in dataset.batches(args.batch_size, shuffle=True,
                                     seed=args.seed + epoch, drop_last=True):
            if held_batch is None:
                held_batch = {k: np.asarray(v) for k, v in batch.items()}
            m = trainer.step(batch)
            window.append(m["loss"])
            if m["step"] % 50 == 0:
                loss = float(np.mean(window[-steps_per_epoch:]))
                print(f"step {m['step']}  loss={loss:.4f}  "
                      f"({(time.time()-t0)/m['step']*1000:.0f} ms/step)")
            if trainer.global_step >= args.max_steps:
                break
        epoch += 1
        loss = float(np.mean(window[-steps_per_epoch:]))
        if loss < args.target_loss:
            break
    print(f"trained: step={trainer.global_step} loss={loss:.4f} "
          f"in {time.time()-t0:.0f}s")

    # --- 4. write the fixture dir (fp16 weights, self-contained) -------
    out = Path(args.out)
    if out.exists():
        shutil.rmtree(out)
    trained = trainer.trained_params()
    dia_fp16 = Dia(config, jax.tree.map(lambda a: jnp.asarray(a, jnp.float16), trained),
                   "float32", dac_params=dia.dac_params, dac_config=dia.dac_config)
    dia_fp16.save_pretrained(out)

    # --- 5. golden tokens from the RELOADED fixture (what tests will see)
    reloaded = Dia.from_pretrained(str(out))
    golden = reloaded.generate_codes(PROMPT, temperature=0.0, seed=args.seed)
    assert golden.shape[0] > 0, "greedy generation from trained weights is empty"
    wav = reloaded.generate(PROMPT, temperature=0.0, seed=args.seed)

    from dia_tts_prune_tpu.train import compute_loss

    final_loss = float(compute_loss(
        reloaded.params, config, {k: jnp.asarray(v) for k, v in held_batch.items()}))
    np.savez_compressed(
        out / "golden.npz",
        tokens=golden.astype(np.int32),
        wav_sha_len=np.int64(wav.shape[0]),
        wav_head=wav[:256].astype(np.float32),
        **{f"batch_{k}": v for k, v in held_batch.items()},
    )
    meta = {
        "prompt": PROMPT,
        "preset": args.preset,
        "seed": args.seed,
        "train_steps": trainer.global_step,
        "train_loss_window": round(loss, 4),
        "heldout_batch_loss_fp16_roundtrip": round(final_loss, 4),
        "model_params_millions": round(n_params_model / 1e6, 2),
        "golden_tokens_shape": list(golden.shape),
        "tool": "tools/make_trained_fixture.py",
    }
    (out / "FIXTURE.json").write_text(json.dumps(meta, indent=2))
    size_mb = sum(f.stat().st_size for f in out.iterdir()) / 1e6
    print(json.dumps(meta, indent=2))
    print(f"fixture written to {out} ({size_mb:.1f} MB)")
    shutil.rmtree(data_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
