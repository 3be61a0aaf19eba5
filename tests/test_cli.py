"""CLI tests: drive `python -m dia_tts_prune_tpu.cli` end-to-end against a
local tiny checkpoint + tiny DAC checkpoint; flag validation; offline_prune
and finetune CLIs."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from dia_tts_prune_tpu.api import Dia  # noqa: E402
from dia_tts_prune_tpu.checkpoint import to_torch_state_dict  # noqa: E402
from dia_tts_prune_tpu.config import tiny_test_config  # noqa: E402
from dia_tts_prune_tpu.models.dac import (  # noqa: E402
    DACConfig,
    init_dac_params,
    to_dac_torch_state_dict,
)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    """A local model dir in reference layout + a torch DAC checkpoint."""
    d = tmp_path_factory.mktemp("model")
    cfg = tiny_test_config()
    dia = Dia.random_init(cfg, seed=0)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
          to_torch_state_dict(dia.params, cfg).items()}
    torch.save(sd, d / "pytorch_model.bin")
    cfg.save(d / "config.json")

    dac_cfg = DACConfig(encoder_dim=8, encoder_rates=(2, 4), decoder_dim=32,
                        decoder_rates=(4, 2), n_codebooks=9, codebook_size=1024,
                        codebook_dim=4)
    dac_params = init_dac_params(dac_cfg, jax.random.PRNGKey(1))
    dac_sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
              to_dac_torch_state_dict(dac_params, dac_cfg).items()}
    torch.save({"state_dict": dac_sd}, d / "dac.pth")
    return d, dac_cfg


def _patch_dac_config(monkeypatch, dac_cfg):
    # the CLI constructs Dia with the default 44.1kHz DACConfig; point it at
    # the tiny one for the test checkpoint
    import dia_tts_prune_tpu.api as api_mod

    monkeypatch.setattr(api_mod, "DACConfig", lambda: dac_cfg)


def test_cli_generate(model_dir, tmp_path, monkeypatch):
    from dia_tts_prune_tpu.cli import main

    d, dac_cfg = model_dir
    _patch_dac_config(monkeypatch, dac_cfg)
    out = tmp_path / "out.wav"
    rc = main([
        "[S1] CLI end to end.", "--output", str(out),
        "--model-path", str(d), "--dac-checkpoint", str(d / "dac.pth"),
        "--temperature", "0.0", "--max-tokens", "48",
        "--compute-dtype", "float32", "--verbose",
    ])
    assert rc == 0
    assert out.exists() and out.stat().st_size > 44


def test_cli_pruned_checkpoint_path(model_dir, tmp_path, monkeypatch):
    from dia_tts_prune_tpu.cli import main

    d, dac_cfg = model_dir
    _patch_dac_config(monkeypatch, dac_cfg)
    out = tmp_path / "pruned.wav"
    rc = main([
        "[S1] pruned path.", "--output", str(out),
        "--model-path", str(d),
        "--config", str(d / "config.json"),
        "--pruned-checkpoint", str(d / "pytorch_model.bin"),
        "--dac-checkpoint", str(d / "dac.pth"),
        "--temperature", "0.0", "--max-tokens", "40", "--compute-dtype", "float32",
    ])
    assert rc == 0 and out.exists()


def test_cli_requires_prompt_text(model_dir):
    from dia_tts_prune_tpu.cli import main

    d, _ = model_dir
    with pytest.raises(SystemExit):
        main(["x", "--output", "o.wav", "--model-path", str(d),
              "--audio-prompt", "p.wav"])


def test_cli_missing_model_errors(tmp_path):
    from dia_tts_prune_tpu.cli import main

    rc = main(["x", "--output", str(tmp_path / "o.wav"),
               "--model-path", str(tmp_path / "nope")])
    assert rc == 1


def test_offline_prune_cli(model_dir, tmp_path):
    from dia_tts_prune_tpu.offline_prune import main

    d, _ = model_dir
    out = tmp_path / "pruned_model"
    rc = main([
        "--model-path", str(d), "--output-dir", str(out),
        "--prune-mode", "unstructured", "--prune-amount", "0.5",
    ])
    assert rc == 0
    assert (out / "config.json").exists()
    assert (out / "pytorch_model.bin").exists()
    import json

    report = json.loads((out / "prune_report.json").read_text())
    assert abs(report["sparsity"] - 0.5) < 0.01

    # the pruned artifact loads back through the same CLI-visible path
    dia = Dia.from_local(out / "config.json", out / "pytorch_model.bin")
    codes = dia.generate_codes("[S1] check", max_tokens=32, temperature=0.0)
    assert codes.shape[0] > 0


def test_offline_prune_rejects_bad_amount(model_dir, tmp_path):
    from dia_tts_prune_tpu.offline_prune import main

    d, _ = model_dir
    with pytest.raises(SystemExit):
        main(["--model-path", str(d), "--output-dir", str(tmp_path / "x"),
              "--prune-mode", "unstructured", "--prune-amount", "1.5"])


def test_finetune_cli_smoke(model_dir, tmp_path, monkeypatch):
    """Tiny end-to-end fine-tune through the CLI: datagen → finetune → artifacts."""
    from dia_tts_prune_tpu.datagen import generate_dataset
    from dia_tts_prune_tpu.finetune import main

    d, dac_cfg = model_dir
    _patch_dac_config(monkeypatch, dac_cfg)

    # build a 3-sample dataset with the tiny model itself
    dia = Dia.from_pretrained(str(d), dac_checkpoint=str(d / "dac.pth"))
    dia.dac_config = dac_cfg
    dia.load_dac(d / "dac.pth")
    generate_dataset(dia, tmp_path / "data", num_samples=3, min_len_sec=0,
                     max_len_sec=6, temperature=0.0, max_tokens=48)

    out = tmp_path / "ft"
    rc = main([
        "--model-path", str(d), "--dac-checkpoint", str(d / "dac.pth"),
        "--dataset-dir", str(tmp_path / "data"), "--output-dir", str(out),
        "--epochs", "1", "--batch-size", "2", "--learning-rate", "1e-4",
        "--adapter-mode", "lora", "--lora-r", "2", "--compute-dtype", "float32",
        "--no-remat", "--save-steps", "0", "--logging-steps", "1",
    ])
    assert rc == 0
    assert (out / "adapter" / "adapter_weights.npz").exists()
    assert (out / "pytorch_model.bin").exists()
    assert (out / "training_args.json").exists()


def test_finetune_lora_merge_qat_int4_serving(model_dir, tmp_path, monkeypatch):
    """The tested route from an adapter to int4 serving (round-5 task 5):
    lora-train → merge (--merge-adapter) → QAT int4 fine-tune → quantized
    serving.  Asserts the chain runs through the user-facing CLIs, the QAT
    output loses ~nothing when quantized to the serving format (loss gap vs
    its own fp forward stays small — QAT trains against the serving
    quantizer's exact numerics), and int4 serving generates valid tokens."""
    import jax.numpy as jnp

    from dia_tts_prune_tpu.datagen import generate_dataset
    from dia_tts_prune_tpu.finetune import main
    from dia_tts_prune_tpu.train import build_train_batch, compute_loss

    d, dac_cfg = model_dir
    _patch_dac_config(monkeypatch, dac_cfg)

    dia = Dia.from_pretrained(str(d), dac_checkpoint=str(d / "dac.pth"))
    dia.dac_config = dac_cfg
    dia.load_dac(d / "dac.pth")
    generate_dataset(dia, tmp_path / "data", num_samples=3, min_len_sec=0,
                     max_len_sec=6, temperature=0.0, max_tokens=48)

    # 1. adapter training (the reference's primary adaptation mode)
    ft = tmp_path / "ft_lora"
    rc = main([
        "--model-path", str(d), "--dac-checkpoint", str(d / "dac.pth"),
        "--dataset-dir", str(tmp_path / "data"), "--output-dir", str(ft),
        "--epochs", "1", "--batch-size", "2", "--learning-rate", "1e-4",
        "--adapter-mode", "lora", "--lora-r", "2", "--compute-dtype", "float32",
        "--no-remat", "--save-steps", "0", "--logging-steps", "1",
    ])
    assert rc == 0 and (ft / "adapter" / "adapter_weights.npz").exists()

    # 2. merge that adapter into the BASE checkpoint and QAT-finetune int4
    qat_out = tmp_path / "ft_qat"
    rc = main([
        "--model-path", str(d), "--dac-checkpoint", str(d / "dac.pth"),
        "--merge-adapter", str(ft / "adapter"),
        "--dataset-dir", str(tmp_path / "data"), "--output-dir", str(qat_out),
        "--qat", "int4", "--epochs", "2", "--batch-size", "2",
        "--learning-rate", "3e-4", "--compute-dtype", "float32",
        "--no-remat", "--save-steps", "0", "--logging-steps", "1",
    ])
    assert rc == 0 and (qat_out / "pytorch_model.bin").exists()

    # 3. int4 serving from the QAT artifact
    served = Dia.from_local(qat_out / "config.json", qat_out / "pytorch_model.bin",
                            compute_dtype="float32")
    cfg = served.config
    fp_params = served.params
    served.quantize_int4()
    codes = served.generate_codes("[S1] adapter to int4", max_tokens=32,
                                  temperature=0.0)
    assert codes.shape[0] > 0
    assert codes.min() >= 0 and codes.max() <= 1023

    # 4. the QAT model's int4 loss tracks its fp loss (the whole point of
    # training against the serving quantizer's numerics); threshold is loose
    # for a tiny run but rejects the raw post-hoc-quantized regime, where the
    # gap is multiples of the fp loss (QUALITY.json int4 at 10M: 54% argmax
    # agreement)
    rng = np.random.default_rng(0)
    text = rng.integers(1, 200, (2, cfg.data.text_length)).astype(np.int32)
    text[:, 40:] = 0
    targets = [rng.integers(0, 1024, (48, 9)).astype(np.int32) for _ in range(2)]
    batch = {k: jnp.asarray(v)
             for k, v in build_train_batch(cfg, text, targets).items()}
    fp_loss = float(compute_loss(fp_params, cfg, batch))
    q_loss = float(compute_loss(fp_params, cfg, batch, qat_mode="int4"))
    assert q_loss < fp_loss * 1.5 + 0.5, (fp_loss, q_loss)


def test_app_tp_continuous_batch_wiring(model_dir, monkeypatch):
    """`app.py --continuous-batch --tp 2` shards params onto a 2-chip mesh
    and serves through a mesh-aware ContinuousBatcher (serve_http stubbed to
    drive one request and return)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 (virtual) devices")
    d, dac_cfg = model_dir
    _patch_dac_config(monkeypatch, dac_cfg)
    import dia_tts_prune_tpu.app as app_mod

    captured = {}

    def fake_serve(dia, host, port, batcher=None):
        captured["batcher"] = batcher
        captured["wav"] = batcher.generate("[S1] tp serve", max_tokens=48,
                                           temperature=0.0, seed=0)

    monkeypatch.setattr(app_mod, "serve_http", fake_serve)
    rc = app_mod.main(["--model-path", str(d), "--dac-checkpoint",
                       str(d / "dac.pth"), "--compute-dtype", "float32",
                       "--continuous-batch", "--tp", "2", "--cb-slots", "2",
                       "--cb-max-tokens", "48", "--no-gradio",
                       "--quantize-int8"])  # shard bf16 THEN quantize under mesh
    assert rc == 0
    b = captured["batcher"]
    try:
        assert type(b).__name__ == "ContinuousBatcher"
        assert b._mesh is not None and b._mesh.shape["model"] == 2
        assert captured["wav"] is not None and captured["wav"].size > 0
    finally:
        b.shutdown()

    with pytest.raises(SystemExit):  # --tp without --continuous-batch
        app_mod.main(["--model-path", str(d), "--tp", "2", "--no-gradio"])
