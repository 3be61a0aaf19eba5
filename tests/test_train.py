"""Training tests: batch construction semantics, loss masking, full + LoRA
train steps (loss decreases), schedules, grad accumulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dia_tts_prune_tpu.config import tiny_test_config
from dia_tts_prune_tpu.lora import LoraConfig
from dia_tts_prune_tpu.models.dia import init_params
from dia_tts_prune_tpu.train import (
    TrainConfig,
    Trainer,
    build_train_batch,
    compute_loss,
    make_optimizer,
    make_schedule,
)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B = 2
    text = rng.integers(1, 200, (B, cfg.data.text_length)).astype(np.int32)
    text[:, 60:] = 0
    codes = [rng.integers(0, 1024, (80, 9)).astype(np.int32) for _ in range(B)]
    batch = build_train_batch(cfg, text, codes)
    return cfg, params, batch


def test_batch_construction(setup):
    cfg, _, batch = setup
    d = cfg.data
    T, C = d.audio_length, d.channels
    assert batch["decoder_input_ids"].shape == (2, T, C)
    assert batch["target_ids"].shape == (2, T, C)
    # first decoder input row is all BOS (delay of BOS row + negative t → BOS)
    assert (batch["decoder_input_ids"][:, 0] == d.audio_bos_value).all()
    # targets: channel 0 is undelayed audio; delayed channels start with BOS
    assert (batch["target_ids"][:, 0, 1:] == d.audio_bos_value).all()


def test_delayed_targets_are_shifted_inputs(setup):
    """target[t] must equal decoder_input[t+1] (next-token of the delayed
    stream) wherever the input is real audio."""
    cfg, _, batch = setup
    d = cfg.data
    inp = batch["decoder_input_ids"]
    tgt = batch["target_ids"]
    # within the first 40 frames everything is valid audio
    np.testing.assert_array_equal(tgt[:, :40], inp[:, 1:41])


def test_reference_loss_mode(setup):
    cfg, _, _ = setup
    rng = np.random.default_rng(1)
    text = rng.integers(1, 200, (1, cfg.data.text_length)).astype(np.int32)
    codes = [rng.integers(0, 1024, (50, 9)).astype(np.int32)]
    ref_batch = build_train_batch(cfg, text, codes, loss_mode="reference")
    # reference mode: targets are the raw (undelayed) audio codes
    np.testing.assert_array_equal(ref_batch["target_ids"][0, :50], codes[0])


def test_loss_finite_and_pad_masked(setup):
    cfg, params, batch = setup
    loss = compute_loss(params, cfg, {k: jnp.asarray(v) for k, v in batch.items()})
    assert np.isfinite(float(loss))
    # all-pad targets → loss exactly 0 (mask denominator guard)
    empty = dict(batch)
    empty["target_ids"] = np.full_like(batch["target_ids"], cfg.data.audio_pad_value)
    loss0 = compute_loss(params, cfg, {k: jnp.asarray(v) for k, v in empty.items()})
    assert float(loss0) == 0.0


def test_full_train_step_decreases_loss(setup):
    cfg, params, batch = setup
    tc = TrainConfig(learning_rate=3e-3, remat=False, max_grad_norm=1.0)
    trainer = Trainer(params, cfg, tc, num_training_steps=30)
    losses = [trainer.step(batch)["loss"] for _ in range(8)]
    assert losses[-1] < losses[0]
    assert all(np.isfinite(l) for l in losses)


def test_lora_train_step(setup):
    cfg, params, batch = setup
    tc = TrainConfig(
        learning_rate=5e-3, adapter_mode="lora",
        lora=LoraConfig(r=4, alpha=8.0), remat=False,
    )
    trainer = Trainer(params, cfg, tc, num_training_steps=30)
    losses = [trainer.step(batch)["loss"] for _ in range(6)]
    assert losses[-1] < losses[0]
    # base params untouched
    np.testing.assert_array_equal(
        np.asarray(trainer.base_params["encoder"]["layers"]["self_attention"]["q_proj"]["kernel"]),
        np.asarray(params["encoder"]["layers"]["self_attention"]["q_proj"]["kernel"]),
    )
    # merged params differ on targets only
    merged = trainer.trained_params()
    dq = np.asarray(merged["decoder"]["layers"]["self_attention"]["q_proj"]["kernel"])
    assert not np.array_equal(
        dq, np.asarray(params["decoder"]["layers"]["self_attention"]["q_proj"]["kernel"])
    )


def test_float16_train_step(setup):
    """compute_dtype='float16' is accepted end-to-end (the CLI/API already
    accept it — api.py:57); regression for the missing dtype-map entry."""
    cfg, params, batch = setup
    tc = TrainConfig(learning_rate=1e-3, compute_dtype="float16", remat=False)
    trainer = Trainer(params, cfg, tc, num_training_steps=10)
    out = trainer.step(batch)
    assert np.isfinite(out["loss"])


def test_remat_matches_no_remat(setup):
    cfg, params, batch = setup
    b = {k: jnp.asarray(v) for k, v in batch.items()}
    l1 = compute_loss(params, cfg, b, remat=False)
    l2 = compute_loss(params, cfg, b, remat=True)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_schedules():
    for kind in ("linear", "cosine", "step", "constant"):
        tc = TrainConfig(learning_rate=1e-3, lr_scheduler_type=kind, warmup_steps=5)
        sched = make_schedule(tc, 100)
        assert float(sched(0)) == 0.0  # warmup starts at 0
        assert float(sched(5)) == pytest.approx(1e-3, rel=1e-5)
        assert np.isfinite(float(sched(99)))


def test_grad_accumulation(setup):
    cfg, params, batch = setup
    tc = TrainConfig(learning_rate=1e-3, gradient_accumulation_steps=2, remat=False)
    trainer = Trainer(params, cfg, tc, num_training_steps=10)
    p0 = np.asarray(trainer.params["decoder"]["logits_dense"]["kernel"]).copy()
    trainer.step(batch)  # accumulate only — no update yet
    p1 = np.asarray(trainer.params["decoder"]["logits_dense"]["kernel"])
    np.testing.assert_array_equal(p0, p1)
    trainer.step(batch)  # second step applies the update
    p2 = np.asarray(trainer.params["decoder"]["logits_dense"]["kernel"])
    assert not np.array_equal(p0, p2)


def test_trainer_save_and_resume(setup, tmp_path):
    from dia_tts_prune_tpu.checkpoint import latest_step_dir

    cfg, params, batch = setup
    tc = TrainConfig(learning_rate=1e-3, remat=False)
    trainer = Trainer(params, cfg, tc, num_training_steps=10)
    trainer.step(batch)
    trainer.save(tmp_path, step=trainer.global_step)
    d = latest_step_dir(tmp_path)
    assert d is not None and d.name == "step_1"


def test_trainer_restore_resumes(setup, tmp_path):
    """save → fresh trainer → restore → training continues from the same state."""
    cfg, params, batch = setup
    tc = TrainConfig(learning_rate=1e-3, remat=False)
    t1 = Trainer(params, cfg, tc, num_training_steps=10)
    t1.step(batch)
    t1.step(batch)
    t1.save(tmp_path, step=t1.global_step)
    expected_next = t1.step(batch)["loss"]

    t2 = Trainer(params, cfg, tc, num_training_steps=10)
    assert t2.restore(tmp_path) == 2
    got_next = t2.step(batch)["loss"]
    np.testing.assert_allclose(got_next, expected_next, rtol=1e-5)


def test_prefetch_iterator():
    import time

    from dia_tts_prune_tpu.utils.prefetch import prefetch

    def slow_gen():
        for i in range(5):
            time.sleep(0.01)
            yield i

    assert list(prefetch(slow_gen())) == [0, 1, 2, 3, 4]

    def failing_gen():
        yield 1
        raise ValueError("boom")

    it = prefetch(failing_gen())
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_unknown_scheduler_rejected():
    tc = TrainConfig(lr_scheduler_type="nope")
    with pytest.raises(ValueError, match="nope"):
        make_schedule(tc, 10)
