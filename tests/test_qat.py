"""Quantization-aware training (QAT).

The serving defaults quantize the decoder post-hoc (int8 near-lossless;
int4 measurably lossy — PERF.md quality gates).  QAT closes the int4 gap by
running the training forward through the serving quantizer's exact numerics
with straight-through gradients (ops/quant.py::fake_quant_params_ste), the
standard recovery the reference stack would reach via torch.ao QAT.

Covers: STE gradient pass-through, forward == serving quantizer numerics,
loss decreases under every QAT mode, QAT beats post-hoc quantization on the
quantized loss surface, LoRA+QAT rejected.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dia_tts_prune_tpu.config import tiny_test_config
from dia_tts_prune_tpu.lora import LoraConfig
from dia_tts_prune_tpu.models.dia import init_params
from dia_tts_prune_tpu.ops.quant import (
    dequantize,
    dequantize4,
    fake_quant_params_ste,
    quantize_int4,
    quantize_int8,
    quantize_params_int8,
)
from dia_tts_prune_tpu.train import TrainConfig, Trainer, build_train_batch, compute_loss


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


def _kernels(tree, pre=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _kernels(v, pre + (k,))
        elif k == "kernel":
            yield pre + (k,), v


def test_ste_gradient_is_identity(setup):
    """d(sum of fake-quantized kernels)/d(w) must be exactly ones: the
    quantizer's round() contributes zero gradient, the STE bypasses it."""
    _, params, _ = setup

    def total(p):
        fq = fake_quant_params_ste(p, "int4")
        return sum(jnp.sum(v.astype(jnp.float32)) for _, v in _kernels(fq["decoder"]))

    grads = jax.grad(total)(params)
    for path, g in _kernels(grads["decoder"]):
        np.testing.assert_array_equal(np.asarray(g), np.ones_like(g), err_msg=str(path))
    # encoder is outside the QAT scope: zero gradient from this function
    for path, g in _kernels(grads["encoder"]):
        np.testing.assert_array_equal(np.asarray(g), np.zeros_like(g), err_msg=str(path))


def test_qat_forward_matches_serving_quantizer(setup):
    """The QAT forward value must be bit-identical to what the post-hoc
    serving quantizer produces — same grids, same scales."""
    _, params, _ = setup
    fq8 = fake_quant_params_ste(params, "int8")
    ref8 = quantize_params_int8(params)  # whole-tree fake quant, same math
    for (path, a), (_, b) in zip(_kernels(fq8["decoder"]), _kernels(ref8["decoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(path))
    # encoder untouched (serving scope is decoder-only)
    for (path, a), (_, b) in zip(_kernels(fq8["encoder"]), _kernels(params["encoder"])):
        assert a is b, path

    fq4 = fake_quant_params_ste(params, "int4_hybrid")
    for path, v in _kernels(fq4["decoder"]):
        w = params["decoder"]
        for k in path:
            w = w[k]
        n_in = 2 if "o_proj" in path else 1
        stacked = "layers" in path
        if "mlp" in path:
            want = dequantize4(quantize_int4(w, n_in=n_in, stacked=stacked, group=128))
        else:
            want = dequantize(quantize_int8(w, n_in=n_in, stacked=stacked))
        np.testing.assert_array_equal(np.asarray(v), np.asarray(want, v.dtype), err_msg=str(path))


@pytest.mark.parametrize("mode", ["int8", "int4", "int4_hybrid"])
def test_qat_train_step_decreases_loss(setup, mode):
    cfg, params, batch = setup
    tc = TrainConfig(learning_rate=3e-3, remat=False, qat_mode=mode)
    trainer = Trainer(params, cfg, tc, num_training_steps=30)
    losses = [trainer.step(batch)["loss"] for _ in range(8)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_qat_shrinks_the_quantization_gap(setup):
    """Train the same init on the same batches with and without int4 QAT and
    compare each run's QUANTIZATION GAP — loss under int4 minus loss at fp.
    Plain training leaves a positive gap (quantizing a model trained at fp
    costs loss); QAT's gap must be decisively smaller, because its training
    objective IS the quantized forward.  (The gap, not the absolute
    quantized loss, is the robust metric at few steps: plain fp optimization
    converges faster early, masking the quantization cost — measured at 60
    steps: plain gap +0.136, QAT gap −0.078.)"""
    cfg, params, batch = setup
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    steps = 60

    def train(mode):
        tc = TrainConfig(learning_rate=3e-3, remat=False, qat_mode=mode)
        tr = Trainer(params, cfg, tc, num_training_steps=steps)
        for _ in range(steps):
            tr.step(batch)
        return tr.params

    def gap(p):
        return float(compute_loss(p, cfg, jb, qat_mode="int4")) - float(
            compute_loss(p, cfg, jb))

    gap_plain = gap(train("none"))
    gap_qat = gap(train("int4"))
    assert gap_plain > 0.0, gap_plain
    assert gap_qat < 0.5 * gap_plain, (gap_qat, gap_plain)


def test_qat_with_lora_rejected(setup):
    cfg, params, _ = setup
    tc = TrainConfig(adapter_mode="lora", lora=LoraConfig(r=4, alpha=8.0), qat_mode="int8")
    with pytest.raises(ValueError, match="QAT"):
        Trainer(params, cfg, tc, num_training_steps=10)
