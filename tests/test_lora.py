"""LoRA adapter tests: init/merge/unmerge, fusion equivalence, save/load."""

import jax
import numpy as np
import pytest

from dia_tts_prune_tpu.config import tiny_test_config
from dia_tts_prune_tpu.lora import (
    LoraConfig,
    init_lora,
    load_adapter,
    lora_param_count,
    merge_lora,
    save_adapter,
)
from dia_tts_prune_tpu.models.dia import init_params


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    lcfg = LoraConfig(r=4, alpha=8.0, target_modules=("q_proj", "v_proj"))
    adapter = init_lora(params, lcfg, jax.random.PRNGKey(1))
    return cfg, params, lcfg, adapter


def test_adapter_structure(setup):
    cfg, params, lcfg, adapter = setup
    w = adapter["weights"]
    enc_q = w["encoder"]["layers"]["self_attention"]["q_proj"]
    L, D = cfg.model.encoder.n_layer, cfg.model.encoder.n_embd
    N, H = cfg.model.encoder.n_head, cfg.model.encoder.head_dim
    assert enc_q["a"].shape == (L, D, 4)
    assert enc_q["b"].shape == (L, 4, N * H)
    assert "k_proj" not in w["encoder"]["layers"]["self_attention"]
    assert lora_param_count(adapter) > 0


def test_zero_init_merge_is_identity(setup):
    _, params, _, adapter = setup
    merged = merge_lora(params, adapter)  # B=0 → delta 0
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_merge_unmerge_round_trip(setup):
    _, params, _, adapter = setup
    # randomize B so deltas are nonzero
    rnd = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(2), x.shape, x.dtype) * 0.1,
        adapter["weights"],
    )
    adapter2 = {"config": adapter["config"], "weights": rnd}
    merged = merge_lora(params, adapter2)
    # nonzero delta on targets
    dq = np.abs(
        np.asarray(merged["encoder"]["layers"]["self_attention"]["q_proj"]["kernel"])
        - np.asarray(params["encoder"]["layers"]["self_attention"]["q_proj"]["kernel"])
    )
    assert dq.max() > 0
    # untargeted kernels unchanged
    np.testing.assert_array_equal(
        np.asarray(merged["encoder"]["layers"]["self_attention"]["k_proj"]["kernel"]),
        np.asarray(params["encoder"]["layers"]["self_attention"]["k_proj"]["kernel"]),
    )
    unmerged = merge_lora(merged, adapter2, sign=-1.0)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(unmerged)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fused_inference_runs(setup):
    from dia_tts_prune_tpu.generate import DiaGenerator

    cfg, params, _, adapter = setup
    rnd = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(4), x.shape, x.dtype) * 0.05,
        adapter["weights"],
    )
    merged = merge_lora(params, {"config": adapter["config"], "weights": rnd})
    gen = DiaGenerator(merged, cfg)
    out = gen.generate_tokens("[S1] lora", max_tokens=32, temperature=0.0)
    assert out.shape[0] > 0


def test_save_load_round_trip(setup, tmp_path):
    _, _, _, adapter = setup
    save_adapter(tmp_path / "adapter", adapter)
    loaded = load_adapter(tmp_path / "adapter")
    assert loaded["config"]["r"] == adapter["config"]["r"]
    for a, b in zip(jax.tree.leaves(adapter["weights"]), jax.tree.leaves(loaded["weights"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_wider_targets():
    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    lcfg = LoraConfig(r=2, alpha=4.0, target_modules=("q_proj", "k_proj", "v_proj", "o_proj", "wi_fused", "wo"))
    adapter = init_lora(params, lcfg, jax.random.PRNGKey(1))
    w = adapter["weights"]["decoder"]["layers"]
    L = cfg.model.decoder.n_layer
    D = cfg.model.decoder.n_embd
    # o_proj has 2 input axes (N, H) → fan_in = N*H
    N, H = cfg.model.decoder.gqa_query_heads, cfg.model.decoder.gqa_head_dim
    assert w["self_attention"]["o_proj"]["a"].shape == (L, N * H, 2)
    # wi_fused fan_out = 2 * n_hidden
    assert w["mlp"]["wi_fused"]["b"].shape == (L, 2, 2 * cfg.model.decoder.n_hidden)
    merged = merge_lora(params, adapter)
    assert merged is not None
