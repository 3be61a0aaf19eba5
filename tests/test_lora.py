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


# ---------------------------------------------------------------------------
# torch-peft interop: adapters trained with the reference/GPU stack must load
# here (reference consumption: cli.py:166-174), and our adapters must export
# to a dir peft can consume (reference production: finetune.py:574).
# ---------------------------------------------------------------------------


def _torch_skeleton(cfg):
    """Tiny torch model with the reference module paths (dia/layers.py:419-814)
    and nn.Linear q/v projections — what peft wraps on the GPU stack."""
    import torch

    class Attn(torch.nn.Module):
        def __init__(self, d, n, h, kv=None):
            super().__init__()
            kv = kv or n
            self.q_proj = torch.nn.Linear(d, n * h, bias=False)
            self.v_proj = torch.nn.Linear(d, kv * h, bias=False)

    class Layer(torch.nn.Module):
        def __init__(self, enc):
            super().__init__()
            m = cfg.model.encoder if enc else cfg.model.decoder
            if enc:
                self.self_attention = Attn(m.n_embd, m.n_head, m.head_dim)
            else:
                self.self_attention = Attn(m.n_embd, m.gqa_query_heads,
                                           m.gqa_head_dim, m.kv_heads)
                self.cross_attention = Attn(m.n_embd, m.cross_query_heads,
                                            m.cross_head_dim)

    class Side(torch.nn.Module):
        def __init__(self, enc):
            super().__init__()
            n = (cfg.model.encoder if enc else cfg.model.decoder).n_layer
            self.layers = torch.nn.ModuleList(Layer(enc) for _ in range(n))

    class Model(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Side(True)
            self.decoder = Side(False)

        def forward(self, x):  # peft requires a forward
            return x

    return Model()


@pytest.fixture(scope="module")
def peft_adapter_dir(tmp_path_factory):
    """A REAL torch-peft adapter directory (randomized A and B factors)."""
    import torch
    from peft import LoraConfig as PeftLoraConfig, get_peft_model

    cfg = tiny_test_config()
    model = _torch_skeleton(cfg)
    pcfg = PeftLoraConfig(r=4, lora_alpha=8, lora_dropout=0.0,
                          target_modules=["q_proj", "v_proj"], bias="none")
    peft_model = get_peft_model(model, pcfg)
    gen = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for name, p in peft_model.named_parameters():
            if "lora_" in name:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.1)
    out = tmp_path_factory.mktemp("peft") / "adapter"
    peft_model.save_pretrained(str(out))
    return cfg, peft_model, out


def test_load_peft_adapter_matches_merged_torch(peft_adapter_dir):
    """Fusing the peft dir here == peft's own merge_and_unload, kernel by
    kernel (through the torch[out,in] -> JAX[in, ...out] layout map)."""
    import torch

    cfg, peft_model, out = peft_adapter_dir
    adapter = load_adapter(out)
    assert adapter["config"]["r"] == 4 and adapter["config"]["alpha"] == 8.0

    params = init_params(cfg, jax.random.PRNGKey(0))
    # put the torch base weights into the pytree so fused results align
    with torch.no_grad():
        for side, L in (("encoder", cfg.model.encoder.n_layer),
                        ("decoder", cfg.model.decoder.n_layer)):
            tside = getattr(peft_model.base_model.model, side)
            attns = ["self_attention"] if side == "encoder" else [
                "self_attention", "cross_attention"]
            for attn in attns:
                for proj in ("q_proj", "v_proj"):
                    ker = params[side]["layers"][attn][proj]["kernel"]
                    stack = np.stack([
                        getattr(getattr(tside.layers[i], attn), proj)
                        .base_layer.weight.numpy().T.reshape(ker.shape[1:])
                        for i in range(L)
                    ])
                    params[side]["layers"][attn][proj]["kernel"] = (
                        np.asarray(stack, np.float32))

    fused = merge_lora(params, adapter)
    merged_torch = peft_model.merge_and_unload()
    for side, L in (("encoder", cfg.model.encoder.n_layer),
                    ("decoder", cfg.model.decoder.n_layer)):
        tside = getattr(merged_torch, side)
        attns = ["self_attention"] if side == "encoder" else [
            "self_attention", "cross_attention"]
        for attn in attns:
            for proj in ("q_proj", "v_proj"):
                ours = np.asarray(fused[side]["layers"][attn][proj]["kernel"])
                for i in range(L):
                    theirs = (getattr(getattr(tside.layers[i], attn), proj)
                              .weight.detach().numpy().T.reshape(ours.shape[1:]))
                    np.testing.assert_allclose(ours[i], theirs, rtol=1e-5, atol=1e-6)


def test_peft_adapter_loads_through_dia_api(peft_adapter_dir, tmp_path):
    """Dia.load_adapter_weights consumes the peft dir directly (the reference
    CLI flow, cli.py:166-174) and unload restores the base weights."""
    from dia_tts_prune_tpu.api import Dia

    cfg, _, out = peft_adapter_dir
    dia = Dia.random_init(cfg, seed=0)
    base_q = np.asarray(
        dia.params["decoder"]["layers"]["self_attention"]["q_proj"]["kernel"]).copy()
    dia.load_adapter_weights(out)
    fused_q = np.asarray(
        dia.params["decoder"]["layers"]["self_attention"]["q_proj"]["kernel"])
    assert np.abs(fused_q - base_q).max() > 0
    dia.unload_adapter()
    np.testing.assert_allclose(
        np.asarray(dia.params["decoder"]["layers"]["self_attention"]["q_proj"]["kernel"]),
        base_q, atol=1e-6)


def test_export_peft_round_trip(peft_adapter_dir, tmp_path):
    """save_peft_adapter output re-loads bit-exactly here AND is consumable by
    real peft (PeftModel.from_pretrained on the torch skeleton)."""
    import torch
    from peft import PeftModel

    from dia_tts_prune_tpu.lora import save_peft_adapter

    cfg, _, src = peft_adapter_dir
    adapter = load_adapter(src)
    save_peft_adapter(tmp_path / "exported", adapter)
    again = load_adapter(tmp_path / "exported")
    for a, b in zip(jax.tree.leaves(adapter["weights"]),
                    jax.tree.leaves(again["weights"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # real peft loads the exported dir and reproduces the same merged weights
    base = _torch_skeleton(cfg)
    wrapped = PeftModel.from_pretrained(base, str(tmp_path / "exported"))
    q0 = wrapped.base_model.model.encoder.layers[0].self_attention.q_proj
    scale = adapter["config"]["alpha"] / adapter["config"]["r"]
    a = np.asarray(adapter["weights"]["encoder"]["layers"]["self_attention"]["q_proj"]["a"])[0]
    b = np.asarray(adapter["weights"]["encoder"]["layers"]["self_attention"]["q_proj"]["b"])[0]
    with torch.no_grad():
        delta_theirs = (q0.lora_B["default"].weight @ q0.lora_A["default"].weight
                        ).numpy() * q0.scaling["default"]
    np.testing.assert_allclose(delta_theirs, (scale * (a @ b)).T, rtol=1e-5, atol=1e-6)
