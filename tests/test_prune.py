"""Pruning tests: parity with torch.nn.utils.prune semantics, mask math,
sparsity accounting, and the physical FFN shrink exporter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dia_tts_prune_tpu.config import tiny_test_config
from dia_tts_prune_tpu.models.dia import init_params, param_count
from dia_tts_prune_tpu.prune import (
    apply_masks,
    prunable_items,
    shrink_ffn,
    sparsity_report,
    structured_masks,
    unstructured_masks,
)

try:
    import torch
    import torch.nn.utils.prune as tprune

    HAVE_TORCH = True
except ImportError:
    HAVE_TORCH = False

needs_torch = pytest.mark.skipif(not HAVE_TORCH, reason="torch unavailable")


@pytest.fixture(scope="module")
def tiny_params():
    cfg = tiny_test_config()
    return cfg, init_params(cfg, jax.random.PRNGKey(0))


def test_prunable_population_excludes_embeddings_and_norms(tiny_params):
    _, params = tiny_params
    paths = {".".join(p) for p, _ in prunable_items(params)}
    assert any("self_attention.q_proj.kernel" in p for p in paths)
    assert any("mlp.wi_fused.kernel" in p for p in paths)
    assert any("logits_dense.kernel" in p for p in paths)
    assert not any("embedding" in p for p in paths)
    assert not any("norm" in p for p in paths)


def test_unstructured_global_sparsity(tiny_params):
    _, params = tiny_params
    masks = unstructured_masks(params, 0.5)
    pruned = apply_masks(params, masks)
    rep = sparsity_report(pruned)
    assert abs(rep["sparsity"] - 0.5) < 0.01
    # non-kernel leaves untouched
    np.testing.assert_array_equal(
        np.asarray(pruned["encoder"]["embedding"]["embedding"]),
        np.asarray(params["encoder"]["embedding"]["embedding"]),
    )


@needs_torch
def test_unstructured_matches_torch_global(tiny_params):
    """Zero pattern matches torch prune.global_unstructured(L1) on the same
    weight population."""
    _, params = tiny_params
    items = prunable_items(params)
    mods = []
    for _, w in items:
        lin = torch.nn.Linear(1, 1, bias=False)
        lin.weight = torch.nn.Parameter(torch.tensor(np.asarray(w, np.float32)).contiguous())
        mods.append((lin, "weight"))
    tprune.global_unstructured(mods, pruning_method=tprune.L1Unstructured, amount=0.4)
    masks = unstructured_masks(params, 0.4)
    pruned = apply_masks(params, masks)
    ref_zero = np.concatenate([(m.weight == 0).numpy().ravel() for m, _ in mods])
    our_zero = np.concatenate([
        (np.asarray(_get(pruned, path)) == 0).ravel() for path, _ in items
    ])
    agreement = (ref_zero == our_zero).mean()
    assert agreement > 0.999  # ties at the threshold may differ


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


@needs_torch
def test_structured_matches_torch_ln(tiny_params):
    """Per-module dim-0 L2 structured mask matches torch prune.ln_structured."""
    _, params = tiny_params
    w = np.asarray(params["decoder"]["logits_dense"]["kernel"], np.float32)  # [D, C, V]
    lin = torch.nn.Linear(1, 1, bias=False)
    lin.weight = torch.nn.Parameter(torch.from_numpy(w.copy()))
    tprune.ln_structured(lin, "weight", amount=0.5, n=2, dim=0)
    ref_zero = (lin.weight == 0).numpy()

    sub = {"logits_dense": {"kernel": jnp.asarray(w)}}
    masks = structured_masks(sub, 0.5, dim=0, n=2)
    ours_zero = ~np.asarray(masks["logits_dense"]["kernel"])
    np.testing.assert_array_equal(ours_zero, ref_zero)


def test_structured_skips_out_of_range_dim(tiny_params):
    _, params = tiny_params
    masks = structured_masks(params, 0.5, dim=3)  # q_proj per-module rank is 3 → dim 3 invalid
    # wi_fused per-module kernel [D,2,F] rank 3 → dim 3 invalid too; all-ones mask
    m = masks["encoder"]["layers"]["mlp"]["wo"]["kernel"]
    assert np.asarray(m).all()  # wo rank 2, dim 3 skipped → keep everything


def test_pruned_model_still_generates(tiny_params):
    from dia_tts_prune_tpu.generate import DiaGenerator

    cfg, params = tiny_params
    pruned = apply_masks(params, unstructured_masks(params, 0.6))
    gen = DiaGenerator(pruned, cfg)
    out = gen.generate_tokens("[S1] pruned", max_tokens=40, temperature=0.0)
    assert out.shape[0] > 0


def test_shrink_ffn(tiny_params):
    cfg, params = tiny_params
    new_params, new_cfg = shrink_ffn(params, cfg, keep_fraction=0.99)
    # 128-alignment: tiny config has n_hidden=128 → stays 128
    assert new_cfg.model.encoder.n_hidden == 128
    assert new_params["encoder"]["layers"]["mlp"]["wi_fused"]["kernel"].shape[-1] == 128

    # run the shrunken model end-to-end
    from dia_tts_prune_tpu.generate import DiaGenerator

    gen = DiaGenerator(new_params, new_cfg)
    out = gen.generate_tokens("[S1] shrunk", max_tokens=32, temperature=0.0)
    assert out.shape[0] > 0
    assert param_count(new_params) <= param_count(params)


def test_shrink_heads(tiny_params):
    from dia_tts_prune_tpu.prune import shrink_heads

    cfg, params = tiny_params
    new_params, new_cfg = shrink_heads(params, cfg, keep_fraction=0.5)
    # tiny config: enc 4 heads → 2; dec 2 kv (group 2) → 1 kv / 2 q; cross 4 → 2
    assert new_cfg.model.encoder.n_head == 2
    assert new_cfg.model.decoder.kv_heads == 1
    assert new_cfg.model.decoder.gqa_query_heads == 2
    assert new_cfg.model.decoder.cross_query_heads == 2
    q = new_params["decoder"]["layers"]["self_attention"]["q_proj"]["kernel"]
    o = new_params["decoder"]["layers"]["self_attention"]["o_proj"]["kernel"]
    assert q.shape[2] == 2 and o.shape[1] == 2  # q/o consistent

    from dia_tts_prune_tpu.generate import DiaGenerator
    from dia_tts_prune_tpu.models.dia import param_count

    gen = DiaGenerator(new_params, new_cfg)
    out = gen.generate_tokens("[S1] fewer heads", max_tokens=32, temperature=0.0)
    assert out.shape[0] > 0
    assert param_count(new_params) < param_count(params)


def test_shrink_heads_keeps_important(tiny_params):
    """The kept heads are the highest-importance ones: zeroing a kv group
    must make it the one removed."""
    import jax.numpy as jnp

    from dia_tts_prune_tpu.prune import shrink_heads

    cfg, params = tiny_params
    sa = params["decoder"]["layers"]["self_attention"]
    # zero kv head 0's kernels (and its query group 0-1)
    mod = {
        "q_proj": {"kernel": sa["q_proj"]["kernel"].at[:, :, :2, :].set(0.0)},
        "k_proj": {"kernel": sa["k_proj"]["kernel"].at[:, :, :1, :].set(0.0)},
        "v_proj": {"kernel": sa["v_proj"]["kernel"].at[:, :, :1, :].set(0.0)},
        "o_proj": {"kernel": sa["o_proj"]["kernel"].at[:, :2, :, :].set(0.0)},
    }
    p2 = dict(params)
    p2["decoder"] = dict(params["decoder"])
    p2["decoder"]["layers"] = dict(params["decoder"]["layers"], self_attention=mod)
    new_params, _ = shrink_heads(p2, cfg, keep_fraction=0.5)
    kept_k = new_params["decoder"]["layers"]["self_attention"]["k_proj"]["kernel"]
    # the surviving kv head must be the nonzero one (head 1)
    import numpy as np

    np.testing.assert_array_equal(
        np.asarray(kept_k[:, :, 0, :]), np.asarray(sa["k_proj"]["kernel"][:, :, 1, :])
    )
