"""Multi-chip sharding tests on the 8-virtual-device CPU mesh: TP/DP layouts,
sharded vs single-device numerical equivalence, sharded generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from dia_tts_prune_tpu.config import (
    DataConfig,
    DecoderConfig,
    DiaConfig,
    EncoderConfig,
    ModelConfig,
)
from dia_tts_prune_tpu.models.dia import init_params
from dia_tts_prune_tpu.parallel.sharding import (
    make_mesh,
    param_specs,
    shard_batch,
    shard_params,
    validate_divisibility,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _tp_config():
    return DiaConfig(
        model=ModelConfig(
            encoder=EncoderConfig(n_layer=2, n_embd=64, n_hidden=256, n_head=8, head_dim=16),
            decoder=DecoderConfig(
                n_layer=2, n_embd=64, n_hidden=256, gqa_query_heads=8, kv_heads=4,
                gqa_head_dim=16, cross_query_heads=8, cross_head_dim=16,
            ),
            src_vocab_size=256,
            tgt_vocab_size=1028,
        ),
        data=DataConfig(text_length=128, audio_length=128),
    )


def test_make_mesh_shapes():
    mesh = make_mesh(data=2, model=4)
    assert mesh.shape == {"data": 2, "model": 4}
    mesh2 = make_mesh()  # default: all devices on model
    assert mesh2.shape["model"] == len(jax.devices())
    with pytest.raises(ValueError):
        make_mesh(data=3, model=4)


def test_validate_divisibility():
    cfg = _tp_config()
    assert validate_divisibility(cfg, 4) == []
    issues = validate_divisibility(cfg, 16)
    assert any("kv heads" in i for i in issues)


def test_param_specs_match_tree():
    cfg = _tp_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    specs = param_specs(cfg)
    # same tree structure
    jax.tree.map(lambda a, b: None, params, specs,
                 is_leaf=lambda x: isinstance(x, P))


def test_sharded_params_placement():
    cfg = _tp_config()
    mesh = make_mesh(data=2, model=4)
    params = shard_params(init_params(cfg, jax.random.PRNGKey(0)), mesh, config=cfg)
    q = params["decoder"]["layers"]["self_attention"]["q_proj"]["kernel"]
    # q heads (8) sharded over model axis (4) → each shard holds 2 heads
    shard_shapes = {s.data.shape for s in q.addressable_shards}
    assert shard_shapes == {(2, 64, 2, 16)}


def test_sharded_loss_matches_single_device():
    from dia_tts_prune_tpu.train import build_train_batch, compute_loss

    cfg = _tp_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B = 4
    text = rng.integers(1, 200, (B, cfg.data.text_length)).astype(np.int32)
    text[:, 40:] = 0
    codes = [rng.integers(0, 1024, (60, 9)).astype(np.int32) for _ in range(B)]
    batch_np = build_train_batch(cfg, text, codes)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    loss_single = float(compute_loss(params, cfg, batch))

    mesh = make_mesh(data=2, model=4)
    sp = shard_params(params, mesh, config=cfg)
    sb = shard_batch(batch, mesh)
    with mesh:
        loss_sharded = float(jax.jit(
            lambda p, b: compute_loss(p, cfg, b)
        )(sp, sb))
    np.testing.assert_allclose(loss_sharded, loss_single, rtol=1e-5)


def test_generate_fused_cache_sharded_in_compiled_hlo():
    """The KV caches must stay model-axis-sharded INSIDE the compiled decode
    loop (VERDICT r1: `self_cache_spec` was defined but never applied, so the
    cache was replicated).  Inspect the post-SPMD HLO: per-shard cache shapes
    present, TP all-reduces present, and no collective ever materializes the
    full-size cache."""
    from dia_tts_prune_tpu.generate import generate_fused
    from dia_tts_prune_tpu.tokenizer import encode_cfg_batch

    cfg = _tp_config()
    d = cfg.data
    params = init_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(data=2, model=4)
    sp = shard_params(params, mesh, config=cfg)

    enc_input = encode_cfg_batch("[S1] hlo check", d.text_length, d.text_pad_value)
    tokens_buf = np.full((d.audio_length, d.channels), -1, dtype=np.int32)
    tokens_buf[0] = d.audio_bos_value
    int_args = np.asarray([1, 40, 0], np.int32)
    float_args = np.asarray([3.0, 0.0, 0.95], np.float32)

    with mesh:
        lowered = generate_fused.lower(
            sp, cfg, jnp.asarray(enc_input), jnp.asarray(tokens_buf),
            jnp.asarray(int_args), jnp.asarray(float_args),
            prefill_window=None, greedy=True, cfg_filter_top_k=35,
            compute_dtype_name="float32",
        )
        hlo = lowered.compile().as_text()

    L, B, T = 2, 2, d.audio_length
    kvh, hd = cfg.model.decoder.kv_heads, cfg.model.decoder.gqa_head_dim
    # self cache [L,B,T,4,16] sharded 4-way on heads → per-shard [L,B,T,1,16]
    shard_shape = f"f32[{L},{B},{T},{kvh // 4},{hd}]"
    full_shape = f"f32[{L},{B},{T},{kvh},{hd}]"
    assert shard_shape in hlo, f"per-shard cache shape {shard_shape} not in compiled HLO"
    assert full_shape not in hlo, "full-size (replicated) cache found in compiled HLO"

    n_all_reduce = hlo.count("all-reduce")
    n_all_gather = hlo.count("all-gather")
    assert n_all_reduce > 0, "TP psum all-reduces missing from compiled HLO"
    # no collective may carry a full-cache-sized operand (cache stays local)
    import re
    for op in ("all-gather", "all-reduce", "collective-permute"):
        for line in hlo.splitlines():
            if f" {op}(" in line or line.lstrip().startswith(op):
                assert full_shape not in line, f"{op} moves the full cache: {line[:160]}"


def test_sharded_generation_matches_single_device():
    """TP-sharded greedy generation must produce the same tokens."""
    from dia_tts_prune_tpu.generate import DiaGenerator

    cfg = _tp_config()
    params = init_params(cfg, jax.random.PRNGKey(1))
    gen = DiaGenerator(params, cfg)
    ref = gen.generate_tokens("[S1] sharded gen", max_tokens=40, temperature=0.0)

    # kv heads (4) don't divide 8 → use a (2, 4) mesh (v5e-4 TP plan)
    mesh = make_mesh(data=2, model=4)
    sp = shard_params(params, mesh, config=cfg)
    gen_sharded = DiaGenerator(sp, cfg)
    with mesh:
        out = gen_sharded.generate_tokens("[S1] sharded gen", max_tokens=40, temperature=0.0)
    np.testing.assert_array_equal(out, ref)


def test_sharded_generation_quant_kv_matches_single_device(monkeypatch):
    """TP-sharded generation with the int8 KV cache (DIA_KV_INT8=1, packed
    int8 weights): the QuantKVCache sharding constraints (k/v on the head
    axis, scales on the same axis minus H) must survive SPMD partitioning —
    tokens equal the single-device quant run."""
    from dia_tts_prune_tpu.generate import DiaGenerator, _kv_cache_quant
    from dia_tts_prune_tpu.ops.quant import quantize_params_int8_packed

    cfg = _tp_config()
    params = init_params(cfg, jax.random.PRNGKey(1))
    packed = quantize_params_int8_packed(params, fused=False)
    monkeypatch.setenv("DIA_KV_INT8", "1")
    assert _kv_cache_quant(packed)

    ref = DiaGenerator(packed, cfg).generate_tokens(
        "[S1] sharded quant kv", max_tokens=40, temperature=0.0)

    # shard the bf16 tree, then quantize under the mesh (packed kernels are
    # custom pytree nodes shard_params doesn't traverse; quantizing sharded
    # arrays yields sharded packed kernels)
    mesh = make_mesh(data=2, model=4)
    sp = shard_params(params, mesh, config=cfg)
    with mesh:
        sp_packed = quantize_params_int8_packed(sp, fused=False)
        out = DiaGenerator(sp_packed, cfg).generate_tokens(
            "[S1] sharded quant kv", max_tokens=40, temperature=0.0)
    np.testing.assert_array_equal(out, ref)


def test_sharded_generation_int4_matches_single_device():
    """TP-sharded generation with nibble-int4 weights: the in-jit unpack to
    XLA-native S4 (generate._maybe_unpack_s4) must compose with GSPMD —
    the convert/reshape keep the kernels' model-axis sharding and tokens
    equal the single-device int4 run."""
    from dia_tts_prune_tpu.generate import DiaGenerator
    from dia_tts_prune_tpu.ops.quant import quantize_params_int4_packed

    cfg = _tp_config()
    params = init_params(cfg, jax.random.PRNGKey(1))
    q4 = quantize_params_int4_packed(params, group=16, nibble=True,
                                     halfsplit=True)
    ref = DiaGenerator(q4, cfg).generate_tokens(
        "[S1] sharded int4", max_tokens=40, temperature=0.0)

    mesh = make_mesh(data=2, model=4)
    sp = shard_params(params, mesh, config=cfg)
    with mesh:
        sp_q4 = quantize_params_int4_packed(sp, group=16, nibble=True,
                                            halfsplit=True)
        out = DiaGenerator(sp_q4, cfg).generate_tokens(
            "[S1] sharded int4", max_tokens=40, temperature=0.0)
    np.testing.assert_array_equal(out, ref)


# ---------------------------------------------------------------------------
# FSDP (ZeRO-style parameter/optimizer-state storage sharding)
# ---------------------------------------------------------------------------


def _fsdp_setup():
    from dia_tts_prune_tpu.train import build_train_batch

    cfg = _tp_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B = 4
    text = rng.integers(1, 200, (B, cfg.data.text_length)).astype(np.int32)
    text[:, 40:] = 0
    codes = [rng.integers(0, 1024, (60, 9)).astype(np.int32) for _ in range(B)]
    batch = build_train_batch(cfg, text, codes)
    return cfg, params, batch


def test_fsdp_specs_shard_large_leaves_only():
    """Large kernels gain a data-axis shard on a free dim; the TP axes are
    kept; tiny norm scales stay replicated."""
    from dia_tts_prune_tpu.parallel.sharding import fsdp_param_specs

    cfg = _tp_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(data=4, model=2)
    specs = fsdp_param_specs(cfg, params, mesh, min_elements=1 << 12)

    wi = specs["decoder"]["layers"]["mlp"]["wi_fused"]["kernel"]
    assert "data" in wi and "model" in wi  # 2-D sharded like the TP plan + ZeRO
    q = specs["decoder"]["layers"]["self_attention"]["q_proj"]["kernel"]
    assert "data" in q and "model" in q
    # norm scales below the size floor keep the plain TP spec (replicated)
    scale = specs["decoder"]["layers"]["pre_sa_norm"]["scale"]
    assert "data" not in scale


def test_fsdp_train_step_matches_single_device():
    """A full AdamW train step under FSDP storage equals the single-device
    step (loss and updated params), and the optimizer moments are actually
    stored sharded (per-shard bytes < full bytes)."""
    from dia_tts_prune_tpu.train import TrainConfig, Trainer

    cfg, params, batch = _fsdp_setup()
    tc = TrainConfig(learning_rate=3e-3, remat=False, max_grad_norm=1.0)

    ref = Trainer(params, cfg, tc, num_training_steps=10)
    ref_metrics = ref.step(batch)

    mesh = make_mesh(data=4, model=2)
    sp = shard_params(params, mesh, config=cfg, fsdp=True)
    with mesh:
        tr = Trainer(sp, cfg, tc, num_training_steps=10, mesh=mesh)
        # the Trainer's private param copy must keep the FSDP storage layout
        wi = tr.params["decoder"]["layers"]["mlp"]["wi_fused"]["kernel"]
        assert "data" in str(wi.sharding.spec)
        metrics = tr.step(batch)

    np.testing.assert_allclose(metrics["loss"], ref_metrics["loss"], rtol=1e-5)
    np.testing.assert_allclose(metrics["grad_norm"], ref_metrics["grad_norm"],
                               rtol=1e-4)

    # updated params match the single-device update
    np.testing.assert_allclose(
        np.asarray(tr.params["decoder"]["layers"]["mlp"]["wi_fused"]["kernel"]),
        np.asarray(ref.params["decoder"]["layers"]["mlp"]["wi_fused"]["kernel"]),
        rtol=2e-3, atol=1e-5,  # cross-device reduce order × AdamW rsqrt
    )

    # AdamW moments inherit the FSDP sharding: per-shard storage is a strict
    # fraction of the logical array (ZeRO — this is the memory claim).  Target
    # the wi_fused moment, whose spec the test above proves is 2-axis sharded.
    from jax.tree_util import tree_flatten_with_path

    mu = None
    for path, leaf in tree_flatten_with_path(tr.opt_state)[0]:
        keys = [getattr(p, "key", None) for p in path]
        if "wi_fused" in keys and hasattr(leaf, "sharding"):
            mu = leaf
            break
    assert mu is not None
    assert "data" in str(mu.sharding.spec)
    shard_elems = mu.addressable_shards[0].data.size
    assert shard_elems * 8 == mu.size  # split over both mesh axes (4×2)


def test_fsdp_second_step_stays_consistent():
    """Two FSDP steps keep matching the single-device trajectory (the donated
    sharded buffers and NaN-guard selects survive round trips)."""
    from dia_tts_prune_tpu.train import TrainConfig, Trainer

    cfg, params, batch = _fsdp_setup()
    tc = TrainConfig(learning_rate=3e-3, remat=False, max_grad_norm=1.0)

    ref = Trainer(params, cfg, tc, num_training_steps=10)
    mesh = make_mesh(data=4, model=2)
    sp = shard_params(params, mesh, config=cfg, fsdp=True)
    with mesh:
        tr = Trainer(sp, cfg, tc, num_training_steps=10, mesh=mesh)
        for _ in range(2):
            m_ref = ref.step(batch)
            m_fsdp = tr.step(batch)
        np.testing.assert_allclose(m_fsdp["loss"], m_ref["loss"], rtol=1e-5)


# ---------------------------------------------------------------------------
# Multi-host (DCN) replica axis — hybrid (replica, data, model) mesh
# ---------------------------------------------------------------------------


def test_hybrid_mesh_shapes_and_batch_spec():
    from dia_tts_prune_tpu.parallel.sharding import batch_spec, make_hybrid_mesh

    mesh = make_hybrid_mesh(replica=2, data=2, model=2)
    assert mesh.shape == {"replica": 2, "data": 2, "model": 2}
    # make_mesh(replica=...) routes to the hybrid builder
    assert make_mesh(data=2, model=2, replica=2).shape == mesh.shape
    with pytest.raises(ValueError):
        make_hybrid_mesh(replica=3, data=2, model=2)

    # global batch spec spans (replica, data); the plain mesh keeps data-only
    assert batch_spec(3, mesh) == P(("replica", "data"), None, None)
    assert batch_spec(3, make_mesh(data=2, model=4)) == P("data", None, None)
    assert batch_spec(3) == P("data", None, None)


def test_hybrid_mesh_train_step_matches_single_device():
    """A train step on the (2 replica, 2 data, 2 model) hybrid mesh equals the
    single-device step: params replicate across the DCN axis, the batch
    shards over replica x data, and the gradient all-reduce is the only
    cross-replica dependency (emitted by GSPMD from the shardings alone)."""
    from dia_tts_prune_tpu.train import TrainConfig, Trainer, build_train_batch

    cfg = _tp_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B = 4
    text = rng.integers(1, 200, (B, cfg.data.text_length)).astype(np.int32)
    text[:, 40:] = 0
    codes = [rng.integers(0, 1024, (60, 9)).astype(np.int32) for _ in range(B)]
    batch = build_train_batch(cfg, text, codes)
    tc = TrainConfig(learning_rate=3e-3, remat=False, max_grad_norm=1.0)

    ref = Trainer(params, cfg, tc, num_training_steps=10)
    ref_metrics = ref.step(batch)

    mesh = make_mesh(data=2, model=2, replica=2)
    sp = shard_params(params, mesh, config=cfg)
    # params carry no replica axis in their sharding (replicated over DCN)
    wi = sp["decoder"]["layers"]["mlp"]["wi_fused"]["kernel"]
    assert "replica" not in str(wi.sharding.spec)
    with mesh:
        tr = Trainer(sp, cfg, tc, num_training_steps=10, mesh=mesh)
        metrics = tr.step(batch)

    np.testing.assert_allclose(metrics["loss"], ref_metrics["loss"], rtol=1e-5)
    np.testing.assert_allclose(metrics["grad_norm"], ref_metrics["grad_norm"],
                               rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(tr.params["decoder"]["layers"]["mlp"]["wi_fused"]["kernel"]),
        np.asarray(ref.params["decoder"]["layers"]["mlp"]["wi_fused"]["kernel"]),
        rtol=2e-3, atol=1e-5,
    )


def test_hybrid_mesh_batch_spans_replica_and_data():
    """shard_batch on the hybrid mesh puts one example per (replica, data)
    pair - per-shard leading dim = B / (replica*data)."""
    mesh = make_mesh(data=2, model=2, replica=2)
    x = np.arange(4 * 6, dtype=np.float32).reshape(4, 6)
    sharded = shard_batch({"x": x}, mesh)["x"]
    assert sharded.addressable_shards[0].data.shape == (1, 6)
    np.testing.assert_array_equal(np.asarray(sharded), x)


def test_constrain_tuple_axes_divisibility():
    """constrain() with a tuple-of-axes spec entry (hybrid batch spec) checks
    divisibility against the PRODUCT of the axis sizes: a batch of 4 over
    ('replica','data') = 2*2 keeps the shard; a batch of 2 drops to
    replicated instead of GSPMD padding."""
    from dia_tts_prune_tpu.parallel.sharding import constrain

    mesh = make_mesh(data=2, model=2, replica=2)
    spec = P(("replica", "data"), None)

    with mesh:
        ok = jax.jit(lambda x: constrain(x, spec))(jnp.ones((4, 8)))
        assert "replica" in str(ok.sharding.spec)
        # 2 % (2*2) != 0 → the tuple axis must be dropped, not padded
        dropped = jax.jit(lambda x: constrain(x, spec))(jnp.ones((2, 8)))
        assert dropped.shape == (2, 8)
        assert "replica" not in str(dropped.sharding.spec)
