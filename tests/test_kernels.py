"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on TPU
by the bench/profile tooling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dia_tts_prune_tpu.ops.kernels.decode_attention import (
    decode_attention,
    decode_attention_reference,
)


@pytest.mark.parametrize("valid", [1, 5, 500, 511, 512, 513, 1024])
def test_decode_attention_matches_reference(valid):
    rng = np.random.default_rng(0)
    B, T, Nkv, G, H = 2, 1024, 4, 4, 128
    Nq = Nkv * G
    q = jnp.asarray(rng.normal(size=(B, Nq, H)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, Nkv, H)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, Nkv, H)).astype(np.float32))

    out = decode_attention(q, k, v, jnp.asarray(valid, jnp.int32), chunk=512, interpret=True)
    ref = decode_attention_reference(q, k, v, jnp.asarray(valid, jnp.int32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_decode_attention_bf16():
    rng = np.random.default_rng(1)
    B, T, Nkv, G, H = 2, 512, 2, 2, 128
    Nq = Nkv * G
    q = jnp.asarray(rng.normal(size=(B, Nq, H)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, T, Nkv, H)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, T, Nkv, H)), dtype=jnp.bfloat16)
    out = decode_attention(q, k, v, jnp.asarray(100, jnp.int32), chunk=256, interpret=True)
    ref = decode_attention_reference(q, k, v, jnp.asarray(100, jnp.int32))
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=5e-2, atol=5e-2
    )


def test_decode_attention_ignores_garbage_past_valid():
    """Slots >= valid_len must not affect the output."""
    rng = np.random.default_rng(2)
    B, T, Nkv, G, H = 1, 512, 2, 2, 128
    Nq = Nkv * G
    q = jnp.asarray(rng.normal(size=(B, Nq, H)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, Nkv, H)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, Nkv, H)).astype(np.float32))
    out1 = decode_attention(q, k, v, jnp.asarray(60, jnp.int32), chunk=128, interpret=True)
    k2 = k.at[:, 60:].set(1e4)
    v2 = v.at[:, 60:].set(-1e4)
    out2 = decode_attention(q, k2, v2, jnp.asarray(60, jnp.int32), chunk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)


def test_int8_matmul_matches_reference():
    from dia_tts_prune_tpu.ops.kernels.int8_matmul import (
        int8_matmul,
        int8_matmul_reference,
    )

    rng = np.random.default_rng(3)
    B, K, N = 2, 256, 640
    x = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
    w = jnp.asarray(rng.integers(-127, 128, (K, N)).astype(np.int8))
    s = jnp.asarray(rng.uniform(0.001, 0.01, N).astype(np.float32))
    out = int8_matmul(x, w, s, tile_n=256, interpret=True)
    ref = int8_matmul_reference(x, w, s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_int8_matmul_upcast_matches_reference():
    """The weight-only upcast path (int8 bytes in HBM, compute-dtype math) is
    mathematically dequantize-then-dot — must match the reference closely."""
    from dia_tts_prune_tpu.ops.kernels.int8_matmul import (
        int8_matmul_reference,
        int8_matmul_upcast,
    )

    rng = np.random.default_rng(7)
    B, K, N = 2, 256, 640
    w = jnp.asarray(rng.integers(-127, 128, (K, N)).astype(np.int8))
    s = jnp.asarray(rng.uniform(0.001, 0.01, N).astype(np.float32))
    x32 = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(int8_matmul_upcast(x32, w, s)),
        np.asarray(int8_matmul_reference(x32, w, s)),
        rtol=1e-5, atol=1e-5,
    )
    xbf = x32.astype(jnp.bfloat16)
    out = np.asarray(int8_matmul_upcast(xbf, w, s), np.float32)
    ref = np.asarray(int8_matmul_reference(xbf, w, s), np.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_int8_quantized_model_generates():
    """Packed int8 params run through the standard generate path (fallback
    dequant matmul on CPU) and produce tokens close to the fake-quant model."""
    from dia_tts_prune_tpu.config import tiny_test_config
    from dia_tts_prune_tpu.generate import DiaGenerator
    from dia_tts_prune_tpu.models.dia import init_params
    from dia_tts_prune_tpu.ops.quant import (
        quantize_params_int8,
        quantize_params_int8_packed,
    )

    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    fake = DiaGenerator(quantize_params_int8(params), cfg)
    packed = DiaGenerator(quantize_params_int8_packed(params), cfg)
    a = fake.generate_tokens("[S1] int8", max_tokens=40, temperature=0.0)
    b = packed.generate_tokens("[S1] int8", max_tokens=40, temperature=0.0)
    assert b.shape[1] == 9 and b.shape[0] > 0
    # same quantized weights, different accumulation order → near-identical tokens
    n = min(a.shape[0], b.shape[0])
    agreement = (a[:n] == b[:n]).mean()
    assert agreement > 0.9, agreement


@pytest.mark.parametrize("group", [None, 64])
def test_int4_matmul_matches_reference(group):
    """Plain and grouped int4 contractions equal dequantize-then-dot."""
    from dia_tts_prune_tpu.ops.kernels.int4_matmul import (
        int4_matmul_grouped,
        int4_matmul_reference,
        int4_matmul_upcast,
    )

    rng = np.random.default_rng(7)
    B, K, N = 2, 256, 192
    x = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
    if group is None:
        w = jnp.asarray(rng.integers(-7, 8, (K, N)).astype(np.int8)).astype(jnp.int4)
        s = jnp.asarray(rng.uniform(0.01, 0.1, (N,)).astype(np.float32))
        out = int4_matmul_upcast(x, w, s)
    else:
        w = jnp.asarray(
            rng.integers(-7, 8, (K // group, group, N)).astype(np.int8)).astype(jnp.int4)
        s = jnp.asarray(rng.uniform(0.01, 0.1, (K // group, N)).astype(np.float32))
        out = int4_matmul_grouped(x, w, s)
    ref = int4_matmul_reference(x, w, s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("group", [None, 16])
def test_int4_quantize_roundtrip(group):
    """quantize_int4 → dequantize4 reconstructs within the 4-bit grid error,
    for plain/stacked and 1-/2-axis contraction layouts."""
    from dia_tts_prune_tpu.ops.quant import dequantize4, quantize_int4

    rng = np.random.default_rng(8)
    w = jnp.asarray(rng.normal(size=(3, 32, 4, 48)).astype(np.float32)) * 0.05
    qk = quantize_int4(w, n_in=2, stacked=True, group=group)
    deq = dequantize4(qk)
    assert deq.shape == w.shape
    err = float(jnp.sqrt(jnp.mean((deq - w) ** 2)) / jnp.sqrt(jnp.mean(w**2)))
    assert err < 0.12, err
    # grouped scales must beat per-column scales on outlier-y weights
    if group is not None:
        qp = quantize_int4(w, n_in=2, stacked=True, group=None)
        errp = float(jnp.sqrt(jnp.mean((dequantize4(qp) - w) ** 2))
                     / jnp.sqrt(jnp.mean(w**2)))
        assert err <= errp + 1e-6, (err, errp)


@pytest.mark.parametrize("group", [None, 16])
def test_int4_nibble_matches_s4(group):
    """Nibble-packed int4 (two rows per int8 byte, parity-split dots) is
    bit-identical to the S4 layout: same quantized grid, same dequantized
    kernel, and the dense_general contraction matches the dequantize-then-dot
    reference."""
    from dia_tts_prune_tpu.ops.modules import dense_general
    from dia_tts_prune_tpu.ops.quant import dequantize4, quantize_int4

    rng = np.random.default_rng(9)
    w = jnp.asarray(rng.normal(size=(32, 48)).astype(np.float32)) * 0.05
    qk_s4 = quantize_int4(w, n_in=1, group=group)
    qk_nb = quantize_int4(w, n_in=1, group=group, nibble=True)
    assert qk_nb.nibble and qk_nb.values.dtype == jnp.int8
    assert qk_nb.values.shape == (16, 48)
    np.testing.assert_array_equal(
        np.asarray(dequantize4(qk_s4)), np.asarray(dequantize4(qk_nb)))
    x = jnp.asarray(rng.normal(size=(2, 32)).astype(np.float32))
    y_nb = dense_general(x, qk_nb, axis=(-1,))
    y_ref = x @ dequantize4(qk_s4)
    np.testing.assert_allclose(np.asarray(y_nb), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("halfsplit", [False, True])
def test_int4_nibble_model_generates_and_matches_s4(halfsplit):
    """A nibble-packed model runs the standard generate path and reproduces
    the S4-layout trajectory token-for-token (same quantized weights).

    With DIA_INT4_S4 on (default), the nibble run exercises the in-jit
    unpack-to-S4 path (generate._maybe_unpack_s4) — the serving default."""
    from dia_tts_prune_tpu.config import tiny_test_config
    from dia_tts_prune_tpu.generate import DiaGenerator
    from dia_tts_prune_tpu.models.dia import init_params
    from dia_tts_prune_tpu.ops.quant import quantize_params_int4_packed

    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    out_nb = DiaGenerator(
        quantize_params_int4_packed(params, group=16, nibble=True,
                                    halfsplit=halfsplit), cfg
    ).generate_tokens("[S1] nibble", max_tokens=40, temperature=0.0)
    out_s4 = DiaGenerator(
        quantize_params_int4_packed(params, group=16), cfg
    ).generate_tokens("[S1] nibble", max_tokens=40, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(out_nb), np.asarray(out_s4))


@pytest.mark.parametrize("halfsplit", [False, True])
@pytest.mark.parametrize("group", [None, 16])
def test_unpack_to_s4_matches_dequant(halfsplit, group):
    """unpack_to_s4 (in-jit nibble→S4 convert) preserves values/scales
    exactly: dequantizing the unpacked kernel equals dequantizing the
    nibble kernel, and dense_general through it matches the reference."""
    from dia_tts_prune_tpu.ops.modules import dense_general
    from dia_tts_prune_tpu.ops.quant import (
        dequantize4,
        quantize_int4,
        unpack_to_s4,
    )

    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.normal(size=(32, 24)).astype(np.float32))
    qk = quantize_int4(w, group=group, nibble=True, halfsplit=halfsplit)
    assert qk.nibble
    qs = jax.jit(unpack_to_s4)(qk)
    assert not qs.nibble and not qs.halfsplit
    np.testing.assert_array_equal(
        np.asarray(dequantize4(qk)), np.asarray(dequantize4(qs)))
    x = jnp.asarray(rng.normal(size=(2, 32)).astype(np.float32))
    y = jax.jit(lambda x, q: dense_general(x, q, axis=(-1,)))(x, qs)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x @ dequantize4(qk)), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("mode", ["int4", "hybrid"])
def test_int4_quantized_model_generates(mode):
    """int4-packed (and int4-MLP/int8-rest hybrid) params run the standard
    generate path and track the fake-quant int8 trajectory early on."""
    from dia_tts_prune_tpu.config import tiny_test_config
    from dia_tts_prune_tpu.generate import DiaGenerator
    from dia_tts_prune_tpu.models.dia import init_params
    from dia_tts_prune_tpu.ops.quant import (
        quantize_params_int4_packed,
        quantize_params_int8_packed,
    )

    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    if mode == "int4":
        qp = quantize_params_int4_packed(params, group=16)
    else:
        qp = quantize_params_int4_packed(params, group=16, mlp_only=True)
        qp = quantize_params_int8_packed(qp, fused=False)
    gen = DiaGenerator(qp, cfg)
    out = gen.generate_tokens("[S1] int4", max_tokens=40, temperature=0.0)
    assert out.shape[1] == 9 and out.shape[0] > 0
    assert int(jnp.max(out)) < cfg.model.tgt_vocab_size


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_matches_reference(causal):
    from dia_tts_prune_tpu.ops.kernels.flash_attention import (
        flash_attention,
        flash_attention_reference,
    )

    rng = np.random.default_rng(4)
    B, T, Nkv, G, H = 2, 512, 2, 2, 128
    Nq = Nkv * G
    q = jnp.asarray(rng.normal(size=(B, T, Nq, H)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, Nkv, H)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, Nkv, H)).astype(np.float32))
    seg = np.ones((B, T), np.int32)
    seg[0, :] = 0  # CFG unconditional row: all padding
    seg[1, 400:] = 0  # padding tail
    seg = jnp.asarray(seg)
    out = flash_attention(q, k, v, seg, seg, causal=causal,
                          block_q=128, block_k=256, interpret=True)
    ref = flash_attention_reference(q, k, v, seg, seg, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_attention_cross_shapes():
    """Tq != Tk (cross-attention over encoder output)."""
    from dia_tts_prune_tpu.ops.kernels.flash_attention import (
        flash_attention,
        flash_attention_reference,
    )

    rng = np.random.default_rng(5)
    B, Tq, Tk, N, H = 1, 256, 512, 4, 128
    q = jnp.asarray(rng.normal(size=(B, Tq, N, H)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Tk, N, H)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Tk, N, H)).astype(np.float32))
    sq = jnp.ones((B, Tq), jnp.int32)
    sk = jnp.asarray((np.arange(Tk) < 300).astype(np.int32))[None]
    out = flash_attention(q, k, v, sq, sk, block_q=128, block_k=256, interpret=True)
    ref = flash_attention_reference(q, k, v, sq, sk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_block_sparse_matmul_matches_dense():
    from dia_tts_prune_tpu.ops.kernels.sparse_matmul import (
        block_sparse_matmul,
        block_sparse_matmul_reference,
        plan_block_sparsity,
    )

    rng = np.random.default_rng(6)
    B, K, N = 2, 1024, 768
    bk = bn = 256
    w = rng.normal(size=(K, N)).astype(np.float32)
    # zero out ~60% of blocks
    for i in range(K // bk):
        for j in range(N // bn):
            if rng.random() < 0.6:
                w[i * bk:(i + 1) * bk, j * bn:(j + 1) * bn] = 0.0
    x = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
    plan = plan_block_sparsity(w, bk, bn)
    assert plan.density < 0.7
    out = block_sparse_matmul(x, jnp.asarray(w), plan.indices, plan.counts,
                              bk, bn, interpret=True)
    ref = block_sparse_matmul_reference(x, jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_block_sparse_all_zero_column():
    from dia_tts_prune_tpu.ops.kernels.sparse_matmul import (
        block_sparse_matmul,
        plan_block_sparsity,
    )

    rng = np.random.default_rng(7)
    B, K, N = 2, 512, 512
    w = rng.normal(size=(K, N)).astype(np.float32)
    w[:, 256:] = 0.0  # entire output tile column is zero
    x = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
    plan = plan_block_sparsity(w, 256, 256)
    out = np.asarray(block_sparse_matmul(x, jnp.asarray(w), plan.indices,
                                         plan.counts, 256, 256, interpret=True))
    assert np.abs(out[:, 256:]).max() == 0.0


def test_block_masks_align_with_kernel_blocks():
    from dia_tts_prune_tpu.config import tiny_test_config
    from dia_tts_prune_tpu.models.dia import init_params
    from dia_tts_prune_tpu.prune import apply_masks, block_masks, sparsity_report

    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    masks = block_masks(params, 0.5, block=(32, 64))
    pruned = apply_masks(params, masks)
    rep = sparsity_report(pruned)
    assert 0.35 < rep["sparsity"] < 0.65  # blocky granularity ≈ target
    # zero structure is block-aligned on a sample kernel
    w = np.asarray(pruned["decoder"]["layers"]["mlp"]["wo"]["kernel"][0])  # [F, D]
    zb = (w == 0).reshape(w.shape[0] // 32, 32, w.shape[1] // 64, 64)
    per_block = zb.all(axis=(1, 3)) | (~zb.any(axis=(1, 3)))
    assert per_block.all()  # every block fully zero or fully dense

    # pruned model still generates
    from dia_tts_prune_tpu.generate import DiaGenerator

    gen = DiaGenerator(pruned, cfg)
    out = gen.generate_tokens("[S1] blocky", max_tokens=32, temperature=0.0)
    assert out.shape[0] > 0


def test_int8_matmul_xla_close_to_dequant():
    from dia_tts_prune_tpu.ops.kernels.int8_matmul import (
        int8_matmul_reference,
        int8_matmul_xla,
    )

    rng = np.random.default_rng(8)
    B, K, N = 2, 512, 384
    x = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
    w = jnp.asarray(rng.integers(-127, 128, (K, N)).astype(np.int8))
    s = jnp.asarray(rng.uniform(0.001, 0.01, N).astype(np.float32))
    a = np.asarray(int8_matmul_xla(x, w, s))
    b = np.asarray(int8_matmul_reference(x, w, s))
    # activation quantization adds ~1% relative error
    rel = np.abs(a - b) / (np.abs(b).max() + 1e-9)
    assert rel.max() < 0.03, rel.max()


def test_decode_step_scan_matches_unrolled():
    """Scan-over-layers decode step (prefix attention + current-token
    correction, deferred cache write) must match the unrolled decode_step."""
    from dia_tts_prune_tpu.config import tiny_test_config
    from dia_tts_prune_tpu.models.dia import (
        decode_step,
        decode_step_scan,
        init_params,
        new_self_cache,
        precompute_cross_cache,
        encoder_forward,
    )
    from dia_tts_prune_tpu.state import cross_attention_mask, new_encoder_state

    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 200, (2, cfg.data.text_length)).astype(np.int32)
    ids[0, :] = 0
    es = new_encoder_state(cfg, jnp.asarray(ids))
    enc_out = encoder_forward(params, cfg, jnp.asarray(ids), es.positions, es.attn_mask)
    ccache = precompute_cross_cache(params, cfg, enc_out, es.positions)
    cmask = cross_attention_mask(es.padding_mask)

    cache_a = new_self_cache(cfg, 2)
    cache_b = new_self_cache(cfg, 2)
    for t in range(1, 7):
        tok = jnp.asarray(rng.integers(0, 1024, (1, 9)).astype(np.int32))
        tgt = jnp.broadcast_to(tok[None], (2, 1, 9))
        pos = jnp.full((2, 1), t, jnp.int32)
        la, cache_a = decode_step(params, cfg, tgt, pos, jnp.asarray(t - 1, jnp.int32),
                                  cache_a, ccache, cmask)
        lb, cache_b = decode_step_scan(params, cfg, tgt, pos, jnp.asarray(t - 1, jnp.int32),
                                       cache_b, ccache, cmask)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cache_a.k), np.asarray(cache_b.k), rtol=1e-5, atol=1e-6)


def test_flash_integration_inference_paths(monkeypatch):
    """The flash-routed inference paths (encoder forward + voice-clone
    generation with its decoder prefill) must match the masked-XLA path.
    Training deliberately keeps the XLA path (the flash kernel has no VJP)."""
    from dia_tts_prune_tpu.config import tiny_test_config
    from dia_tts_prune_tpu.generate import DiaGenerator
    from dia_tts_prune_tpu.models.dia import encoder_forward, init_params
    from dia_tts_prune_tpu.state import new_encoder_state

    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 200, (2, cfg.data.text_length)).astype(np.int32)
    ids[0, :] = 0
    ids[1, 70:] = 0
    es = new_encoder_state(cfg, jnp.asarray(ids))
    base = np.asarray(
        encoder_forward(params, cfg, jnp.asarray(ids), es.positions, es.attn_mask)
    )
    monkeypatch.setenv("DIA_FLASH_INTERPRET", "1")
    flash = np.asarray(
        encoder_forward(params, cfg, jnp.asarray(ids), es.positions, es.attn_mask)
    )
    np.testing.assert_allclose(flash, base, rtol=1e-4, atol=1e-5)

    # prompted generation exercises the prefill path end-to-end
    monkeypatch.delenv("DIA_FLASH_INTERPRET")
    gen = DiaGenerator(params, cfg)
    prompt = rng.integers(0, 1024, (40, 9)).astype(np.int32)
    base_tok = gen.generate_tokens("[S2] x", max_tokens=80, temperature=0.0,
                                   audio_prompt_codes=prompt, audio_prompt_text="[S1] p")
    monkeypatch.setenv("DIA_FLASH_INTERPRET", "1")
    flash_tok = gen.generate_tokens("[S2] x", max_tokens=80, temperature=0.0,
                                    audio_prompt_codes=prompt, audio_prompt_text="[S1] p")
    np.testing.assert_array_equal(flash_tok, base_tok)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_backward_matches_autodiff(causal):
    """Gradients through flash_attention_trainable (custom VJP, recompute-p
    backward kernels) must match jax.grad through the masked-XLA reference."""
    from dia_tts_prune_tpu.ops.kernels.flash_attention import (
        flash_attention_reference,
        flash_attention_trainable,
    )

    rng = np.random.default_rng(10)
    B, T, Nkv, G, H = 2, 256, 2, 2, 128
    Nq = Nkv * G
    q = jnp.asarray(rng.normal(size=(B, T, Nq, H)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.normal(size=(B, T, Nkv, H)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.normal(size=(B, T, Nkv, H)).astype(np.float32)) * 0.3
    seg = np.ones((B, T), np.int32)
    seg[0, 200:] = 0
    seg = jnp.asarray(seg)
    cot = jnp.asarray(rng.normal(size=(B, T, Nq, H)).astype(np.float32))

    def loss_flash(q, k, v):
        out = flash_attention_trainable(q, k, v, seg, seg, causal, 128, 128, True)
        return jnp.sum(out * cot)

    def loss_ref(q, k, v):
        return jnp.sum(flash_attention_reference(q, k, v, seg, seg, causal=causal) * cot)

    f_out = loss_flash(q, k, v)
    r_out = loss_ref(q, k, v)
    np.testing.assert_allclose(float(f_out), float(r_out), rtol=1e-4)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4,
            err_msg=f"{name} mismatch (causal={causal})",
        )


def test_flash_training_loss_and_grads_match(monkeypatch):
    """Training loss AND gradients through the flash path (interpret) must
    match the masked-XLA path — the full compute_loss graph."""
    from dia_tts_prune_tpu.config import tiny_test_config
    from dia_tts_prune_tpu.models.dia import init_params
    from dia_tts_prune_tpu.train import build_train_batch, compute_loss

    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    text = rng.integers(1, 200, (2, cfg.data.text_length)).astype(np.int32)
    text[:, 60:] = 0
    codes = [rng.integers(0, 1024, (80, 9)).astype(np.int32) for _ in range(2)]
    batch = {k: jnp.asarray(v) for k, v in build_train_batch(cfg, text, codes).items()}

    def loss_fn(p):
        return compute_loss(p, cfg, batch)

    base_loss, base_grads = jax.value_and_grad(loss_fn)(params)
    monkeypatch.setenv("DIA_FLASH_INTERPRET", "1")
    flash_loss, flash_grads = jax.value_and_grad(loss_fn)(params)

    np.testing.assert_allclose(float(flash_loss), float(base_loss), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(base_grads), jax.tree.leaves(flash_grads)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3, atol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_ragged_lengths(causal):
    """T not divisible by the block size must still match the reference
    (regression: pl.ds clamping made tail blocks read wrong segment ids)."""
    from dia_tts_prune_tpu.ops.kernels.flash_attention import (
        flash_attention,
        flash_attention_reference,
        flash_attention_trainable,
    )

    rng = np.random.default_rng(11)
    B, T, Nkv, G, H = 2, 320, 2, 2, 128  # 320 % 256 != 0
    Nq = Nkv * G
    q = jnp.asarray(rng.normal(size=(B, T, Nq, H)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.normal(size=(B, T, Nkv, H)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.normal(size=(B, T, Nkv, H)).astype(np.float32)) * 0.3
    seg = np.ones((B, T), np.int32)
    seg[1, 250:] = 0
    seg = jnp.asarray(seg)
    out = flash_attention(q, k, v, seg, seg, causal=causal,
                          block_q=256, block_k=256, interpret=True)
    ref = flash_attention_reference(q, k, v, seg, seg, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    # gradients through the padded path
    cot = jnp.asarray(rng.normal(size=(B, T, Nq, H)).astype(np.float32))
    gf = jax.grad(lambda q, k, v: jnp.sum(
        flash_attention_trainable(q, k, v, seg, seg, causal, 256, 256, True) * cot
    ), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(
        flash_attention_reference(q, k, v, seg, seg, causal=causal) * cot
    ), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)
