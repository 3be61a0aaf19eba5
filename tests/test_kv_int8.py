"""int8 self-attention KV cache (models.dia.QuantKVCache): quantization
bounds, step-level closeness vs the bf16/f32 cache, and end-to-end parity of
the forced-quant generation paths.

The quant cache halves per-step cache HBM reads on the TPU serving path
(docs/PERF.md); these tests pin the numerics contract on CPU."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dia_tts_prune_tpu.config import tiny_test_config
from dia_tts_prune_tpu.models.dia import (
    QuantKVCache,
    decode_step_scan,
    encoder_forward,
    init_params,
    new_self_cache,
    precompute_cross_cache,
    quantize_kv,
)
from dia_tts_prune_tpu.ops.quant import quantize_params_int8_packed
from dia_tts_prune_tpu.state import new_encoder_state


@pytest.fixture(scope="module")
def packed():
    config = tiny_test_config()
    params = init_params(config, jax.random.PRNGKey(0), jnp.float32)
    return quantize_params_int8_packed(params, fused=False), config


def test_quantize_kv_roundtrip_bound():
    """Dequantized values land within half a quantization step."""
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 4, 128))
    q, s = quantize_kv(x)
    assert q.dtype == jnp.int8 and s.shape == (3, 5, 4)
    deq = np.asarray(q, np.float32) * np.asarray(s)[..., None]
    err = np.abs(deq - np.asarray(x))
    assert err.max() <= float(np.asarray(s).max()) * 0.5 + 1e-7


def test_quant_cache_step_close_to_f32_cache(packed):
    """One scan decode step over identical cache contents: int8-cache logits
    stay within 2% relative of the f32-cache logits, and the returned cache
    preserves the QuantKVCache layout with the new slot written."""
    params, config = packed
    dec = config.model.decoder
    B, T, W = 2, 32, 10
    cache_f = new_self_cache(config, B, max_len=T, dtype=jnp.float32)
    cache_q = new_self_cache(config, B, max_len=T, quant=True)
    shape = (dec.n_layer, B, W, dec.kv_heads, dec.gqa_head_dim)
    kseed = jax.random.normal(jax.random.PRNGKey(3), shape)
    vseed = jax.random.normal(jax.random.PRNGKey(4), shape)
    cache_f = type(cache_f)(k=cache_f.k.at[:, :, :W].set(kseed),
                            v=cache_f.v.at[:, :, :W].set(vseed))
    kq, ks = quantize_kv(kseed)
    vq, vs = quantize_kv(vseed)
    cache_q = QuantKVCache(
        k=cache_q.k.at[:, :, :W].set(kq), v=cache_q.v.at[:, :, :W].set(vq),
        ks=cache_q.ks.at[:, :, :W].set(ks), vs=cache_q.vs.at[:, :, :W].set(vs))

    enc = jnp.zeros((B, 16), jnp.int32)
    st = new_encoder_state(config, enc)
    eo = encoder_forward(params, config, enc, st.positions, st.attn_mask, jnp.float32)
    cc = precompute_cross_cache(params, config, eo, st.positions)
    tgt = jnp.ones((B, 1, config.data.channels), jnp.int32)
    pos = jnp.full((B, 1), W, jnp.int32)

    lf, _ = decode_step_scan(params, config, tgt, pos, jnp.int32(W), cache_f, cc, None)
    lq, new_q = decode_step_scan(params, config, tgt, pos, jnp.int32(W), cache_q, cc, None)
    rel = np.abs(np.asarray(lf) - np.asarray(lq)).max() / np.abs(np.asarray(lf)).max()
    assert rel < 0.02, rel
    assert isinstance(new_q, QuantKVCache)
    # the new slot was committed: its scales are nonzero
    assert np.asarray(new_q.ks[:, :, W]).min() > 0


def test_quant_cross_step_close_and_exact_zero_rows(packed):
    """Scan step with an int8-quantized CROSS cache: logits stay within 2%
    of the bf16-cross run, and a fully-masked row (the CFG unconditional
    branch) still yields the bf16 path's exact behavior (masked softmax
    zero rule carried into _sdpa_quant)."""
    params, config = packed
    from dia_tts_prune_tpu.models.dia import quantize_kv as qkv

    B, T, W = 2, 32, 4
    cache = new_self_cache(config, B, max_len=T, dtype=jnp.float32)
    enc = jnp.zeros((B, 16), jnp.int32)
    st = new_encoder_state(config, enc)
    eo = encoder_forward(params, config, enc, st.positions, st.attn_mask, jnp.float32)
    cc = precompute_cross_cache(params, config, eo, st.positions)
    kq, ks = qkv(cc.k)
    vq, vs = qkv(cc.v)
    ccq = QuantKVCache(k=kq, v=vq, ks=ks, vs=vs)
    # row 0 fully masked (uncond), row 1 attends everything
    mask = jnp.asarray([False, True])[:, None, None, None] & jnp.ones(
        (B, 1, 1, eo.shape[1]), bool)
    tgt = jnp.ones((B, 1, config.data.channels), jnp.int32)
    pos = jnp.full((B, 1), W, jnp.int32)
    lf, _ = decode_step_scan(params, config, tgt, pos, jnp.int32(W), cache, cc, mask)
    lq, _ = decode_step_scan(params, config, tgt, pos, jnp.int32(W), cache, ccq, mask)
    rel = np.abs(np.asarray(lf) - np.asarray(lq)).max() / np.abs(np.asarray(lf)).max()
    assert rel < 0.02, rel


def test_e2e_quant_matches_bf16_cache_greedy(packed):
    """Forced-on int8 cache vs forced-off: greedy tokens agree on the tiny
    config (quantization noise is far below argmax margins here); both runs
    produce valid token grids either way."""
    params, config = packed
    from dia_tts_prune_tpu.generate import DiaGenerator, _kv_cache_quant

    text = "[S1] kv cache int8."
    os.environ["DIA_KV_INT8"] = "1"
    try:
        assert _kv_cache_quant(params)
        out_q = np.asarray(DiaGenerator(params, config, "float32")
                           .generate_tokens(text, max_tokens=32, temperature=0.0))
    finally:
        os.environ["DIA_KV_INT8"] = "0"
    try:
        assert not _kv_cache_quant(params)
        out_f = np.asarray(DiaGenerator(params, config, "float32")
                           .generate_tokens(text, max_tokens=32, temperature=0.0))
    finally:
        del os.environ["DIA_KV_INT8"]
    assert out_q.shape[1] == config.data.channels
    np.testing.assert_array_equal(out_q, out_f)


def test_e2e_quant_batched_matches_single(packed):
    """Batched + int8 cache: every stream equals its single-stream run (the
    serving-path invariant, now under the quant cache too)."""
    params, config = packed
    from dia_tts_prune_tpu.generate import DiaGenerator

    os.environ["DIA_KV_INT8"] = "1"
    try:
        gen = DiaGenerator(params, config, "float32")
        texts = ["[S1] quant batch one", "[S2] quant batch two longer"]
        singles = [np.asarray(gen.generate_tokens(t, max_tokens=32, temperature=0.0))
                   for t in texts]
        batched = gen.generate_tokens_batch(texts, max_tokens=32, temperature=0.0)
        for got, want in zip(batched, singles):
            np.testing.assert_array_equal(np.asarray(got), want)
    finally:
        del os.environ["DIA_KV_INT8"]


def test_e2e_quant_batched_voice_clone_matches_single(packed):
    """Batched voice-clone under the quant cache: right-aligned prompts give
    per-row valid_from windows; the quant scales must mask identically to
    the bf16 path — each prompted stream equals its single-stream quant run."""
    params, config = packed
    from dia_tts_prune_tpu.generate import DiaGenerator

    os.environ["DIA_KV_INT8"] = "1"
    try:
        gen = DiaGenerator(params, config, "float32")
        C = config.data.channels
        prompts = [np.ones((10, C), np.int32), np.full((6, C), 2, np.int32)]
        texts = ["[S1] clone a", "[S2] clone b longer text"]
        ptexts = ["[S1] pa.", "[S2] pb."]
        singles = [
            np.asarray(gen.generate_tokens(
                t, max_tokens=40, temperature=0.0,
                audio_prompt_codes=p, audio_prompt_text=pt))
            for t, p, pt in zip(texts, prompts, ptexts)
        ]
        batched = gen.generate_tokens_batch(
            texts, max_tokens=40, temperature=0.0,
            audio_prompt_codes=prompts, audio_prompt_texts=ptexts)
        for got, want in zip(batched, singles):
            np.testing.assert_array_equal(np.asarray(got), want)
    finally:
        del os.environ["DIA_KV_INT8"]


def test_e2e_quant_voice_clone_prefill(packed):
    """Voice-clone prefill writes quantized K/V (decoder_prefill path) and
    the continuation decodes cleanly."""
    params, config = packed
    from dia_tts_prune_tpu.generate import DiaGenerator

    os.environ["DIA_KV_INT8"] = "1"
    try:
        gen = DiaGenerator(params, config, "float32")
        prompt = np.ones((12, config.data.channels), np.int32)
        out = np.asarray(gen.generate_tokens(
            "[S1] cloned continuation.", max_tokens=48, temperature=0.0,
            audio_prompt_codes=prompt, audio_prompt_text="[S1] hello."))
        assert out.shape[1] == config.data.channels
        assert (out >= 0).all() and (out < 1028).all()
    finally:
        del os.environ["DIA_KV_INT8"]
