"""fp32 numerical parity: JAX model vs the (Q11-patched) torch reference.

Weights are random-initialized in the reference torch model, exported via its
``state_dict()``, and converted with ``checkpoint.convert_torch_state_dict``;
encoder forward, teacher-forced decoder forward, and step-by-step decode are
then compared at fp32 (BASELINE.json: seeded outputs token-match at fp32).
"""

import numpy as np
import pytest

from .ref_loader import load_reference, reference_available, tiny_ref_config

pytestmark = pytest.mark.skipif(not reference_available(), reason="torch reference unavailable")


@pytest.fixture(scope="module")
def ref_setup():
    import torch

    cfg_mod, st, ly, au = load_reference()
    torch.manual_seed(0)
    ref_cfg = tiny_ref_config(cfg_mod)
    model = ly.DiaModel(ref_cfg, torch.float32)
    with torch.no_grad():
        for p in model.parameters():
            torch.nn.init.normal_(p, std=0.05)
    model.eval()

    from dia_tts_prune_tpu.checkpoint import convert_torch_state_dict
    from dia_tts_prune_tpu.config import DiaConfig

    jcfg = DiaConfig.model_validate(ref_cfg.model_dump())
    params = convert_torch_state_dict(model.state_dict(), jcfg)
    return model, ref_cfg, jcfg, params, (cfg_mod, st, ly, au)


def _ref_encoder_out(model, ref_cfg, st, enc_input_np):
    import torch

    enc_input = torch.from_numpy(enc_input_np).long()
    enc_state = st.EncoderInferenceState.new(ref_cfg, enc_input)
    with torch.inference_mode():
        out = model.encoder(enc_input, enc_state)
    return out, enc_state


def test_encoder_parity(ref_setup):
    import jax.numpy as jnp

    from dia_tts_prune_tpu.models.dia import encoder_forward
    from dia_tts_prune_tpu.state import new_encoder_state

    model, ref_cfg, jcfg, params, (cfg_mod, st, ly, au) = ref_setup
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 200, (2, ref_cfg.data.text_length)).astype(np.int64)
    ids[:, 100:] = 0  # padding tail
    ids[0, :] = 0  # CFG unconditional row

    ref_out, _ = _ref_encoder_out(model, ref_cfg, st, ids)

    es = new_encoder_state(jcfg, jnp.asarray(ids))
    ours = encoder_forward(params, jcfg, jnp.asarray(ids), es.positions, es.attn_mask)
    np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(), rtol=1e-4, atol=1e-6)


def test_decoder_teacher_forced_parity(ref_setup):
    import jax.numpy as jnp
    import torch

    from dia_tts_prune_tpu.models.dia import decoder_forward
    from dia_tts_prune_tpu.state import cross_attention_mask, new_encoder_state

    model, ref_cfg, jcfg, params, (cfg_mod, st, ly, au) = ref_setup
    rng = np.random.default_rng(1)
    T_text, T_dec, C = ref_cfg.data.text_length, 24, ref_cfg.data.channels
    ids = rng.integers(1, 200, (2, T_text)).astype(np.int64)
    ids[0, :] = 0
    tgt = rng.integers(0, 1024, (2, T_dec, C)).astype(np.int64)

    # --- reference ---
    ref_enc_out, enc_state = _ref_encoder_out(model, ref_cfg, st, ids)
    with torch.inference_mode():
        cross_cache = model.decoder.precompute_cross_attn_cache(ref_enc_out, enc_state.positions)
        dec_state = st.DecoderInferenceState.new(
            ref_cfg, enc_state, ref_enc_out, cross_cache, torch.float32
        )
        dec_state.prepare_step(0, T_dec)
        ref_logits = model.decoder.forward(torch.from_numpy(tgt), dec_state).numpy()

    # --- ours ---
    es = new_encoder_state(jcfg, jnp.asarray(ids))
    from dia_tts_prune_tpu.models.dia import encoder_forward

    enc_out = encoder_forward(params, jcfg, jnp.asarray(ids), es.positions, es.attn_mask)
    dec_positions = jnp.broadcast_to(jnp.arange(T_dec, dtype=jnp.int32)[None], (2, T_dec))
    ours = decoder_forward(
        params, jcfg, jnp.asarray(tgt), enc_out, es.positions, dec_positions,
        None, cross_attention_mask(es.padding_mask),
    )
    np.testing.assert_allclose(np.asarray(ours), ref_logits, rtol=1e-4, atol=1e-5)
    # argmax agreement: with HIGHEST-precision fp32 contractions the logits
    # are near-bit-exact; allow a vanishing tie-flip allowance
    assert (np.asarray(ours).argmax(-1) == ref_logits.argmax(-1)).mean() > 0.9999


def test_decode_step_parity(ref_setup):
    """Step-by-step decode: logits match the reference KV-cached path."""
    import jax.numpy as jnp
    import torch

    from dia_tts_prune_tpu.models.dia import (
        decode_step,
        encoder_forward,
        new_self_cache,
        precompute_cross_cache,
    )
    from dia_tts_prune_tpu.state import cross_attention_mask, new_encoder_state

    model, ref_cfg, jcfg, params, (cfg_mod, st, ly, au) = ref_setup
    rng = np.random.default_rng(2)
    T_text, C = ref_cfg.data.text_length, ref_cfg.data.channels
    ids = rng.integers(1, 200, (2, T_text)).astype(np.int64)
    ids[0, :] = 0
    n_steps = 6
    driven_tokens = rng.integers(0, 1024, (n_steps, C)).astype(np.int64)

    # --- reference ---
    ref_enc_out, enc_state = _ref_encoder_out(model, ref_cfg, st, ids)
    with torch.inference_mode():
        cross_cache = model.decoder.precompute_cross_attn_cache(ref_enc_out, enc_state.positions)
        dec_state = st.DecoderInferenceState.new(
            ref_cfg, enc_state, ref_enc_out, cross_cache, torch.float32
        )
        ref_logits = []
        for t in range(1, n_steps + 1):
            dec_state.prepare_step(t)
            tok = torch.from_numpy(driven_tokens[t - 1][None, None]).expand(2, 1, C)
            ref_logits.append(model.decoder.decode_step(tok, dec_state).numpy()[:, 0])
    ref_logits = np.stack(ref_logits)

    # --- ours ---
    es = new_encoder_state(jcfg, jnp.asarray(ids))
    enc_out = encoder_forward(params, jcfg, jnp.asarray(ids), es.positions, es.attn_mask)
    ccache = precompute_cross_cache(params, jcfg, enc_out, es.positions)
    cmask = cross_attention_mask(es.padding_mask)
    cache = new_self_cache(jcfg, 2)
    ours = []
    for t in range(1, n_steps + 1):
        tok = jnp.broadcast_to(jnp.asarray(driven_tokens[t - 1])[None, None], (2, 1, C))
        pos = jnp.full((2, 1), t, dtype=jnp.int32)
        logits, cache = decode_step(
            params, jcfg, tok, pos, jnp.asarray(t - 1, jnp.int32), cache, ccache, cmask
        )
        ours.append(np.asarray(logits[:, 0]))
    ours = np.stack(ours)

    np.testing.assert_allclose(ours, ref_logits, rtol=1e-4, atol=1e-5)
    assert (ours.argmax(-1) == ref_logits.argmax(-1)).all()


def test_checkpoint_round_trip(ref_setup):
    """params → torch schema → params is exact."""
    import jax

    from dia_tts_prune_tpu.checkpoint import convert_torch_state_dict, to_torch_state_dict

    _, _, jcfg, params, _ = ref_setup
    sd = to_torch_state_dict(params, jcfg)
    back = convert_torch_state_dict(sd, jcfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_skip_uncond_cross_is_exact():
    """The CFG uncond-half cross-attention skip (decode-step bandwidth
    optimization) must be bit-exact: the uncond rows' cross outputs are
    exactly zero under the all-False mask, so skipping the compute + cache
    reads changes nothing."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dia_tts_prune_tpu.config import tiny_test_config
    from dia_tts_prune_tpu.models.dia import (
        decode_step, decode_step_scan, decode_window, init_params,
        new_self_cache, precompute_cross_cache,
    )

    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    d = cfg.data
    B, S = 2, 32
    enc_out = jax.random.normal(jax.random.PRNGKey(1), (B, S, cfg.model.encoder.n_embd))
    enc_pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    cross = precompute_cross_cache(params, cfg, enc_out, enc_pos)
    # CFG structure: row 0 (uncond) fully masked, row 1 attends everything
    cmask = jnp.stack([jnp.zeros((S,), bool), jnp.ones((S,), bool)])[:, None, None, :]
    cache = new_self_cache(cfg, B, max_len=64)
    tgt = jnp.full((B, 1, d.channels), 42, jnp.int32)
    pos = jnp.full((B, 1), 3, jnp.int32)
    slot = jnp.asarray(2, jnp.int32)

    for fn in (decode_step, decode_step_scan):
        base, c0 = fn(params, cfg, tgt, pos, slot, cache, cross, cmask)
        fast, c1 = fn(params, cfg, tgt, pos, slot, cache, cross, cmask,
                      skip_uncond_cross=True)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(fast))
        np.testing.assert_array_equal(np.asarray(c0.k), np.asarray(c1.k))

    rows = jnp.full((B, 4, d.channels), 42, jnp.int32)
    base, _ = decode_window(params, cfg, rows, jnp.asarray(2, jnp.int32),
                            cache, cross, cmask)
    fast, _ = decode_window(params, cfg, rows, jnp.asarray(2, jnp.int32),
                            cache, cross, cmask, skip_uncond_cross=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(fast))
