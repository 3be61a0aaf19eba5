"""Top-level Dia API tests: constructors, generate→wav, save/load audio,
checkpoint loading in reference format."""

import numpy as np
import pytest

from dia_tts_prune_tpu.api import Dia
from dia_tts_prune_tpu.config import tiny_test_config
from dia_tts_prune_tpu.models.dac import DACConfig, init_dac_params

import jax


@pytest.fixture(scope="module")
def tiny_dia():
    cfg = tiny_test_config()
    dia = Dia.random_init(cfg, seed=0)
    # small DAC but with the full 9 codebooks / 1024-code vocab the Dia model emits
    dia.dac_config = DACConfig(
        encoder_dim=8, encoder_rates=(2, 4), decoder_dim=32, decoder_rates=(4, 2),
        n_codebooks=9, codebook_size=1024, codebook_dim=4,
    )
    dia.dac_params = init_dac_params(dia.dac_config, jax.random.PRNGKey(1))
    return dia


def test_generate_waveform(tiny_dia):
    wav = tiny_dia.generate("[S1] Hello.", max_tokens=48, temperature=0.0)
    assert wav is not None
    assert wav.ndim == 1
    assert wav.dtype == np.float32
    assert np.isfinite(wav).all()
    # length = generated frames * hop
    assert wav.shape[0] % tiny_dia.dac_config.hop_length == 0


def test_generate_requires_dac(tiny_dia):
    dia2 = Dia(tiny_dia.config, tiny_dia.params)
    with pytest.raises(RuntimeError):
        dia2.generate("[S1] x", max_tokens=32, temperature=0.0)
    # codes-only path works without DAC
    codes = dia2.generate_codes("[S1] x", max_tokens=32, temperature=0.0)
    assert codes.shape[1] == 9


def test_save_and_load_audio_round_trip(tiny_dia, tmp_path):
    wav = tiny_dia.generate("[S1] audio io", max_tokens=48, temperature=0.0)
    p = tmp_path / "out.wav"
    tiny_dia.save_audio(p, wav, tiny_dia.dac_config.sample_rate)
    assert p.exists()
    codes = tiny_dia.load_audio(p)
    assert codes.ndim == 2
    assert codes.shape[1] == tiny_dia.dac_config.n_codebooks


def test_voice_clone_path(tiny_dia, tmp_path):
    wav = tiny_dia.generate("[S1] prompt speech", max_tokens=48, temperature=0.0)
    p = tmp_path / "prompt.wav"
    tiny_dia.save_audio(p, wav, tiny_dia.dac_config.sample_rate)
    out = tiny_dia.generate(
        "[S2] continuation", max_tokens=64, temperature=0.0,
        audio_prompt=str(p), audio_prompt_text="[S1] prompt speech",
    )
    assert out is not None and out.ndim == 1


def test_from_local_torch_checkpoint(tiny_dia, tmp_path):
    """Reference-format save → from_local load round trip."""
    torch = pytest.importorskip("torch")
    from dia_tts_prune_tpu.checkpoint import to_torch_state_dict

    sd = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in
          to_torch_state_dict(tiny_dia.params, tiny_dia.config).items()}
    torch.save(sd, tmp_path / "pytorch_model.bin")
    tiny_dia.config.save(tmp_path / "config.json")

    dia2 = Dia.from_local(tmp_path / "config.json", tmp_path / "pytorch_model.bin")
    a = tiny_dia.generate_codes("[S1] ckpt", max_tokens=40, temperature=0.0)
    b = dia2.generate_codes("[S1] ckpt", max_tokens=40, temperature=0.0)
    np.testing.assert_array_equal(a, b)


def test_from_pretrained_local_dir(tiny_dia, tmp_path):
    torch = pytest.importorskip("torch")
    from dia_tts_prune_tpu.checkpoint import to_torch_state_dict

    sd = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in
          to_torch_state_dict(tiny_dia.params, tiny_dia.config).items()}
    torch.save(sd, tmp_path / "pytorch_model.bin")
    tiny_dia.config.save(tmp_path / "config.json")
    dia2 = Dia.from_pretrained(str(tmp_path))
    assert dia2.config == tiny_dia.config


def test_save_pretrained_round_trip(tiny_dia, tmp_path):
    tiny_dia.save_pretrained(tmp_path / "saved")
    assert (tmp_path / "saved" / "model.safetensors").exists()
    assert (tmp_path / "saved" / "dac_config.json").exists()  # non-default codec
    assert (tmp_path / "saved" / "dac.safetensors").exists()  # bundled codec weights
    dia2 = Dia.from_pretrained(str(tmp_path / "saved"))
    assert dia2.dac_config == tiny_dia.dac_config
    a = tiny_dia.generate_codes("[S1] sp", max_tokens=32, temperature=0.0)
    b = dia2.generate_codes("[S1] sp", max_tokens=32, temperature=0.0)
    np.testing.assert_array_equal(a, b)
    # the dir is fully self-contained: waveform generation works with no
    # external DAC checkpoint, and the bundled codec matches exactly
    wav_a = tiny_dia.generate("[S1] sp", max_tokens=32, temperature=0.0)
    wav_b = dia2.generate("[S1] sp", max_tokens=32, temperature=0.0)
    np.testing.assert_allclose(wav_a, wav_b, atol=1e-6)


def test_save_pretrained_without_dac_bundle(tiny_dia, tmp_path):
    tiny_dia.save_pretrained(tmp_path / "nodac", include_dac=False)
    assert not (tmp_path / "nodac" / "dac.safetensors").exists()
    dia2 = Dia.from_pretrained(str(tmp_path / "nodac"))
    assert dia2.dac_params is None


def test_adapter_load_unload_switch(tiny_dia, tmp_path):
    import jax

    from dia_tts_prune_tpu.lora import LoraConfig, init_lora, save_adapter

    base = tiny_dia.generate_codes("[S1] ad", max_tokens=32, temperature=0.0)
    for i, name in enumerate(("a1", "a2")):
        ad = init_lora(tiny_dia.params, LoraConfig(r=2), jax.random.PRNGKey(i))
        ad["weights"] = jax.tree.map(lambda x: x + 0.02 * (i + 1), ad["weights"])
        save_adapter(tmp_path / name, ad)

    tiny_dia.load_adapter_weights(tmp_path / "a1")
    out1 = tiny_dia.generate_codes("[S1] ad", max_tokens=32, temperature=0.0)
    tiny_dia.set_adapter(tmp_path / "a2")  # unloads a1, fuses a2
    out2 = tiny_dia.generate_codes("[S1] ad", max_tokens=32, temperature=0.0)
    tiny_dia.unload_adapter()
    out3 = tiny_dia.generate_codes("[S1] ad", max_tokens=32, temperature=0.0)
    assert not np.array_equal(base, out1) or base.shape != out1.shape
    assert not np.array_equal(out1, out2) or out1.shape != out2.shape
    np.testing.assert_array_equal(base, out3)  # exact unmerge restores base


def test_orbax_checkpoint_round_trip(tiny_dia, tmp_path):
    import jax

    from dia_tts_prune_tpu.checkpoint import restore_checkpoint, save_checkpoint

    save_checkpoint(tmp_path / "orbax", {"params": tiny_dia.params}, step=3)
    template = {"params": jax.tree.map(lambda x: x, tiny_dia.params)}
    restored = restore_checkpoint(tmp_path / "orbax" / "step_3", template)
    for a, b in zip(jax.tree.leaves(tiny_dia.params), jax.tree.leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_audio_stream_matches_offline(tiny_dia):
    """Streamed audio (with overlap + lookahead) must match the offline
    decode sample-for-sample up to conv boundary tolerance."""
    text = "[S1] audio streaming"
    offline = tiny_dia.generate(text, max_tokens=96, temperature=0.0)
    chunks = list(tiny_dia.generate_stream(text, segment_steps=24, max_tokens=96,
                                           temperature=0.0, overlap_frames=32,
                                           lookahead_frames=32))
    assert len(chunks) > 1
    streamed = np.concatenate(chunks)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, atol=1e-4)


def test_reference_generate_signature_compat(tiny_dia):
    """Code written against the reference API (including its
    use_torch_compile flag) must run unchanged."""
    wav = tiny_dia.generate(
        "[S1] compat", max_tokens=40, cfg_scale=3.0, temperature=0.0,
        top_p=0.95, use_torch_compile=True, cfg_filter_top_k=35,
        audio_prompt=None, audio_prompt_text=None, seed=42, verbose=False,
    )
    assert wav is not None


def test_chunked_decode_matches_whole_array(tiny_dia):
    """_decode_waveform's fixed-shape chunking must equal the whole-array
    codec decode exactly (receptive-field-safe overlap/lookahead)."""
    import jax.numpy as jnp

    from dia_tts_prune_tpu.models.dac import decode_codes

    rng = np.random.default_rng(5)
    # tiny DAC hop 8, chunk window W=320 → use T > W and T ragged
    for T in (333, 512, 650):
        codes = rng.integers(0, 1024, (T, 9)).astype(np.int32)
        whole = np.asarray(
            decode_codes(tiny_dia.dac_params, tiny_dia.dac_config, jnp.asarray(codes)[None])[0]
        )
        chunked = tiny_dia._decode_waveform(codes)
        assert chunked.shape == whole.shape
        np.testing.assert_allclose(chunked, whole, atol=2e-5)


def test_load_audio_caches_repeat_prompts(tiny_dia, tmp_path, monkeypatch):
    """Repeated voice-clone prompts skip the DAC encoder (LRU by
    path+mtime+size); an edited file re-encodes."""
    import dia_tts_prune_tpu.api as api_mod

    wav = tiny_dia.generate("[S1] cache me", max_tokens=48, temperature=0.0)
    p = tmp_path / "prompt.wav"
    tiny_dia.save_audio(p, wav, tiny_dia.dac_config.sample_rate)

    calls = {"n": 0}
    real = api_mod.encode_audio

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(api_mod, "encode_audio", counting)
    c1 = tiny_dia.load_audio(p)
    c2 = tiny_dia.load_audio(p)
    assert calls["n"] == 1, "second load should hit the cache"
    np.testing.assert_array_equal(c1, c2)

    # mutating the returned array must not poison the cache
    c1[:] = -7
    np.testing.assert_array_equal(tiny_dia.load_audio(p), c2)
    assert calls["n"] == 1

    # an edited file (different bytes → size/mtime change) re-encodes
    tiny_dia.save_audio(p, np.concatenate([wav, wav]), tiny_dia.dac_config.sample_rate)
    c3 = tiny_dia.load_audio(p)
    assert calls["n"] == 2
    assert c3.shape[0] != c2.shape[0]
