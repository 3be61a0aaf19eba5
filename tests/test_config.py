"""Config system tests: validation, 128-alignment, JSON round-trip, hashing."""

import json

import pytest

from dia_tts_prune_tpu.config import DataConfig, DiaConfig, dia_1_6b_config, tiny_test_config


def test_length_coercion_to_128():
    d = DataConfig(text_length=1000, audio_length=129)
    assert d.text_length == 1024
    assert d.audio_length == 256


def test_defaults_match_reference():
    d = DataConfig(text_length=128, audio_length=128)
    assert d.channels == 9
    assert d.audio_eos_value == 1024
    assert d.audio_pad_value == 1025
    assert d.audio_bos_value == 1026
    assert tuple(d.delay_pattern) == (0, 8, 9, 10, 11, 12, 13, 14, 15)
    assert d.max_delay == 15


def test_json_round_trip(tmp_path):
    cfg = tiny_test_config()
    path = tmp_path / "config.json"
    cfg.save(path)
    loaded = DiaConfig.load(path)
    assert loaded == cfg


def test_load_missing_returns_none(tmp_path):
    assert DiaConfig.load(tmp_path / "nope.json") is None


def test_save_forces_json_suffix(tmp_path):
    cfg = tiny_test_config()
    cfg.save(tmp_path / "config.txt")
    assert (tmp_path / "config.json").exists()


def test_config_hashable_for_jit_static():
    cfg = tiny_test_config()
    assert hash(cfg) == hash(tiny_test_config())
    assert hash(cfg) != hash(dia_1_6b_config())


def test_1_6b_dimensions():
    cfg = dia_1_6b_config()
    assert cfg.model.decoder.n_layer == 18
    assert cfg.model.decoder.gqa_query_heads == 16
    assert cfg.model.decoder.kv_heads == 4
    assert cfg.data.text_length == 1024
    assert cfg.data.audio_length == 3072


def test_reference_config_json_compatible(tmp_path):
    """A config.json written by the torch reference schema loads unchanged."""
    ref_style = {
        "version": "1.0",
        "model": {
            "encoder": {"n_layer": 2, "n_embd": 64, "n_hidden": 128, "n_head": 4, "head_dim": 16},
            "decoder": {
                "n_layer": 2, "n_embd": 64, "n_hidden": 128, "gqa_query_heads": 4,
                "kv_heads": 2, "gqa_head_dim": 16, "cross_query_heads": 4, "cross_head_dim": 16,
            },
            "src_vocab_size": 256,
            "tgt_vocab_size": 1028,
        },
        "data": {"text_length": 1024, "audio_length": 3072},
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(ref_style))
    cfg = DiaConfig.load(p)
    assert cfg.model.decoder.kv_heads == 2
    assert cfg.data.audio_length == 3072


def test_invalid_configs_rejected():
    import pydantic

    with pytest.raises(pydantic.ValidationError):
        DataConfig(text_length=0, audio_length=128)
    with pytest.raises(pydantic.ValidationError):
        DataConfig(text_length=128, audio_length=128, channels=0)


def test_checkpoint_missing_key_message(tmp_path):
    """A truncated checkpoint fails with the missing key named."""
    from dia_tts_prune_tpu.checkpoint import convert_torch_state_dict

    cfg = tiny_test_config()
    with pytest.raises(KeyError, match="encoder.embedding.weight"):
        convert_torch_state_dict({}, cfg)
