"""Serving pipeline tests: chunking logic parity, rolling-prompt pipeline,
HTTP API round trip, int8 quantization."""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from dia_tts_prune_tpu.app import (
    auto_adjust_chunk_size,
    batch_chunks,
    count_effective_length,
    run_inference,
    split_by_words_respecting_special_tokens,
)


def test_effective_length():
    assert count_effective_length("[S1] hi") == 4  # ¤ + space + h + i
    assert count_effective_length("abc") == 3
    assert count_effective_length("[S1][S2]") == 2


def test_auto_chunk_size():
    assert auto_adjust_chunk_size("a" * 100) == 48
    assert auto_adjust_chunk_size("a" * 2000) == 64
    assert auto_adjust_chunk_size("a" * 5000) == 96
    assert auto_adjust_chunk_size("a" * 5000, user_chunk_size=32) == 32


def test_word_splitter_preserves_words_and_tags():
    text = "[S1] " + " ".join(f"word{i}" for i in range(40)) + " [S2] tail"
    chunks = split_by_words_respecting_special_tokens(text, 48)
    assert all(count_effective_length(c) <= 48 or " " not in c for c in chunks)
    assert " ".join(chunks).split() == text.split()  # no words lost or reordered


def test_batch_chunks():
    assert list(batch_chunks(list("abcdefg"), 4)) == [list("abcd"), list("efg")]


@pytest.fixture(scope="module")
def tiny_dia():
    from dia_tts_prune_tpu.api import Dia
    from dia_tts_prune_tpu.config import tiny_test_config
    from dia_tts_prune_tpu.models.dac import DACConfig, init_dac_params

    dia = Dia.random_init(tiny_test_config(), seed=0)
    dia.dac_config = DACConfig(
        encoder_dim=8, encoder_rates=(2, 4), decoder_dim=32, decoder_rates=(4, 2),
        n_codebooks=9, codebook_size=1024, codebook_dim=4,
    )
    dia.dac_params = init_dac_params(dia.dac_config, jax.random.PRNGKey(1))
    return dia


def test_run_inference_multi_batch_rolling_prompt(tiny_dia):
    # enough words to force >1 batch of 4 chunks → exercises the rolling prompt
    text = "[S1] " + " ".join(["hello world this is a chunked test"] * 12)
    sr, pcm = run_inference(
        tiny_dia, text, max_new_tokens=320, temperature=0.0, chunk_size=16, seed=3,
    )
    assert sr == 44100
    assert pcm.dtype == np.int16
    assert pcm.shape[0] > 0


def test_run_inference_empty_text_raises(tiny_dia):
    with pytest.raises(ValueError):
        run_inference(tiny_dia, "   ")


def test_speed_factor_changes_length(tiny_dia):
    text = "[S1] short test"
    _, normal = run_inference(tiny_dia, text, max_new_tokens=288, temperature=0.0, seed=1)
    _, fast = run_inference(tiny_dia, text, max_new_tokens=288, temperature=0.0, seed=1,
                            speed_factor=2.0)
    assert abs(fast.shape[0] - normal.shape[0] / 2) <= 2


def test_http_api_round_trip(tiny_dia):
    from dia_tts_prune_tpu.app import make_server

    server = make_server(tiny_dia, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    # health check
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=10) as r:
        assert json.loads(r.read())["status"] == "ok"

    # generate
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate",
        data=json.dumps({"text": "[S1] api test", "max_new_tokens": 288,
                         "temperature": 0.0, "seed": 5}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        wav = r.read()
    assert wav[:4] == b"RIFF"

    # probe: empty text → 400 with JSON error
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate", data=json.dumps({"text": " "}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=60)
    assert exc.value.code == 400

    server.shutdown()


def test_int8_quantization(tiny_dia):
    from dia_tts_prune_tpu.ops.quant import (
        quantization_error,
        quantize_params_int8,
        quantize_params_int8_packed,
    )

    err = quantization_error(tiny_dia.params)
    assert 0 < err < 0.05  # per-channel int8 RMS error is sub-percent-ish

    fq = quantize_params_int8(tiny_dia.params)
    packed = quantize_params_int8_packed(tiny_dia.params)
    q = packed["decoder"]["logits_dense"]["kernel"]
    assert q.values.dtype == np.int8

    # fake-quantized model still generates
    from dia_tts_prune_tpu.generate import DiaGenerator

    gen = DiaGenerator(fq, tiny_dia.config)
    out = gen.generate_tokens("[S1] quantized", max_tokens=40, temperature=0.0)
    assert out.shape[0] > 0


def test_gradio_ui_wiring_smoke(tiny_dia, monkeypatch):
    """Execute serve_gradio's handler once against a stubbed gradio module so
    the UI wiring (handler signature, run_inference plumbing, launch call)
    can't rot — gradio itself isn't installed here (reference UI:
    app.py:296-493)."""
    import sys
    import types

    captured = {}

    class _Component:
        def __init__(self, *a, **k):
            pass

    class _Interface:
        def __init__(self, fn, inputs, outputs, title=None, **k):
            captured["fn"] = fn
            captured["n_inputs"] = len(inputs)
            captured["title"] = title

        def launch(self, server_name=None, server_port=None, **k):
            captured["launch"] = (server_name, server_port)

    stub = types.ModuleType("gradio")
    stub.Interface = _Interface
    for name in ("Textbox", "Audio", "Slider", "Number"):
        setattr(stub, name, _Component)
    monkeypatch.setitem(sys.modules, "gradio", stub)

    from dia_tts_prune_tpu.app import serve_gradio

    serve_gradio(tiny_dia, host="127.0.0.1", port=7861)
    assert captured["launch"] == ("127.0.0.1", 7861)

    # drive the captured handler exactly as the UI would
    sr, pcm = captured["fn"](
        "[S1] Hello from the UI.", None, "", 96, 3.0, 0.0, 0.95, 35, 1.0, 0, 7)
    assert sr == tiny_dia.dac_config.sample_rate
    assert isinstance(pcm, np.ndarray) and pcm.dtype == np.int16 and pcm.size > 0

    # seed sentinel -1 → random seed path still returns audio
    sr2, pcm2 = captured["fn"](
        "[S2] Again.", None, None, 96, 3.0, 0.0, 0.95, 35, 1.0, 0, -1)
    assert pcm2.size > 0 and captured["n_inputs"] == 11
