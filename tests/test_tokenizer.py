"""Byte tokenizer parity tests (reference: dia/model.py:254-289, 686-696)."""

import numpy as np

from dia_tts_prune_tpu.tokenizer import build_effective_text, encode_cfg_batch, encode_text


def test_speaker_tags_mapped():
    out = encode_text("[S1]hi[S2]yo", 16)
    assert out[0] == 0x01
    assert out[1] == ord("h")
    assert out[2] == ord("i")
    assert out[3] == 0x02
    assert out[4] == ord("y")
    assert out[5] == ord("o")
    assert (out[6:] == 0).all()


def test_truncation_and_padding():
    out = encode_text("a" * 100, 16)
    assert out.shape == (16,)
    assert (out == ord("a")).all()
    out2 = encode_text("", 8)
    assert (out2 == 0).all()


def test_utf8_multibyte():
    text = "héllo"
    out = encode_text(text, 16)
    expected = list(text.encode("utf-8"))
    assert list(out[: len(expected)]) == expected


def test_effective_text_heuristic():
    # last tag S1 → append [S2]
    assert build_effective_text("[S1] hi") == "[S1] hi [S2]"
    # last tag S2 → append [S1]
    assert build_effective_text("[S1] a [S2] b") == "[S1] a [S2] b [S1]"
    # the reference heuristic appends the opposite tag even when the text
    # already ends with a tag (the endswith guard can never be true when that
    # tag is the last occurrence — dia/model.py:689-696)
    assert build_effective_text("[S1] hi [S2]") == "[S1] hi [S2] [S1]"
    # no tags → append [S2]
    assert build_effective_text("hello") == "hello [S2]"


def test_effective_text_prompt_concat():
    out = build_effective_text("[S2] more", audio_prompt_text="[S1] prompt")
    assert out.startswith("[S1] prompt [S2] more")


def test_cfg_batch_rows():
    batch = encode_cfg_batch("[S1] x", 32)
    assert batch.shape == (2, 32)
    assert (batch[0] == 0).all()  # unconditional row = all padding
    assert batch[1][0] == 0x01


def test_reference_byte_parity():
    """Byte-for-byte match with the reference encoding recipe."""
    text = "[S1] Hello (laughs) [S2] Héllo!"
    ref = list(text.encode("utf-8").replace(b"[S1]", b"\x01").replace(b"[S2]", b"\x02"))
    ours = encode_text(text, 128)
    assert list(ours[: len(ref)]) == ref
    assert (ours[len(ref):] == 0).all()
