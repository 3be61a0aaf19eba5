"""Datagen unit tests: dialogue prompt construction rules
(reference: generate_finetune_data.py:42-96)."""

import numpy as np
import pytest

from dia_tts_prune_tpu.datagen import HARVARD_SENTENCES, format_dialogue_prompts


def test_prompts_alternate_speakers():
    prompts = format_dialogue_prompts(HARVARD_SENTENCES, max_len_sec=15,
                                      min_len_sec=5, seed=0)
    assert prompts
    for p in prompts:
        # sentences alternate [S1]/[S2] starting at [S1]
        tags = [t for t in p.split() if t in ("[S1]", "[S2]")]
        body_tags = tags[:-1]  # last tag is the trailing-speaker marker
        assert body_tags[0] == "[S1]"
        for a, b in zip(body_tags, body_tags[1:]):
            assert a != b, p


def test_trailing_tag_is_previous_speaker():
    """The reference appends the tag of the *previous* (last) speaker at the
    end (generate_finetune_data.py:74-76) — the trailing tag equals the last
    sentence's speaker."""
    prompts = format_dialogue_prompts(HARVARD_SENTENCES, max_len_sec=12,
                                      min_len_sec=4, seed=1)
    for p in prompts:
        tags = [t for t in p.split() if t in ("[S1]", "[S2]")]
        assert tags[-1] == tags[-2], p


def test_duration_bounds_respected():
    max_len = 10.0
    prompts = format_dialogue_prompts(HARVARD_SENTENCES, max_len_sec=max_len,
                                      min_len_sec=3, seed=2)
    words_per_sec = 2.5
    for p in prompts:
        words = [w for w in p.split() if w not in ("[S1]", "[S2]")]
        est = len(words) / words_per_sec
        # each prompt may exceed max by at most one sentence's worth
        assert est < max_len + 8, p


def test_seeded_prompts_reproducible():
    a = format_dialogue_prompts(HARVARD_SENTENCES, seed=7)
    b = format_dialogue_prompts(HARVARD_SENTENCES, seed=7)
    assert a == b
    c = format_dialogue_prompts(HARVARD_SENTENCES, seed=8)
    assert a != c


def test_min_length_filter():
    # absurd min length → no prompts survive
    assert format_dialogue_prompts(HARVARD_SENTENCES[:2], max_len_sec=100,
                                   min_len_sec=1000, seed=0) == []
