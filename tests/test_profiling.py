"""Profiling utility tests (observability subsystem, SURVEY.md §5)."""

import time

from dia_tts_prune_tpu.utils.profiling import (
    DAC_FRAME_RATE,
    GenerationStats,
    annotate,
    memory_stats,
)


def test_generation_stats_counters():
    stats = GenerationStats()
    time.sleep(0.01)
    stats.finish(decode_steps=173, prefill_steps=1)
    d = stats.as_dict()
    assert d["decode_steps"] == 173
    assert d["wall_seconds"] > 0
    assert abs(stats.realtime_factor - stats.tokens_per_second / DAC_FRAME_RATE) < 1e-6


def test_annotate_context():
    with annotate("test-region"):
        pass  # must not raise outside a trace


def test_memory_stats_shape():
    out = memory_stats()
    assert isinstance(out, list) and out
    assert "device" in out[0]
