"""Profiling and observability helpers.

The reference's only telemetry is wall-clock prints inside generate
(dia/model.py:707-711, 810-815) and psutil RSS sampling in the prune script
(offline_prune.py:16-26).  TPU-native equivalents:

* ``trace(...)`` — context manager around ``jax.profiler`` traces (open the
  dump with TensorBoard / xprof);
* ``annotate(name)`` — ``TraceAnnotation`` for labelling prefill / step /
  codec regions inside a trace;
* ``GenerationStats`` — tokens/s and realtime-factor counters computed on the
  host from step counts (the reference's verbose counters, structured);
* ``memory_stats()`` — per-device HBM usage where the backend reports it
  (replaces psutil RSS for device memory).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax

DAC_FRAME_RATE = 44100.0 / 512.0


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace around the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a profiler trace."""
    return jax.profiler.TraceAnnotation(name)


@dataclass
class GenerationStats:
    """Host-side throughput counters for a generation call."""

    start_time: float = field(default_factory=time.perf_counter)
    prefill_steps: int = 0
    decode_steps: int = 0
    end_time: float | None = None

    def finish(self, decode_steps: int, prefill_steps: int = 0) -> "GenerationStats":
        self.decode_steps = decode_steps
        self.prefill_steps = prefill_steps
        self.end_time = time.perf_counter()
        return self

    @property
    def wall_seconds(self) -> float:
        return (self.end_time or time.perf_counter()) - self.start_time

    @property
    def tokens_per_second(self) -> float:
        return self.decode_steps / max(self.wall_seconds, 1e-9)

    @property
    def realtime_factor(self) -> float:
        return self.tokens_per_second / DAC_FRAME_RATE

    def as_dict(self) -> dict:
        return {
            "decode_steps": self.decode_steps,
            "prefill_steps": self.prefill_steps,
            "wall_seconds": round(self.wall_seconds, 4),
            "tokens_per_second": round(self.tokens_per_second, 2),
            "realtime_factor": round(self.realtime_factor, 4),
        }


def memory_stats() -> list[dict]:
    """Per-device memory stats where the backend exposes them."""
    out = []
    for dev in jax.devices():
        try:
            stats = dev.memory_stats() or {}
        except Exception:  # noqa: BLE001 — backend may not support it
            stats = {}
        out.append({
            "device": str(dev),
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        })
    return out
