"""Profiling utility tests."""

import os

from cmoop_audio_processing_tpu.utils.profiling import (
    annotate,
    device_memory_stats,
    trace,
)


def test_trace_noop_without_dir(monkeypatch):
    monkeypatch.delenv("CMOOP_TRACE_DIR", raising=False)
    with trace("stage"):
        x = 1 + 1
    assert x == 2


def test_trace_writes_profile(tmp_path, monkeypatch):
    import jax.numpy as jnp

    with trace("stage", trace_dir=str(tmp_path)):
        with annotate("inner"):
            jnp.ones((4,)).sum().block_until_ready()
    # jax.profiler.trace writes a plugins/ or .trace dir tree
    assert any(tmp_path.iterdir())


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict) and len(stats) >= 1
