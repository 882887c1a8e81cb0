"""Telemetry utilities."""

import json

import jax
import jax.numpy as jnp

from primekg_rgcn_tpu.utils.telemetry import (
    MetricsLogger,
    StepTimer,
    device_memory_stats,
    profile_trace,
)


def test_metrics_logger_jsonl(tmp_path):
    log = MetricsLogger(tmp_path / "m.jsonl")
    log.log("epoch", epoch=1, loss=0.5)
    log.log("epoch", epoch=2, loss=0.25)
    log.close()
    lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert len(lines) == 2
    assert lines[0]["event"] == "epoch" and lines[1]["loss"] == 0.25
    assert "time" in lines[0]


def test_step_timer_fences():
    t = StepTimer()
    x = jnp.ones((256, 256)) @ jnp.ones((256, 256))
    dt = t.stop(x)
    assert dt > 0


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)  # may be empty on CPU


def test_profile_trace_writes(tmp_path):
    with profile_trace(tmp_path / "trace"):
        _ = jnp.arange(10).sum().block_until_ready()
    assert any((tmp_path / "trace").rglob("*"))


def test_profile_trace_disabled(tmp_path):
    with profile_trace(tmp_path / "off", enabled=False):
        pass
    assert not (tmp_path / "off").exists()
