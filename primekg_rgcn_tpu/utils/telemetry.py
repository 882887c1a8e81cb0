"""Observability: structured metrics, wall-clock timing, device memory,
profiler traces.

The reference's telemetry is logging lines + psutil RSS + torch.cuda memory
counters (reference: src/train.py:155-157, 192-214, 508-510, 537-544). Here:

- MetricsLogger: JSONL event stream (one dict per line) alongside the
  human-readable log — machine-parsable training curves.
- device_memory_stats: HBM usage via jax device memory_stats().
- StepTimer: edges/s / steps/s with correct ``block_until_ready`` fencing.
- profile_trace: context manager around jax.profiler for XLA-level traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Any, Dict

import jax


class MetricsLogger:
    """Append-only JSONL metrics stream.

    Multi-process safe: only process 0 writes (every process constructs a
    logger and calls log(); secondary ranks racing appends into the same
    file would interleave torn lines).
    """

    def __init__(self, path):
        self.path = Path(path)
        self._f = None
        if jax.process_index() == 0:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            self._f = open(self.path, "a")

    def log(self, event: str, **fields: Any) -> None:
        if self._f is None:
            return
        rec = {"event": event, "time": time.time(), **fields}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        if self._f is not None:
            self._f.close()


def device_memory_stats(device=None) -> Dict[str, int]:
    """Bytes in use / limit for a device ({} when the backend lacks stats)."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return {}
    if not stats:
        return {}
    return {
        "bytes_in_use": int(stats.get("bytes_in_use", 0)),
        "peak_bytes_in_use": int(stats.get("peak_bytes_in_use", 0)),
        "bytes_limit": int(stats.get("bytes_limit", 0)),
    }


class StepTimer:
    """Throughput measurement with device fencing.

    >>> t = StepTimer()
    >>> for ...: out = step(...)
    >>> dt = t.stop(out)        # block_until_ready(out) then elapsed
    """

    def __init__(self):
        self.t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        return time.perf_counter() - self.t0


@contextlib.contextmanager
def profile_trace(log_dir, enabled: bool = True):
    """jax.profiler trace scope (view with TensorBoard / xprof)."""
    if not enabled:
        yield
        return
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def apply_platform_env() -> None:
    """Honor PRIMEKG_FORCE_CPU=1 before any JAX backend initialization.

    Needed because the hosted TPU plugin pins JAX_PLATFORMS=axon at
    interpreter start, so the standard env var cannot force CPU in
    subprocesses (tests, the orchestrator's --subprocess mode on a busy
    chip). Call first thing in every CLI main.
    """
    import os

    if os.environ.get("PRIMEKG_FORCE_CPU") == "1":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized; nothing to do
