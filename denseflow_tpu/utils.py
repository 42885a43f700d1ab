"""Timing, counters, and verbose logging.

The reference's observability surface (reference src/utils.cpp:22-26,
src/denseflow_gpu.cpp:492-496): wall-clock seconds, per-run frame/flow
counters, a final throughput summary, and `-v` queue-event tracing. We keep
those exactly (the summary numbers are the benchmark metric) and add
per-stage timers.
"""

from __future__ import annotations

import threading
import time
from collections import defaultdict
from contextlib import contextmanager


def current_seconds() -> float:
    return time.time()


def enable_compile_cache() -> None:
    """Point JAX at a persistent on-disk compilation cache.

    TVL1/Farneback/Brox programs take 20-300s to compile through the
    remote-compile tunnel; the cache turns every later process's first run
    into a disk hit (measured: 280s -> 6.6s cold-process pipeline start).
    Override the location with DENSEFLOW_CACHE_DIR; disable with
    DENSEFLOW_NO_COMPILE_CACHE=1."""
    import os

    if os.environ.get("DENSEFLOW_NO_COMPILE_CACHE"):
        return
    path = os.environ.get(
        "DENSEFLOW_CACHE_DIR",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "denseflow_tpu", "jit",
        ),
    )
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: compile cache is best-effort


class Counters:
    """Thread-safe run counters (total_frames / total_flows, like the
    reference's DenseFlow members)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.total_frames = 0
        self.total_flows = 0
        self.total_videos = 0

    def add_frames(self, n: int) -> None:
        with self._lock:
            self.total_frames += n

    def add_flows(self, n: int) -> None:
        with self._lock:
            self.total_flows += n

    def add_videos(self, n: int = 1) -> None:
        with self._lock:
            self.total_videos += n


class StageTimers:
    """Cumulative per-stage wall time (decode / compute / encode), an
    extension over the reference's single end-to-end timer."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.totals: dict[str, float] = defaultdict(float)

    @contextmanager
    def track(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.totals[stage] += dt

    def summary(self) -> str:
        with self._lock:
            return ", ".join(f"{k} {v:.2f}s" for k, v in sorted(self.totals.items()))


class VerboseLog:
    """Gated print, matching the reference's `-v` tracing of queue events."""

    def __init__(self, enabled: bool) -> None:
        self.enabled = enabled
        self._lock = threading.Lock()

    def __call__(self, msg: str) -> None:
        if self.enabled:
            with self._lock:
                print(msg, flush=True)


def format_summary(
    n_videos: int, n_frames: int, n_flows: int, algorithm: str, seconds: float
) -> str:
    """The reference's end-of-run line (src/denseflow_gpu.cpp:494-496)."""
    secs = max(seconds, 1e-9)
    return (
        f"{n_videos} videos ({n_frames} frames, {n_flows} {algorithm} flows) "
        f"processed, using {seconds:.6g}s, decoding speed "
        f"{n_frames / secs:.6g}fps, flow speed {n_flows / secs:.6g}fps"
    )
