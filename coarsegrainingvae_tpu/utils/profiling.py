"""Profiling & timing: jax.profiler traces, per-step timing, compile-time
logging.

The reference's profiling story is vestigial (torch profiler imported but
never used, CUDA_LAUNCH_BLOCKING=1 globally, wall-clock saved in a file
*name* -- scripts/utils.py:9,13,30-38 in /root/reference). Here: real XLA
traces viewable in TensorBoard/Perfetto + cheap host-side step statistics.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (TensorBoard 'profile' plugin /
    Perfetto). Usage:  with trace('./tb'): run_steps()"""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step statistics with warmup exclusion.

    Call tick() after each (blocked-on) step; summary() reports mean/p50/p95
    step time and throughput.
    """

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self._t: List[float] = []
        self._last: Optional[float] = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._t.append(now - self._last)
        self._last = now

    def summary(self, items_per_step: int = 1) -> Dict[str, float]:
        t = np.asarray(self._t[self.warmup:])
        if t.size == 0:
            return {}
        return {
            "steps": int(t.size),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
            "items_per_s": float(items_per_step / t.mean()),
        }


def time_compile(fn, *args) -> Dict[str, float]:
    """Measure (compile+first-run, steady-state) of a jitted callable —
    compile-time logging for regressions."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    steady = time.perf_counter() - t0
    return {"first_call_s": first, "steady_s": steady,
            "compile_s_approx": max(first - steady, 0.0)}


def save_runtime(seconds: float, path: str) -> None:
    """Persist wall-clock as JSON (the reference encodes it in a file NAME,
    scripts/utils.py:30-38 -- kept queryable instead)."""
    with open(path, "w") as f:
        json.dump({"wall_clock_s": seconds}, f)
