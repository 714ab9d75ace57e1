"""Profiling & tracing — first-class dev tooling (SURVEY §5.1: the
reference has none beyond tqdm; here: xprof traces, step timers, and
accurate device timing helpers for remote-attached TPUs).
"""
from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mmgt_trace"):
    """Capture an xprof trace around a block (view with xprof/tensorboard)."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span (shows up in xprof timelines)."""
    return jax.profiler.TraceAnnotation(name)


def device_time(fn: Callable, *args, iters: int = 10) -> float:
    """Seconds per call, robust to async remote dispatch: results are
    chained (output feeds the next input where shapes allow) and synced by
    a single scalar fetch — `block_until_ready` alone does not wait on
    remote-relay transports."""
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    chained = _chainable(fn, args, out)
    if chained:
        x = args[0]
        for _ in range(iters):
            x = fn(x, *args[1:])
        _sync(x)
    else:
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
    return (time.time() - t0) / iters


def _chainable(fn, args, out) -> bool:
    first = args[0] if args else None
    return (
        hasattr(first, "shape")
        and hasattr(out, "shape")
        and first.shape == out.shape
        and first.dtype == out.dtype
    )


def _sync(tree):
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if leaves:
        float(jnp.sum(leaves[0].astype(jnp.float32)).item() * 0 + 1)


class StepTimer:
    """Rolling wall-clock stats for training loops (data vs step time,
    like the reference's `td` postfix, train_stage_2.py:722-724)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._samples: Dict[str, list] = {}
        self._marks: Dict[str, float] = {}

    def mark(self, name: str):
        self._marks[name] = time.time()

    def lap(self, name: str):
        now = time.time()
        if name in self._marks:
            self._samples.setdefault(name, []).append(now - self._marks[name])
            self._samples[name] = self._samples[name][-self.window :]
        self._marks[name] = now

    def means(self) -> Dict[str, float]:
        return {k: sum(v) / len(v) for k, v in self._samples.items() if v}
