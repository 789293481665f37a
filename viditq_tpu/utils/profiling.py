"""Profiling helpers (reference: dead NVTX hooks in stdit.py:320-326 —
SURVEY §5 says 'TPU build: use jax.profiler instead')."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "outputs/profile") -> Iterator[None]:
    """Capture a TensorBoard-viewable device trace around a code block."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, sync: bool = True) -> Iterator[None]:
    """Wall-clock a block; remember the device relay adds ~3.5-4ms per
    dispatch and dedupes identical dispatches (BENCH_NOTES.md) — time whole
    jitted programs, not python step loops."""
    t0 = time.time()
    try:
        yield
    finally:
        if sync:
            try:
                jax.block_until_ready(jax.device_put(0.0))
            except Exception:
                pass
        print(f"[viditq timing] {label}: {(time.time() - t0) * 1e3:.2f} ms")


def annotate(name: str):
    """Named region visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)
