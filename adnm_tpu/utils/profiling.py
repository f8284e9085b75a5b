"""Profiling / tracing hooks (reference aux subsystem: the vestigial
print_memory_usage at ADNMUNet.py:37-48 and the Swin flops() estimators
at SwinUnet.py:410-421 etc. — here as first-class utilities).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/adnm_trace"):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_timer(name: str = "step", sync: bool = True, log_fn: Callable[[str], None] = print):
    t0 = time.perf_counter()
    box = {}
    try:
        yield box
    finally:
        if sync and "result" in box:
            jax.block_until_ready(box["result"])
        dt = time.perf_counter() - t0
        box["seconds"] = dt
        log_fn(f"[{name}] {dt * 1e3:.2f} ms")


def estimate_flops(fn: Callable, *args, **kwargs) -> Optional[float]:
    """Static FLOP estimate via XLA cost analysis (replaces the
    hand-written per-module flops() methods in the reference)."""
    try:
        lowered = jax.jit(fn).lower(*args, **kwargs)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:
        return None


def device_memory_stats() -> dict:
    """Per-device memory stats (replaces print_memory_usage)."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
