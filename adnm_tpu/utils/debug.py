"""Numerics debugging flags (reference aux: np.seterr masking at
Shanghai_metrics.py:7 — here the inverse: opt-in NaN surfacing)."""

from __future__ import annotations

import jax


def enable_nan_debugging(enable: bool = True):
    """Turn on jax debug_nans/debug_infs (fails fast inside jit)."""
    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)
