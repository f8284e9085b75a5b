"""Rainfall losses, as pure jnp functions (reference: models/loss.py).

All four reference criteria, value-for-value. These run on device inside
the jitted train step (the reference computes them in eager torch).
Signatures are ``loss(pred, target) -> scalar``; thresholds/weights are
closed over via functools.partial in the registry.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def rainfall_loss(pred: jax.Array, target: jax.Array, omega_t: float = 0.57, alpha: float = 0.25) -> jax.Array:
    """Dynamic quantile-weighted L1 (reference: models/loss.py:11-27).

    Quirk preserved: the base quantile weight uses the hard-coded
    w0=0.57, not omega_t (loss.py:18).
    """
    w0 = 0.57
    diff = jnp.abs(pred - target)
    ge = (pred >= target).astype(pred.dtype)
    lt = 1.0 - ge
    loss_overall = jnp.sum(ge * (1 - w0) * diff) + jnp.sum(lt * w0 * diff)
    wi = alpha * jnp.exp(target)
    high = (target >= 0.7).astype(pred.dtype)
    loss_greater = jnp.sum(ge * high * (1 - omega_t) * wi * diff)
    loss_less = jnp.sum(lt * high * omega_t * wi * diff)
    n = pred.size
    return loss_overall / n + (loss_greater + loss_less) / n


def en_rainfall_loss(
    pred: jax.Array, target: jax.Array, omega_t: float = 0.57, alpha: float = 0.25, gamma: float = 0.1
) -> jax.Array:
    """DQWL + exponential false-negative penalty
    (reference: models/loss.py:30-57, enRainfallLoss)."""
    diff = jnp.abs(pred - target)
    ge = (pred >= target).astype(pred.dtype)
    lt = 1.0 - ge
    loss_overall = jnp.sum(ge * (1 - omega_t) * diff) + jnp.sum(lt * omega_t * diff)
    wi = alpha * jnp.exp(target)
    high = (target >= 0.7).astype(pred.dtype)
    loss_greater = jnp.sum(ge * high * (1 - omega_t) * wi * diff)
    loss_less = jnp.sum(lt * high * omega_t * wi * diff)
    fn_penalty = jnp.sum(high * lt * gamma * (jnp.exp(alpha * (target - pred)) - 1.0))
    n = pred.size
    return (loss_overall + loss_greater + loss_less + fn_penalty) / n


def rain_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """MSE + MAE (reference: models/loss.py:61-69, RAINlOSS)."""
    return jnp.mean(jnp.square(pred - target)) + jnp.mean(jnp.abs(pred - target))


def weighted_mse_mae(
    pred: jax.Array,
    target: jax.Array,
    thresholds: Sequence[float] = (),
    mse_weight: float = 1.0,
    mae_weight: float = 1.0,
    global_scale: float = 0.00005,
    lam: float | None = None,
) -> jax.Array:
    """Threshold-banded weighted MSE+MAE
    (reference: models/loss.py:73-100, Weighted_mse_mae).

    pred/target: (B, T, C, H, W); the reference transposes to seq-first
    and sums per (T, B) over (C, H, W) — replicated here.
    """
    balancing = (1.0, 1.0, 2.0, 5.0, 10.0, 30.0)
    weights = jnp.full_like(pred, balancing[0])
    for i, thr in enumerate(thresholds):
        weights = weights + (balancing[i + 1] - balancing[i]) * (target >= thr).astype(pred.dtype)
    # seq-first (T, B) reduction over (C, H, W)
    mse = jnp.sum(weights * jnp.square(pred - target), axis=(2, 3, 4)).T
    mae = jnp.sum(weights * jnp.abs(pred - target), axis=(2, 3, 4)).T
    if lam is not None:
        s = mse.shape[0]
        w = jnp.arange(1.0, 1.0 + s * lam, lam)[:, None]
        mse = mse * w
        mae = mae * w
    return global_scale * (mse_weight * jnp.mean(mse) + mae_weight * jnp.mean(mae))


_LOSSES: dict[str, Callable] = {
    "rainfall": rainfall_loss,
    "en_rainfall": en_rainfall_loss,
    "rain": rain_loss,
    "weighted_mse_mae": weighted_mse_mae,
}


def get_loss(name: str, **kwargs) -> Callable[[jax.Array, jax.Array], jax.Array]:
    fn = _LOSSES[name]
    return functools.partial(fn, **kwargs) if kwargs else fn
