"""Loss parity tests vs independently written torch/numpy oracles
(formulas from reference models/loss.py)."""

import numpy as np

from adnm_tpu.losses import (
    en_rainfall_loss,
    get_loss,
    rain_loss,
    rainfall_loss,
    weighted_mse_mae,
)


def _data(seed=0, shape=(2, 4, 1, 8, 8)):
    rng = np.random.default_rng(seed)
    pred = rng.uniform(0, 1.2, shape).astype(np.float32)
    target = rng.uniform(0, 1.0, shape).astype(np.float32)
    return pred, target


def _np_rainfall(pred, target, omega_t=0.57, alpha=0.25):
    w0 = 0.57
    diff = np.abs(pred - target)
    ge = pred >= target
    lo = (ge * (1 - w0) * diff).sum() + ((~ge) * w0 * diff).sum()
    wi = alpha * np.exp(target)
    hi = target >= 0.7
    lg = (ge * hi * (1 - omega_t) * wi * diff).sum()
    ll = ((~ge) * hi * omega_t * wi * diff).sum()
    n = target.size
    return lo / n + (lg + ll) / n


def _np_en_rainfall(pred, target, omega_t=0.57, alpha=0.25, gamma=0.1):
    diff = np.abs(pred - target)
    ge = pred >= target
    lo = (ge * (1 - omega_t) * diff).sum() + ((~ge) * omega_t * diff).sum()
    wi = alpha * np.exp(target)
    hi = target >= 0.7
    lg = (ge * hi * (1 - omega_t) * wi * diff).sum()
    ll = ((~ge) * hi * omega_t * wi * diff).sum()
    fn = (hi * (~ge) * gamma * (np.exp(alpha * (target - pred)) - 1.0)).sum()
    return (lo + lg + ll + fn) / target.size


class TestLosses:
    def test_rainfall(self):
        pred, target = _data(0)
        np.testing.assert_allclose(
            float(rainfall_loss(pred, target)), _np_rainfall(pred, target), rtol=1e-5
        )

    def test_en_rainfall(self):
        pred, target = _data(1)
        np.testing.assert_allclose(
            float(en_rainfall_loss(pred, target, gamma=0.1)),
            _np_en_rainfall(pred, target),
            rtol=1e-5,
        )

    def test_en_rainfall_gamma0_equals_registry(self):
        pred, target = _data(2)
        fn = get_loss("en_rainfall", omega_t=0.57, alpha=0.25, gamma=0.0)
        expect = _np_en_rainfall(pred, target, gamma=0.0)
        np.testing.assert_allclose(float(fn(pred, target)), expect, rtol=1e-5)

    def test_rain_loss(self):
        pred, target = _data(3)
        expect = np.mean((pred - target) ** 2) + np.mean(np.abs(pred - target))
        np.testing.assert_allclose(float(rain_loss(pred, target)), expect, rtol=1e-5)

    def test_weighted_mse_mae(self):
        pred, target = _data(4)
        target = target * 50  # exercise thresholds
        pred = pred * 50
        thresholds = (20, 30, 35, 40)
        balancing = (1, 1, 2, 5, 10, 30)
        w = np.full_like(pred, 1.0)
        for i, t in enumerate(thresholds):
            w = w + (balancing[i + 1] - balancing[i]) * (target >= t)
        mse = (w * (pred - target) ** 2).sum(axis=(2, 3, 4)).T
        mae = (w * np.abs(pred - target)).sum(axis=(2, 3, 4)).T
        expect = 5e-5 * (mse.mean() + mae.mean())
        got = float(weighted_mse_mae(pred, target, thresholds=thresholds))
        np.testing.assert_allclose(got, expect, rtol=1e-4)

    def test_weighted_mse_mae_lambda(self):
        pred, target = _data(5)
        got = float(weighted_mse_mae(pred, target, thresholds=(0.3, 0.5, 0.7, 0.9), lam=0.1))
        assert np.isfinite(got) and got > 0
