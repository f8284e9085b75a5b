"""Golden-value regression tests: fixed-seed tiny-model outputs pinned
to stored statistics, to catch unintended numerical drift across
refactors (CPU, highest matmul precision via conftest)."""

import jax
import jax.numpy as jnp
import numpy as np


def _stats(y):
    y = np.asarray(y, np.float64)
    return np.array([y.mean(), y.std(), y.reshape(-1)[0], y.reshape(-1)[-1]])


class TestGolden:
    def test_losses_golden(self):
        from adnm_tpu.losses import en_rainfall_loss, rain_loss, rainfall_loss

        rng = np.random.default_rng(42)
        pred = rng.uniform(0, 1.2, (2, 3, 1, 8, 8)).astype(np.float32)
        tgt = rng.uniform(0, 1.0, pred.shape).astype(np.float32)
        np.testing.assert_allclose(float(rainfall_loss(pred, tgt)), 0.2176906, rtol=1e-5)
        np.testing.assert_allclose(float(en_rainfall_loss(pred, tgt)), 0.2201499, rtol=1e-5)
        np.testing.assert_allclose(float(rain_loss(pred, tgt)), 0.5939125, rtol=1e-5)

    def test_ssd_dual_golden(self):
        from adnm_tpu.ops.ssd import linear_attn_dual

        ks = jax.random.split(jax.random.PRNGKey(123), 5)
        x = jax.random.normal(ks[0], (1, 16, 2, 4))
        dt = jax.nn.softplus(jax.random.normal(ks[1], (1, 16, 2)))
        A = -jnp.exp(jax.random.uniform(ks[2], (2,)))
        B = jax.random.normal(ks[3], (1, 16, 8))
        C = jax.random.normal(ks[4], (1, 16, 8))
        D = jnp.ones((2,))
        y = linear_attn_dual(x, dt, A, B, C, D)
        got = _stats(y)
        expect = GOLDEN["ssd_dual"]
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)

    def test_haar_golden(self):
        from adnm_tpu.core.wavelet import haar_dwt

        x = jnp.asarray(np.random.default_rng(7).normal(size=(1, 8, 8, 2)).astype(np.float32))
        got = _stats(haar_dwt(x))
        np.testing.assert_allclose(got, GOLDEN["haar"], rtol=1e-4, atol=1e-5)


# Stored statistics (mean, std, first, last); regenerate deliberately via
# scripts/regen_golden.py when semantics change on purpose.
GOLDEN = {
    "ssd_dual": None,
    "haar": None,
}


def pytest_generate_tests(metafunc):
    pass


def setup_module(module):
    # lazily generate-and-pin on first run if not yet recorded
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "golden_values.json")
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
        GOLDEN.update({k: np.asarray(v) for k, v in data.items()})
    else:
        from adnm_tpu.core.wavelet import haar_dwt
        from adnm_tpu.ops.ssd import linear_attn_dual

        ks = jax.random.split(jax.random.PRNGKey(123), 5)
        x = jax.random.normal(ks[0], (1, 16, 2, 4))
        dt = jax.nn.softplus(jax.random.normal(ks[1], (1, 16, 2)))
        A = -jnp.exp(jax.random.uniform(ks[2], (2,)))
        B = jax.random.normal(ks[3], (1, 16, 8))
        C = jax.random.normal(ks[4], (1, 16, 8))
        D = jnp.ones((2,))
        GOLDEN["ssd_dual"] = _stats(linear_attn_dual(x, dt, A, B, C, D))
        xh = jnp.asarray(np.random.default_rng(7).normal(size=(1, 8, 8, 2)).astype(np.float32))
        GOLDEN["haar"] = _stats(haar_dwt(xh))
        with open(path, "w") as f:
            json.dump({k: list(map(float, v)) for k, v in GOLDEN.items()}, f, indent=1)
