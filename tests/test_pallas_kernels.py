"""Pallas kernel correctness vs XLA references (interpret mode on CPU,
compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from adnm_tpu.ops.pallas import (
    gated_rms_norm_pallas,
    rms_norm_pallas,
    ssd_chunked_scan_pallas,
)
from adnm_tpu.ops.ssd import ssd_chunked_scan, ssd_naive_scan


def _inputs(key=0, b=2, l=32, h=4, p=4, n=8):
    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    x = jax.random.normal(ks[0], (b, l, h, p))
    dt = jax.nn.softplus(jax.random.normal(ks[1], (b, l, h)))
    A = -jnp.exp(jax.random.uniform(ks[2], (h,), minval=0.0, maxval=1.5))
    B = jax.random.normal(ks[3], (b, l, n))
    C = jax.random.normal(ks[4], (b, l, n))
    D = jnp.ones((h,))
    return x, dt, A, B, C, D


class TestPallasChunkedScan:
    def test_matches_xla_chunked(self):
        args = _inputs(0)
        y_ref = ssd_chunked_scan(*args, chunk_size=8)
        y_pal = ssd_chunked_scan_pallas(*args, 8)
        np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), rtol=1e-4, atol=1e-4)

    def test_matches_naive_multi_chunk(self):
        args = _inputs(1, b=1, l=64, h=2, p=4, n=4)
        y_ref = ssd_naive_scan(*args)
        y_pal = ssd_chunked_scan_pallas(*args, 16)
        np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), rtol=1e-4, atol=1e-4)

    def test_gradients_match_xla(self):
        args = _inputs(2, b=1, l=16, h=2, p=2, n=4)

        def f_pal(x, dt, A, B, C, D):
            return jnp.sum(ssd_chunked_scan_pallas(x, dt, A, B, C, D, 8) ** 2)

        def f_ref(x, dt, A, B, C, D):
            return jnp.sum(ssd_chunked_scan(x, dt, A, B, C, D, chunk_size=8) ** 2)

        g_pal = jax.grad(f_pal, argnums=(0, 1))(*args)
        g_ref = jax.grad(f_ref, argnums=(0, 1))(*args)
        for a, b in zip(g_pal, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


class TestFusedNorms:
    def test_rms_norm(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 32))
        w = jax.random.uniform(jax.random.PRNGKey(1), (32,), minval=0.5, maxval=1.5)
        y = rms_norm_pallas(x, w)
        xf = np.asarray(x)
        expect = xf / np.sqrt((xf**2).mean(-1, keepdims=True) + 1e-6) * np.asarray(w)
        np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-5, atol=1e-5)

    def test_gated_rms_norm(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (6, 16))
        z = jax.random.normal(jax.random.PRNGKey(3), (6, 16))
        w = jnp.ones((16,))
        y = gated_rms_norm_pallas(x, z, w)
        xf, zf = np.asarray(x), np.asarray(z)
        g = xf * (zf / (1 + np.exp(-zf)))
        expect = g / np.sqrt((g**2).mean(-1, keepdims=True) + 1e-6)
        np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-5, atol=1e-5)
