"""LPIPS (AlexNet backbone) in JAX (reference: datasets/Shanghai_metrics.py:37-39,154-169).

The reference uses the ``lpips`` pip package (AlexNet features + learned
per-layer 1x1 linear heads, pretrained). Pretrained weights cannot be
downloaded in this environment, so this module implements the exact
architecture and loads weights from an .npz when available:

  * set ``ADNM_LPIPS_WEIGHTS=/path/to/lpips_alex.npz``; expected keys:
    ``conv{0..4}_w`` (OIHW), ``conv{0..4}_b``, ``lin{0..4}_w`` (O,I,1,1)
    exported from torch lpips via ``scripts/export_lpips.py`` (run where
    the lpips package is installed).

Without weights, ``default_lpips()`` raises and the evaluator reports
LPIPS as NaN — everything else has full parity.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# imagenet normalization used by lpips' scaling layer
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet feature config: (out_ch, kernel, stride, pad), with maxpool(3,2) after layers 0,1
_ALEX_CFG = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]


def _alex_features(params, x):
    """x: (N, H, W, 3) in [-1, 1]. Returns the 5 relu feature maps."""
    x = (x - _SHIFT) / _SCALE
    feats = []
    for i, (_, k, s, p) in enumerate(_ALEX_CFG):
        w = params[f"conv{i}_w"]  # HWIO
        b = params[f"conv{i}_b"]
        x = jax.lax.conv_general_dilated(
            x, w, (s, s), [(p, p), (p, p)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        x = jax.nn.relu(x)
        feats.append(x)
        if i in (0, 1):
            x = -jax.lax.reduce_window(
                -x, jnp.inf, jax.lax.min, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
            )
    return feats


def _normalize(feat, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(feat), axis=-1, keepdims=True))
    return feat / (norm + eps)


@functools.partial(jax.jit, static_argnums=())
def _lpips_pairs(params, a, b):
    """a, b: (N, H, W, 3) in [-1, 1] -> (N,) LPIPS distances."""
    fa = _alex_features(params, a)
    fb = _alex_features(params, b)
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        d = jnp.square(_normalize(xa) - _normalize(xb))
        lin = params[f"lin{i}_w"]  # (C,)
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
    return total


class LpipsAlex:
    def __init__(self, weights_path: str):
        raw = np.load(weights_path)
        params = {}
        for i in range(5):
            w = raw[f"conv{i}_w"]  # OIHW from torch
            params[f"conv{i}_w"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
            params[f"conv{i}_b"] = jnp.asarray(raw[f"conv{i}_b"])
            params[f"lin{i}_w"] = jnp.asarray(raw[f"lin{i}_w"].reshape(-1))
        self.params = params

    def __call__(self, pred: jax.Array, true: jax.Array) -> jax.Array:
        """pred/true: (B, T, H, W) in [0, 1] -> (B, T) distances.

        Matches the reference's gray->RGB repeat and [-1, 1] scaling
        (Shanghai_metrics.py:155-158).
        """
        b, t, h, w = pred.shape
        a = (pred.reshape(b * t, h, w, 1) * 2 - 1).repeat(3, axis=-1)
        bb = (true.reshape(b * t, h, w, 1) * 2 - 1).repeat(3, axis=-1)
        return _lpips_pairs(self.params, a, bb).reshape(b, t)


def default_lpips():
    path = os.environ.get("ADNM_LPIPS_WEIGHTS", "")
    if path and os.path.exists(path):
        return LpipsAlex(path)
    raise FileNotFoundError(
        "no LPIPS weights: set ADNM_LPIPS_WEIGHTS to an lpips_alex.npz "
        "(see adnm_tpu/metrics/lpips_jax.py docstring)"
    )
