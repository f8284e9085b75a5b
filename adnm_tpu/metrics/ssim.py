"""SSIM with exact cv2 parity (reference: datasets/Shanghai_metrics.py:132-152).

The reference filters with cv2.filter2D (11x11 Gaussian, sigma 1.5) and
crops [5:-5, 5:-5]; after the crop every remaining pixel has a fully
valid window, so border mode is irrelevant and the whole thing is a
VALID-mode depthwise correlation — implemented here as one
lax.conv_general_dilated over a stacked channel axis (img1, img2,
img1^2, img2^2, img1*img2 in one conv), on device.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel_11_15() -> np.ndarray:
    """cv2.getGaussianKernel(11, 1.5) — the exact analytic formula cv2
    uses for sigma > 0."""
    i = np.arange(11, dtype=np.float64)
    k = np.exp(-((i - 5.0) ** 2) / (2.0 * 1.5 * 1.5))
    return k / k.sum()


_WINDOW = np.outer(gaussian_kernel_11_15(), gaussian_kernel_11_15())


def cv2_parity_ssim(img1: jax.Array, img2: jax.Array, value_scale: float = 90.0) -> jax.Array:
    """Per-frame SSIM for batches of frames.

    img1, img2: (..., H, W) float arrays already in the 0..value_scale
    range (the reference multiplies by value_scale before cal_ssim,
    Shanghai_metrics.py:117-128). Returns (...,) mean SSIM per frame.
    """
    c1 = (0.01 * value_scale) ** 2
    c2 = (0.03 * value_scale) ** 2
    lead = img1.shape[:-2]
    h, w = img1.shape[-2:]
    a = img1.reshape(-1, h, w).astype(jnp.float32)
    b = img2.reshape(-1, h, w).astype(jnp.float32)
    # stack the 5 filter inputs as channels: a, b, a^2, b^2, ab
    x = jnp.stack([a, b, a * b, a * a, b * b], axis=-1)  # (N, H, W, 5)
    win = jnp.asarray(_WINDOW, jnp.float32)[:, :, None, None]  # HWIO, I=1
    kern = jnp.tile(win, (1, 1, 1, 5))
    y = jax.lax.conv_general_dilated(
        x, kern, (1, 1), "VALID", feature_group_count=5,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    mu1, mu2, mu12, m1sq, m2sq = [y[..., i] for i in range(5)]
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = m1sq - mu1_sq
    sigma2_sq = m2sq - mu2_sq
    sigma12 = mu12 - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map, axis=(-2, -1)).reshape(lead)
