"""SmaAt-UNet: depthwise-separable U-Net with CBAM attention on skips.

Reference: models/SmaAt_UNet.py:302-354. Contract:
(B, T_in, 1, H, W) -> (B, n_classes, 1, H, W) — input frames are the
channel axis (SmaAt_UNet.py:337 squeeze / :353 unsqueeze).

TPU notes: NHWC throughout; the align_corners=True bilinear 2x upsample
(SmaAt_UNet.py:198) is an exact per-axis interpolation-matrix einsum
(MXU work, no gathers). BatchNorm carries an optional mesh axis name for
cross-replica stats (the SyncBatchNorm equivalent, train.py:100).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from adnm_tpu.core.layers import BatchNorm, Conv2d, Dense


@functools.lru_cache(maxsize=None)
def _interp_matrix(n_in: int, factor: int) -> np.ndarray:
    """(n_out, n_in) align_corners=True bilinear interpolation matrix."""
    n_out = n_in * factor
    m = np.zeros((n_out, n_in), np.float32)
    if n_out == 1:
        m[0, 0] = 1.0
        return m
    scale = (n_in - 1) / (n_out - 1)
    for i in range(n_out):
        src = i * scale
        lo = int(np.floor(src))
        hi = min(lo + 1, n_in - 1)
        w = src - lo
        m[i, lo] += 1.0 - w
        m[i, hi] += w
    return m


def upsample_bilinear_align_corners(x: jax.Array, factor: int = 2) -> jax.Array:
    """NHWC 2x bilinear upsample matching torch Upsample(align_corners=True)."""
    b, h, w, c = x.shape
    mh = jnp.asarray(_interp_matrix(h, factor))
    mw = jnp.asarray(_interp_matrix(w, factor))
    x = jnp.einsum("Oh,bhwc->bOwc", mh, x, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("Ow,bhwc->bhOc", mw, x, precision=jax.lax.Precision.HIGHEST)
    return x


class DepthwiseSeparableConv(nn.Module):
    """dw 3x3 (depth multiplier) + pointwise 1x1
    (reference: models/SmaAt_UNet.py:32-48)."""

    features: int
    kernels_per_layer: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        x = Conv2d(cin * self.kernels_per_layer, 3, 1, 1, groups=cin, name="depthwise")(x)
        return Conv2d(self.features, 1, 1, 0, name="pointwise")(x)


class DoubleConvDS(nn.Module):
    """(dsconv -> BN -> ReLU) x2 (reference: models/SmaAt_UNet.py:144-173)."""

    features: int
    mid: Optional[int] = None
    kernels_per_layer: int = 1
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        mid = self.mid or self.features
        x = DepthwiseSeparableConv(mid, self.kernels_per_layer, name="conv1")(x)
        x = BatchNorm(mid, axis_name=self.bn_axis_name, name="bn1")(x, train)
        x = jax.nn.relu(x)
        x = DepthwiseSeparableConv(self.features, self.kernels_per_layer, name="conv2")(x)
        x = BatchNorm(self.features, axis_name=self.bn_axis_name, name="bn2")(x, train)
        return jax.nn.relu(x)


class ChannelAttention(nn.Module):
    """CBAM channel attention (reference: models/SmaAt_UNet.py:88-109)."""

    channels: int
    reduction_ratio: int = 16

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        hidden = self.channels // self.reduction_ratio
        fc1 = Dense(hidden, name="fc1")
        fc2 = Dense(self.channels, name="fc2")
        out = fc2(jax.nn.relu(fc1(avg))) + fc2(jax.nn.relu(fc1(mx)))
        return x * jax.nn.sigmoid(out)[:, None, None, :]


class SpatialAttention(nn.Module):
    """CBAM spatial attention (reference: models/SmaAt_UNet.py:112-127)."""

    kernel_size: int = 7
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        pad = 3 if self.kernel_size == 7 else 1
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        out = jnp.concatenate([avg, mx], axis=-1)
        out = Conv2d(1, self.kernel_size, 1, pad, use_bias=False, name="conv")(out)
        out = BatchNorm(1, axis_name=self.bn_axis_name, name="bn")(out, train)
        return x * jax.nn.sigmoid(out)


class CBAM(nn.Module):
    channels: int
    reduction_ratio: int = 16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ChannelAttention(self.channels, self.reduction_ratio, name="channel_att")(x)
        return SpatialAttention(bn_axis_name=self.bn_axis_name, name="spatial_att")(x, train)


class SmaAtUNet(nn.Module):
    """Reference: models/SmaAt_UNet.py:302-354."""

    n_channels: int
    n_classes: int
    kernels_per_layer: int = 2
    reduction_ratio: int = 16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        # (B, T, 1, H, W) -> NHWC with T as channels
        b, t, _, h, w = x.shape
        x = x[:, :, 0].transpose(0, 2, 3, 1)
        kpl = self.kernels_per_layer
        rr = self.reduction_ratio
        ax = self.bn_axis_name

        dc = functools.partial(DoubleConvDS, kernels_per_layer=kpl, bn_axis_name=ax)
        x1 = dc(64, name="inc")(x, train)
        x1a = CBAM(64, rr, ax, name="cbam1")(x1, train)
        x2 = dc(128, name="down1")(nn.max_pool(x1, (2, 2), (2, 2)), train)
        x2a = CBAM(128, rr, ax, name="cbam2")(x2, train)
        x3 = dc(256, name="down2")(nn.max_pool(x2, (2, 2), (2, 2)), train)
        x3a = CBAM(256, rr, ax, name="cbam3")(x3, train)
        x4 = dc(512, name="down3")(nn.max_pool(x3, (2, 2), (2, 2)), train)
        x4a = CBAM(512, rr, ax, name="cbam4")(x4, train)
        x5 = dc(512, name="down4")(nn.max_pool(x4, (2, 2), (2, 2)), train)
        x5a = CBAM(512, rr, ax, name="cbam5")(x5, train)

        def up(xx, skip, feats, mid, name):
            xx = upsample_bilinear_align_corners(xx, 2)
            xx = jnp.concatenate([skip, xx], axis=-1)
            return dc(feats, mid=mid, name=name)(xx, train)

        y = up(x5a, x4a, 256, 512, "up1")
        y = up(y, x3a, 128, 256, "up2")
        y = up(y, x2a, 64, 128, "up3")
        y = up(y, x1a, 64, None, "up4")
        logits = Conv2d(self.n_classes, 1, 1, 0, name="outc")(y)
        return logits.transpose(0, 3, 1, 2)[:, :, None]  # (B, T_out, 1, H, W)
