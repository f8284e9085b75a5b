"""TransUnet: ResNet50V2 hybrid ViT-B/16 encoder + cascaded upsampler
(reference: models/TransUnet.py).

Structure (R50-ViT-B_16 config, TransUnet.py:251-267): StdConv root ->
3 pre-act bottleneck stages (3/4/9 units) -> 1x1 patch embed to 768 ->
12 ViT blocks -> DecoderCup with 3 skips -> seg head. Contract:
(B, T_in, 1, H, W) -> (B, n_classes, 1, H, W).

Quirk preserved: after block1 the 63x63 feature map is zero-padded to
64x64 (TransUnet.py:158-168).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from adnm_tpu.core.layers import BatchNorm, Conv2d, Dense, GroupNorm
from adnm_tpu.models.smaat_unet import upsample_bilinear_align_corners


class StdConv2d(nn.Module):
    """Weight-standardized conv (reference: TransUnet.py:28-35)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        fan_in = cin * k * k

        def kernel_init(key, shape, dtype=jnp.float32):
            bound = math.sqrt(3.0) * math.sqrt(2.0 / 6.0) / math.sqrt(fan_in)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w = self.param("kernel", kernel_init, (k, k, cin, self.features), jnp.float32)
        # standardize over (kh, kw, cin) per output filter
        mu = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(w, axis=(0, 1, 2), keepdims=True)
        w = (w - mu) * jax.lax.rsqrt(var + 1e-5)
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (self.stride, self.stride),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b
        return y


class PreActBottleneck(nn.Module):
    """Reference: TransUnet.py:48-84."""

    cout: int
    cmid: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        residual = x
        if self.stride != 1 or cin != self.cout:
            residual = StdConv2d(self.cout, 1, self.stride, 0, name="downsample")(x)
            residual = GroupNorm(self.cout, self.cout, name="gn_proj")(residual)
        y = jax.nn.relu(GroupNorm(32, self.cmid, eps=1e-6, name="gn1")(StdConv2d(self.cmid, 1, 1, 0, name="conv1")(x)))
        y = jax.nn.relu(GroupNorm(32, self.cmid, eps=1e-6, name="gn2")(StdConv2d(self.cmid, 3, self.stride, 1, name="conv2")(y)))
        y = GroupNorm(32, self.cout, eps=1e-6, name="gn3")(StdConv2d(self.cout, 1, 1, 0, name="conv3")(y))
        return jax.nn.relu(residual + y)


class ResNetV2(nn.Module):
    """Reference: TransUnet.py:122-170. Returns (x, skips[::-1])."""

    block_units: Sequence[int] = (3, 4, 9)
    width_factor: int = 1

    @nn.compact
    def __call__(self, x):
        width = int(64 * self.width_factor)
        b, in_size, _, _ = x.shape[0], x.shape[1], x.shape[2], x.shape[3]
        x = StdConv2d(width, 7, 2, 3, name="root_conv")(x)
        x = jax.nn.relu(GroupNorm(32, width, eps=1e-6, name="root_gn")(x))
        features = [x]
        # MaxPool k3 s2 p0 (shrinks 128 -> 63; quirk source)
        x = nn.max_pool(x, (3, 3), (2, 2))
        widths = [(width, width * 4, 1), (width * 2, width * 8, 2), (width * 4, width * 16, 2)]
        for bi, (cmid, cout, stride) in enumerate(widths):
            for ui in range(self.block_units[bi]):
                x = PreActBottleneck(
                    cout, cmid, stride if ui == 0 else 1, name=f"block{bi + 1}_unit{ui + 1}"
                )(x)
            if bi < 2:
                right = in_size // 4 // (bi + 1)
                if x.shape[1] != right:
                    pad = right - x.shape[1]
                    x_feat = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
                else:
                    x_feat = x
                features.append(x_feat)
                if x.shape[1] != right and bi == 0:
                    pass  # body continues on the unpadded tensor (reference :169)
        return x, features[::-1]


class ViTBlock(nn.Module):
    """Reference: TransUnet.py:491-510 (pre-norm MHA + MLP)."""

    hidden: int = 768
    heads: int = 12
    mlp_dim: int = 3072
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool):
        h = x
        y = nn.LayerNorm(epsilon=1e-6, name="attention_norm")(x)
        b, l, _ = y.shape
        hd = self.hidden // self.heads

        def split_heads(t):
            return t.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3)

        q = split_heads(Dense(self.hidden, name="query")(y))
        k = split_heads(Dense(self.hidden, name="key")(y))
        v = split_heads(Dense(self.hidden, name="value")(y))
        attn = jax.nn.softmax(jnp.einsum("bhid,bhjd->bhij", q, k) / math.sqrt(hd), axis=-1)
        o = jnp.einsum("bhij,bhjd->bhid", attn, v).transpose(0, 2, 1, 3).reshape(b, l, self.hidden)
        o = Dense(self.hidden, name="out")(o)
        o = nn.Dropout(self.dropout, deterministic=not train)(o)
        x = h + o

        h = x
        y = nn.LayerNorm(epsilon=1e-6, name="ffn_norm")(x)
        y = Dense(self.mlp_dim, name="fc1")(y)
        y = jax.nn.gelu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = Dense(self.hidden, name="fc2")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return h + y


class Conv2dReLU(nn.Module):
    """conv -> BN -> relu (reference: TransUnet.py:582-604)."""

    features: int
    kernel_size: int = 3
    padding: int = 1
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = Conv2d(self.features, self.kernel_size, 1, self.padding, use_bias=False, name="conv")(x)
        x = BatchNorm(self.features, axis_name=self.bn_axis_name, name="bn")(x, train)
        return jax.nn.relu(x)


class TransUnet(nn.Module):
    """Reference: TransUnet.py:693-716 (VisionTransformer)."""

    n_classes: int
    img_size: int = 256
    hidden: int = 768
    num_layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    dropout: float = 0.1
    decoder_channels: Sequence[int] = (256, 128, 64, 16)
    n_skip: int = 3
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        b, t, _, H, W = x.shape
        x = x[:, :, 0].transpose(0, 2, 3, 1)  # NHWC, frames as channels
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)  # reference :710-711

        feat, skips = ResNetV2(name="hybrid_model")(x)
        # patch embed: grid 16x16 over the 16x16 map -> patch size 1
        y = Conv2d(self.hidden, 1, 1, 0, name="patch_embeddings")(feat)
        gh, gw = y.shape[1], y.shape[2]
        y = y.reshape(b, gh * gw, self.hidden)
        pos = self.param("position_embeddings", nn.initializers.zeros, (1, gh * gw, self.hidden), jnp.float32)
        y = y + pos
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        for i in range(self.num_layers):
            y = ViTBlock(self.hidden, self.heads, self.mlp_dim, self.dropout, name=f"block_{i}")(y, train)
        y = nn.LayerNorm(epsilon=1e-6, name="encoder_norm")(y)

        # DecoderCup (reference :649-690)
        y = y.reshape(b, gh, gw, self.hidden)
        y = Conv2dReLU(512, 3, 1, self.bn_axis_name, name="conv_more")(y, train)
        for i, ch in enumerate(self.decoder_channels):
            y = upsample_bilinear_align_corners(y, 2)
            if i < self.n_skip:
                y = jnp.concatenate([y, skips[i]], axis=-1)
            y = Conv2dReLU(ch, 3, 1, self.bn_axis_name, name=f"dec{i}_conv1")(y, train)
            y = Conv2dReLU(ch, 3, 1, self.bn_axis_name, name=f"dec{i}_conv2")(y, train)
        logits = Conv2d(self.n_classes, 3, 1, 1, name="segmentation_head")(y)
        return logits.transpose(0, 3, 1, 2)[:, :, None]


def create_trans_unet(output_frames: int, img_size: int = 256, bn_axis_name=None) -> TransUnet:
    """Reference: TransUnet.py:798-799 (create_TransUnet)."""
    return TransUnet(n_classes=output_frames, img_size=img_size, bn_axis_name=bn_axis_name)
