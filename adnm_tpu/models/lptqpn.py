"""LPTQPN: Restormer-style U-Net with transposed ("squared") channel
attention (reference: models/LPTQPN.py).

Quirks preserved: this file's BiasFree_LayerNorm applies a SIGMOID to
the normalized output (LPTQPN.py:35), unlike the model_untils version;
attention uses sigmoid instead of softmax with a per-head temperature
(LPTQPN.py:96-98). The ConvectionDiffusionLoss parameter heads
(LPTQPN.py:257-262) are dead code in the reference forward and are not
materialized here.

Contract: (B, T_in, 1, H, W) -> (B, out_channels, 1, H, W).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from adnm_tpu.core.layers import Conv2d, Swish


def pixel_unshuffle(x: jax.Array, r: int = 2) -> jax.Array:
    """NHWC equivalent of torch PixelUnshuffle: channel order (c, i, j)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h/r, w/r, c, i, j
    return x.reshape(b, h // r, w // r, c * r * r)


def pixel_shuffle(x: jax.Array, r: int = 2) -> jax.Array:
    b, h, w, c = x.shape
    co = c // (r * r)
    x = x.reshape(b, h, w, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, co
    return x.reshape(b, h * r, w * r, co)


class SigmoidLayerNorm(nn.Module):
    """Bias-free LN followed by sigmoid (reference: LPTQPN.py:17-35)."""

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        wgt = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        out = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * wgt
        return jax.nn.sigmoid(out).astype(x.dtype)


class SquaredAttention(nn.Module):
    """Transposed channel attention, sigmoid-activated
    (reference: LPTQPN.py:71-105)."""

    dim: int
    num_heads: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        temperature = self.param("temperature", nn.initializers.ones, (self.num_heads,), jnp.float32)
        qkv = Conv2d(c * 3, 1, 1, 0, use_bias=self.use_bias, name="qkv")(x)
        qkv = Conv2d(c * 3, 3, 1, 1, groups=c * 3, use_bias=self.use_bias, name="qkv_dwconv")(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = c // self.num_heads

        def to_heads(t):  # (B, H, W, C) -> (B, heads, hd, L)
            return t.reshape(b, h * w, self.num_heads, hd).transpose(0, 2, 3, 1)

        q, k, v = to_heads(q), to_heads(k), to_heads(v)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
        attn = jnp.einsum("bhcl,bhdl->bhcd", q, k) * temperature[None, :, None, None]
        attn = jax.nn.sigmoid(attn)
        out = jnp.einsum("bhcd,bhdl->bhcl", attn, v)
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, c)
        return Conv2d(c, 1, 1, 0, use_bias=self.use_bias, name="project_out")(out)


class GatedFFN(nn.Module):
    """1x1 expand -> dw3x3 -> gelu*sigmoid gate -> 1x1
    (reference: LPTQPN.py:49-66)."""

    dim: int
    expansion: float = 2.66
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = int(self.dim * self.expansion)
        x = Conv2d(hidden * 2, 1, 1, 0, use_bias=self.use_bias, name="project_in")(x)
        x = Conv2d(hidden * 2, 3, 1, 1, groups=hidden * 2, use_bias=self.use_bias, name="dwconv")(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x = jax.nn.gelu(x1) * jax.nn.sigmoid(x2)
        return Conv2d(self.dim, 1, 1, 0, use_bias=self.use_bias, name="project_out")(x)


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    expansion: float = 2.66
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x + SquaredAttention(self.dim, self.num_heads, self.use_bias, name="attn")(
            SigmoidLayerNorm(self.dim, name="norm1")(x)
        )
        x = x + GatedFFN(self.dim, self.expansion, self.use_bias, name="ffn")(
            SigmoidLayerNorm(self.dim, name="norm2")(x)
        )
        return x


class LPTQPN(nn.Module):
    """Reference: models/LPTQPN.py:205-313."""

    inp_channels: int = 5
    out_channels: int = 20
    dim: int = 20
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 2
    heads: Sequence[int] = (1, 2, 4, 8)
    expansion: float = 2.66
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        b, t, _, H, W = x.shape
        inp_img = x[:, :, 0].transpose(0, 2, 3, 1)  # NHWC, T as channels
        d = self.dim

        def blocks(v, dim, n, nh, name):
            for i in range(n):
                v = TransformerBlock(dim, nh, self.expansion, self.use_bias, name=f"{name}_{i}")(v)
            return v

        def down(v, n_feat, name):
            v = Conv2d(n_feat // 2, 3, 1, 1, use_bias=False, name=name)(v)
            return pixel_unshuffle(v, 2)

        def up(v, n_feat, name):
            v = Conv2d(n_feat * 2, 3, 1, 1, use_bias=False, name=name)(v)
            return pixel_shuffle(v, 2)

        e1 = Conv2d(d, 3, 1, 1, use_bias=False, name="patch_embed")(inp_img)
        e1 = blocks(e1, d, self.num_blocks[0], self.heads[0], "enc1")
        e2 = blocks(down(e1, d, "down1"), d * 2, self.num_blocks[1], self.heads[1], "enc2")
        e3 = blocks(down(e2, d * 2, "down2"), d * 4, self.num_blocks[2], self.heads[2], "enc3")
        central = blocks(down(e3, d * 4, "down3"), d * 8, self.num_blocks[3], self.heads[3], "central")

        d3 = jnp.concatenate([up(central, d * 8, "up3"), e3], axis=-1)
        d3 = Conv2d(d * 4, 1, 1, 0, use_bias=self.use_bias, name="reduce_chan_level3")(d3)
        d3 = blocks(d3, d * 4, self.num_blocks[2], self.heads[2], "dec3")

        d2 = jnp.concatenate([up(d3, d * 4, "up2"), e2], axis=-1)
        d2 = Conv2d(d * 2, 1, 1, 0, use_bias=self.use_bias, name="reduce_chan_level2")(d2)
        d2 = blocks(d2, d * 2, self.num_blocks[1], self.heads[1], "dec2")

        d1 = jnp.concatenate([up(d2, d * 2, "up1"), e1], axis=-1)
        d1 = blocks(d1, d * 2, self.num_blocks[0], self.heads[0], "dec1")
        d1 = blocks(d1, d * 2, self.num_refinement_blocks, self.heads[0], "refine")

        out = Conv2d(self.out_channels, 3, 1, 1, use_bias=self.use_bias, name="output")(d1)
        out = out + inp_img[..., -1:]  # last input frame, broadcast over T_out
        out = Conv2d(self.out_channels, 3, 1, 1, use_bias=True, name="last_conv")(out)
        out = Swish(name="last_swish")(out)
        return out.transpose(0, 3, 1, 2)[:, :, None]
