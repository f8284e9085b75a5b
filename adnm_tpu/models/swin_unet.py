"""SwinUnet: Swin-T U-Net with shifted-window attention
(reference: models/SwinUnet.py).

Config (embedded yacs tree + swin_tiny yaml, SwinUnet.py:36-253 +
swin_tiny_patch4_window7_224_lite.yaml): img 256, patch 4, in_chans 5,
embed 96, depths [2,2,2,2], heads [3,6,12,24], window 8, mlp_ratio 4,
drop_path 0.2, ape False, patch_norm True.

Quirks preserved: the decoder's BasicLayer_up blocks use the ENCODER
depths, not DECODER_DEPTHS (SwinUnet.py:932-946 read depths[...]);
the unused MoEFFNGating module (SwinUnet.py:257-272) is intentionally
not materialized. The import-time argparse/yaml machinery becomes
explicit construction (create_swin_unet).

TPU notes: window partition is pure reshape/transpose; the shifted-window
mask is a static numpy precompute; cyclic shift via jnp.roll.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from adnm_tpu.core.layers import Conv2d, Dense


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm semantics: scale by 1/keep)."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return x * mask / keep


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, ws*ws, C) (reference: SwinUnet.py:294-303)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(windows: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (ws*ws, ws*ws)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Static SW-MSA mask (reference: SwinUnet.py:477-495)."""
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wslice in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, hs, wslice, :] = cnt
            cnt += 1
    m = img_mask.reshape(1, h // ws, ws, w // ws, ws, 1)
    mw = m.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (reference: SwinUnet.py:326-421)."""

    dim: int
    window_size: int
    num_heads: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x, mask: Optional[np.ndarray], train: bool):
        b_, n, c = x.shape
        ws = self.window_size
        hd = c // self.num_heads
        table = self.param(
            "relative_position_bias_table",
            lambda k, s: 0.02 * jax.random.truncated_normal(k, -2.0, 2.0, s),
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads),
        )
        rel_idx = _relative_position_index(ws)
        bias = table[rel_idx.reshape(-1)].reshape(n, n, self.num_heads).transpose(2, 0, 1)

        qkv = Dense(c * 3, name="qkv")(x).reshape(b_, n, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhid,bhjd->bhij", q * (hd ** -0.5), k) + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, self.num_heads, n, n) + jnp.asarray(mask)[None, :, None]
            attn = attn.reshape(-1, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v).transpose(0, 2, 1, 3).reshape(b_, n, c)
        out = Dense(c, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


class SwinBlock(nn.Module):
    """Reference: SwinUnet.py:424-531 (SwinTransformerBlock)."""

    dim: int
    input_resolution: Sequence[int]
    num_heads: int
    window_size: int = 8
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool):
        h, w = self.input_resolution
        ws, shift = self.window_size, self.shift_size
        if min(h, w) <= ws:
            shift = 0
            ws = min(h, w)
        b, l, c = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x).reshape(b, h, w, c)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = _shift_attn_mask(h, w, ws, shift)
        else:
            mask = None
        xw = window_partition(x, ws)
        attn = WindowAttention(c, ws, self.num_heads, self.attn_drop, self.drop, name="attn")(xw, mask, train)
        x = window_reverse(attn, ws, h, w)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x.reshape(b, l, c)
        dp = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp(x, train)

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = Dense(int(c * self.mlp_ratio), name="fc1")(y)
        y = jax.nn.gelu(y)
        y = nn.Dropout(self.drop, deterministic=not train)(y)
        y = Dense(c, name="fc2")(y)
        y = nn.Dropout(self.drop, deterministic=not train)(y)
        return x + dp(y, train)


class PatchMerging(nn.Module):
    """Reference: SwinUnet.py:552-588."""

    input_resolution: Sequence[int]
    dim: int

    @nn.compact
    def __call__(self, x):
        h, w = self.input_resolution
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1
        ).reshape(b, -1, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return Dense(2 * c, use_bias=False, name="reduction")(x)


class PatchExpand(nn.Module):
    """Reference: SwinUnet.py:601-623."""

    input_resolution: Sequence[int]
    dim: int

    @nn.compact
    def __call__(self, x):
        h, w = self.input_resolution
        x = Dense(2 * self.dim, use_bias=False, name="expand")(x)
        b, l, c = x.shape
        x = x.reshape(b, h, w, 2, 2, c // 4).transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, c // 4)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class FinalPatchExpandX4(nn.Module):
    """Reference: SwinUnet.py:626-651."""

    input_resolution: Sequence[int]
    dim: int

    @nn.compact
    def __call__(self, x):
        h, w = self.input_resolution
        x = Dense(16 * self.dim, use_bias=False, name="expand")(x)
        b, l, c = x.shape
        x = x.reshape(b, h, w, 4, 4, c // 16).transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, self.dim)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class SwinTransformerSys(nn.Module):
    """Reference: SwinUnet.py:831-1033."""

    img_size: int = 256
    patch_size: int = 4
    in_chans: int = 5
    num_classes: int = 20
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 8
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    patch_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        nl = len(self.depths)
        pr = self.img_size // self.patch_size
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()

        # patch embed
        b = x.shape[0]
        x = Conv2d(self.embed_dim, self.patch_size, self.patch_size, 0, name="patch_embed_proj")(x)
        x = x.reshape(b, pr * pr, self.embed_dim)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm")(x)
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)

        def stage(x, dim, res, depth, heads, dp_slice, name, train):
            for i in range(depth):
                x = SwinBlock(
                    dim, res, heads, self.window_size,
                    0 if i % 2 == 0 else self.window_size // 2,
                    self.mlp_ratio, self.drop_rate, self.attn_drop_rate,
                    dp_slice[i], name=f"{name}_blk{i}",
                )(x, train)
            return x

        skips = []
        for il in range(nl):
            dim = self.embed_dim * (2 ** il)
            res = (pr // (2 ** il), pr // (2 ** il))
            skips.append(x)
            dp = dpr[sum(self.depths[:il]) : sum(self.depths[: il + 1])]
            x = stage(x, dim, res, self.depths[il], self.num_heads[il], dp, f"layer{il}", train)
            if il < nl - 1:
                x = PatchMerging(res, dim, name=f"merge{il}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)

        # decoder (quirk: uses encoder depths, SwinUnet.py:932-946)
        for il in range(nl):
            inv = nl - 1 - il
            dim = self.embed_dim * (2 ** inv)
            res = (pr // (2 ** inv), pr // (2 ** inv))
            if il == 0:
                x = PatchExpand(res, dim, name="up0")(x)
            else:
                x = jnp.concatenate([x, skips[3 - il]], axis=-1)
                x = Dense(dim, name=f"concat_back_dim{il}")(x)
                dp = dpr[sum(self.depths[:inv]) : sum(self.depths[: inv + 1])]
                x = stage(x, dim, res, self.depths[inv], self.num_heads[inv], dp, f"layer_up{il}", train)
                if il < nl - 1:
                    x = PatchExpand(res, dim, name=f"up{il}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm_up")(x)

        x = FinalPatchExpandX4((pr, pr), self.embed_dim, name="up_final")(x)
        x = x.reshape(b, 4 * pr, 4 * pr, self.embed_dim)
        return Conv2d(self.num_classes, 1, 1, 0, use_bias=False, name="output")(x)


class SwinUnet(nn.Module):
    """Wrapper (reference: SwinUnet.py:1038-1068).
    Contract: (B, T_in, 1, H, W) -> (B, num_classes, 1, H, W)."""

    num_classes: int
    img_size: int = 256
    in_chans: int = 5

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x[:, :, 0].transpose(0, 2, 3, 1)
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        logits = SwinTransformerSys(
            img_size=self.img_size, in_chans=self.in_chans,
            num_classes=self.num_classes, name="swin_unet",
        )(x, train)
        return logits.transpose(0, 3, 1, 2)[:, :, None]


def create_swin_unet(output_frames: int, img_size: int = 256) -> SwinUnet:
    """Explicit replacement for the reference's import-time yacs/argparse
    config load (SwinUnet.py:1109-1227)."""
    return SwinUnet(num_classes=output_frames, img_size=img_size)
