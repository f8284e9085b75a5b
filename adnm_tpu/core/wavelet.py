"""Haar (db1) wavelet transforms and WTConv2d, TPU-native.

The reference (models/WTConv2d.py) builds db1 filter banks with PyWavelets
and runs grouped stride-2 conv / conv_transpose per level. On TPU the Haar
DWT/IDWT is pure 2x2 block arithmetic: a reshape plus adds — no gathers,
no strided convs, fully fusable on the VPU. The db1 taps (+-1/sqrt(2))
are constant-folded; subband order matches the reference's filter stack
(models/WTConv2d.py:13-16): [LL, HL(h-high), LH(w-high), HH].

Orthonormality makes haar_idwt(haar_dwt(x)) == x exactly (up to fp
rounding), which the reference achieves only through matched dec/rec
filter banks.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from adnm_tpu.core.layers import Conv2d, scalar_param, _NORMS, _ACTS


def haar_dwt(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, C, 4) one-level Haar decomposition.

    Subbands (last axis): 0=LL, 1=HL (high along H), 2=LH (high along W),
    3=HH — same order as the reference filter stack (WTConv2d.py:13-16).
    H and W must be even (caller pads, as WTConv2d.py:114-116 does).
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    a = x[:, :, 0, :, 0]
    bb = x[:, :, 0, :, 1]
    cc = x[:, :, 1, :, 0]
    d = x[:, :, 1, :, 1]
    ll = (a + bb + cc + d) * 0.5
    hl = (a + bb - cc - d) * 0.5
    lh = (a - bb + cc - d) * 0.5
    hh = (a - bb - cc + d) * 0.5
    return jnp.stack([ll, hl, lh, hh], axis=-1)


def haar_idwt(y: jax.Array) -> jax.Array:
    """(B, H/2, W/2, C, 4) -> (B, H, W, C): exact inverse of haar_dwt."""
    ll, hl, lh, hh = y[..., 0], y[..., 1], y[..., 2], y[..., 3]
    a = (ll + hl + lh + hh) * 0.5
    bb = (ll + hl - lh - hh) * 0.5
    cc = (ll - hl + lh - hh) * 0.5
    d = (ll - hl - lh + hh) * 0.5
    b, h2, w2, c = ll.shape
    out = jnp.stack(
        [jnp.stack([a, bb], axis=3), jnp.stack([cc, d], axis=3)], axis=2
    )  # (b, h2, 2, w2, 2, c)
    return out.reshape(b, h2 * 2, w2 * 2, c)


class WTConv2d(nn.Module):
    """Multi-level wavelet depthwise conv (reference: models/WTConv2d.py:63-153).

    Per level: Haar DWT -> depthwise k x k conv over the 4*C subband
    channels -> learnable per-channel scale (init 0.1); the LL band
    recurses. Reconstruction inverts level by level via IDWT, summing the
    processed LL of the level below. A parallel depthwise ``base_conv``
    (+ scale init 1.0) processes the input directly. Optional stride
    applies a channelwise ones-filter stride conv (WTConv2d.py:93-98),
    i.e. plain subsampling.
    """

    channels: int
    kernel_size: int = 5
    stride: int = 1
    use_bias: bool = True
    wt_levels: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.channels
        lls = []
        highs = []
        shapes = []
        cur = x
        for lvl in range(self.wt_levels):
            shapes.append(cur.shape)
            ph = cur.shape[1] % 2
            pw = cur.shape[2] % 2
            if ph or pw:
                cur = jnp.pad(cur, ((0, 0), (0, ph), (0, pw), (0, 0)))
            sub = haar_dwt(cur)  # (b, h/2, w/2, c, 4)
            cur = sub[..., 0]
            b, h2, w2, _, _ = sub.shape
            # Depthwise conv over all 4 subbands of every channel.
            flat = sub.reshape(b, h2, w2, c * 4)
            flat = Conv2d(
                c * 4, self.kernel_size, 1, "same", groups=c * 4,
                use_bias=False, name=f"wavelet_conv{lvl}",
            )(flat)
            wscale = self.param(
                f"wavelet_scale{lvl}",
                lambda _, shape: jnp.full(shape, 0.1, jnp.float32),
                (c * 4,),
            )
            flat = flat * wscale
            sub = flat.reshape(b, h2, w2, c, 4)
            lls.append(sub[..., 0])
            highs.append(sub[..., 1:])

        next_ll = 0.0
        for lvl in range(self.wt_levels - 1, -1, -1):
            ll = lls[lvl] + next_ll
            sub = jnp.concatenate([ll[..., None], highs[lvl]], axis=-1)
            next_ll = haar_idwt(sub)
            sh = shapes[lvl]
            next_ll = next_ll[:, : sh[1], : sh[2], :]

        base = Conv2d(c, self.kernel_size, 1, "same", groups=c, use_bias=self.use_bias, name="base_conv")(x)
        bscale = self.param("base_scale", nn.initializers.ones, (c,), jnp.float32)
        out = base * bscale + next_ll
        if self.stride > 1:
            out = out[:, :: self.stride, :: self.stride, :]
        return out


class WTConvLayer(nn.Module):
    """WTConv2d -> scale*norm+shift -> act
    (reference: models/model_untils.py:96-116, WTConvLayer)."""

    channels: int
    kernel_size: int = 3
    stride: int = 1
    wt_levels: int = 2
    use_bias: bool = True
    norm: Optional[str] = None
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = WTConv2d(self.channels, self.kernel_size, self.stride, self.use_bias, self.wt_levels, name="conv")(x)
        if self.norm is not None:
            scale = scalar_param(self, "scale", 1.0)
            shift = scalar_param(self, "shift", 0.0)
            x = scale * _NORMS[self.norm](self.channels)(x) + shift
        if self.act is not None:
            x = _ACTS[self.act](x)
        return x
