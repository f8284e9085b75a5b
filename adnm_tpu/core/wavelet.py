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

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

import math

from adnm_tpu.core.layers import (
    Conv2d,
    _ACTS,
    _NORMS,
    gate_cast,
    _grouped_conv_native,
    _resolve_pads,
    grouped_conv,
    mesh_needs_exact_weight_grad,
    scalar_param,
)


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


def haar_dwt_cat(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channels [LL | HL | LH | HH]
    (subband-MAJOR concat).

    Same math as ``haar_dwt`` up to a channel permutation
    (``cat[..., s*C + ch] == haar_dwt(x)[..., ch, s]``), but
    TPU-layout-friendly: ``haar_dwt``'s 6-D ``(.., 2, .., 2, C)``
    reshape and ``(.., C, 4)`` subband stack put tiny dims in the two
    minormost positions, which XLA:TPU tile-pads to (sublane, 128-lane)
    — up to 32x HBM bloat on every materialized wavelet tensor (a large
    share of the r4 step's measured ~10x bytes-accessed inflation).
    Here every intermediate keeps (W/2, 2C) or larger minor dims: the W
    pair-fold is a free row-major reshape into channels, the H split is
    a third-minor slice, and the subband concat rides the channel axis.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h, w // 2, 2 * c)  # W pairs -> channels [even | odd]
    x = x.reshape(b, h // 2, 2, w // 2, 2 * c)
    top, bot = x[:, :, 0], x[:, :, 1]  # even / odd rows, (B, H/2, W/2, 2C)
    a, bb = top[..., :c], top[..., c:]
    cc, d = bot[..., :c], bot[..., c:]
    ll = (a + bb + cc + d) * 0.5
    hl = (a + bb - cc - d) * 0.5
    lh = (a - bb + cc - d) * 0.5
    hh = (a - bb - cc + d) * 0.5
    return jnp.concatenate([ll, hl, lh, hh], axis=-1)


def haar_idwt_cat(y: jax.Array) -> jax.Array:
    """(B, H/2, W/2, 4C) [LL|HL|LH|HH] -> (B, H, W, C): exact inverse of
    ``haar_dwt_cat`` (same layout rationale)."""
    b, h2, w2, c4 = y.shape
    c = c4 // 4
    ll, hl, lh, hh = (y[..., i * c:(i + 1) * c] for i in range(4))
    a = (ll + hl + lh + hh) * 0.5
    bb = (ll + hl - lh - hh) * 0.5
    cc = (ll - hl + lh - hh) * 0.5
    d = (ll - hl - lh + hh) * 0.5
    top = jnp.concatenate([a, bb], axis=-1)  # (B, H/2, W/2, 2C)
    bot = jnp.concatenate([cc, d], axis=-1)
    out = jnp.stack([top, bot], axis=2)  # (B, H/2, 2, W/2, 2C): minor dims intact
    return out.reshape(b, h2 * 2, w2, 2 * c).reshape(b, h2 * 2, w2 * 2, c)


class _RefOrderDepthwiseConv(nn.Module):
    """Bias-free depthwise conv whose kernel PARAM keeps the reference's
    per-channel subband-block channel order ([c0:(LL,HL,LH,HH), c1:...],
    WTConv2d.py:26-33) while the DATA runs subband-major ([LL|HL|LH|HH],
    haar_dwt_cat): the static (4c,) permutation is applied to the KERNEL
    at trace time (a 4c-element gather — free) rather than to the
    activations. Param path/name/init match Conv2d's, so importers,
    checkpoints, and goldens see an identical tree; the mesh-aware
    weight-grad gate is the same as Conv2d's groups>1 path."""

    features: int
    kernel_size: int
    perm: Tuple[int, ...]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        fan_in = k * k  # cin//groups * kh * kw with cin==groups

        def kernel_init(key, shape, dtype=jnp.float32):
            a = math.sqrt(5.0)
            gain = math.sqrt(2.0 / (1 + a * a))
            kb = math.sqrt(3.0) * gain / math.sqrt(fan_in)
            return jax.random.uniform(key, shape, dtype, -kb, kb)

        kernel = self.param(
            "kernel", kernel_init, (k, k, 1, self.features), jnp.float32
        )
        kernel = kernel[..., jnp.asarray(self.perm)].astype(x.dtype)
        if mesh_needs_exact_weight_grad():
            return grouped_conv(x, kernel, (1, 1), "SAME", self.features)
        pads, _, _ = _resolve_pads(x.shape, kernel.shape, (1, 1), "SAME")
        return _grouped_conv_native(x, kernel, (1, 1), pads, self.features)


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
        # PARAMETER layout is per-channel subband blocks
        # [c0:(LL,HL,LH,HH), c1:(...), ...] — the reference's
        # wavelet_convs channel order (WTConv2d.py:26-33), preserved so
        # importers/checkpoints are unaffected. The DATA runs in the
        # subband-major [LL|HL|LH|HH] concat layout of haar_dwt_cat
        # (layout rationale there), so the depthwise kernel/scale are
        # gathered through this static permutation at trace time
        # (4c elements — free): data channel s*c + ch <=> param channel
        # ch*4 + s. Depthwise ops are per-channel independent, so the
        # permuted-conv result is exactly the old per-channel-block one.
        # perm[j] for data (subband-major) channel j = s*c + ch is the
        # param (per-channel-block) channel ch*4 + s.
        perm = tuple((j % c) * 4 + j // c for j in range(4 * c))

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
            flat = haar_dwt_cat(cur)  # (b, h/2, w/2, 4c) [LL|HL|LH|HH]
            cur = flat[..., :c]
            # Depthwise conv over all 4 subbands of every channel
            # (kernel param in reference channel order; see module above).
            flat = _RefOrderDepthwiseConv(
                c * 4, self.kernel_size, perm, name=f"wavelet_conv{lvl}"
            )(flat)
            wscale = self.param(
                f"wavelet_scale{lvl}",
                lambda _, shape: jnp.full(shape, 0.1, jnp.float32),
                (c * 4,),
            )
            flat = flat * gate_cast(flat, wscale)[jnp.asarray(perm)]
            lls.append(flat[..., :c])
            highs.append(flat[..., c:])

        next_ll = 0.0
        for lvl in range(self.wt_levels - 1, -1, -1):
            ll = lls[lvl] + next_ll
            sub = jnp.concatenate([ll, highs[lvl]], axis=-1)
            next_ll = haar_idwt_cat(sub)
            sh = shapes[lvl]
            next_ll = next_ll[:, : sh[1], : sh[2], :]

        base = Conv2d(c, self.kernel_size, 1, "same", groups=c, use_bias=self.use_bias, name="base_conv")(x)
        bscale = self.param("base_scale", nn.initializers.ones, (c,), jnp.float32)
        out = base * gate_cast(base, bscale) + next_ll
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
            scale, shift = gate_cast(
                x, scalar_param(self, "scale", 1.0), scalar_param(self, "shift", 0.0))
            x = scale * _NORMS[self.norm](self.channels)(x) + shift
        if self.act is not None:
            x = _ACTS[self.act](x)
        return x
