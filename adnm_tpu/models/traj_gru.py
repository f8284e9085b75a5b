"""TrajGRU encoder-forecaster (reference: models/TrajGRU.py).

GRU whose hidden-to-hidden connections warp the previous state along L
dynamically generated flow fields (reference: TrajGRU.py:90-209). The
reference's per-trajectory grid_sample loop (:187-189) becomes ONE
batched bilinear warp with the L flows folded into the batch axis; the
reference's Python time loop becomes lax.scan.

Same scaffold/specs as the reference (L=13/13/9 encoder, 13/13/9
forecaster, TrajGRU.py:348-398); the singleton-module and baked
batch-size quirks are dropped as in conv_lstm.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from adnm_tpu.core.layers import Conv2d, ConvTranspose2d
from adnm_tpu.models.conv_lstm import _apply_seq, leaky


def bilinear_warp(img: jax.Array, flow: jax.Array) -> jax.Array:
    """grid_sample(align_corners=True, padding='zeros') equivalent.

    img: (B, H, W, C); flow: (B, H, W, 2) pixel offsets (x, y) added to
    the identity grid (reference: TrajGRU.py:36-53, wrap()).
    """
    b, h, w, c = img.shape
    gx = jnp.arange(w, dtype=flow.dtype)[None, None, :] + flow[..., 0]
    gy = jnp.arange(h, dtype=flow.dtype)[None, :, None] + flow[..., 1]
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0
    flat = img.reshape(b, h * w, c)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = (yi_c * w + xi_c).reshape(b, h * w, 1)
        g = jnp.take_along_axis(flat, idx, axis=1).reshape(b, h, w, c)
        return g * valid[..., None].astype(img.dtype)

    return (
        gather(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
        + gather(y0, x0 + 1) * (wx * (1 - wy))[..., None]
        + gather(y0 + 1, x0) * ((1 - wx) * wy)[..., None]
        + gather(y0 + 1, x0 + 1) * (wx * wy)[..., None]
    )


class TrajGRUCell(nn.Module):
    """One TrajGRU step (reference: TrajGRU.py:150-206). Carry: h.
    Step input: (i2h_t or None, x_t or None)."""

    input_channel: int
    num_filter: int
    L: int = 5
    h2h_kernel: int = 5

    @nn.compact
    def __call__(self, h, step_in):
        i2h_t, x_t = step_in
        nf = self.num_filter

        # flow generator (reference :150-161)
        f = Conv2d(32, 5, 1, 2, name="h2f_conv1")(h)
        if x_t is not None:
            f = f + Conv2d(32, 5, 1, 2, name="i2f_conv1")(x_t)
        f = leaky(f)
        flows = Conv2d(self.L * 2, 5, 1, 2, name="flows_conv")(f)  # (B,H,W,2L)

        b, hh, ww, _ = flows.shape
        # one batched warp for all L trajectories (reference loops :187-189)
        fl = flows.reshape(b, hh, ww, self.L, 2).transpose(0, 3, 1, 2, 4).reshape(b * self.L, hh, ww, 2)
        rep = jnp.broadcast_to(h[:, None], (b, self.L, hh, ww, nf)).reshape(b * self.L, hh, ww, nf)
        warped = bilinear_warp(rep, -fl)
        warped = warped.reshape(b, self.L, hh, ww, nf).transpose(0, 2, 3, 1, 4).reshape(b, hh, ww, self.L * nf)

        h2h = Conv2d(nf * 3, 1, 1, 0, name="ret")(warped)
        h2h_r, h2h_u, h2h_m = jnp.split(h2h, 3, axis=-1)
        if i2h_t is not None:
            i2h_r, i2h_u, i2h_m = jnp.split(i2h_t, 3, axis=-1)
            reset = jax.nn.sigmoid(i2h_r + h2h_r)
            update = jax.nn.sigmoid(i2h_u + h2h_u)
            new_mem = leaky(i2h_m + reset * h2h_m)
        else:
            reset = jax.nn.sigmoid(h2h_r)
            update = jax.nn.sigmoid(h2h_u)
            new_mem = leaky(reset * h2h_m)
        next_h = update * h + (1 - update) * new_mem
        return next_h, next_h


class TrajGRULayer(nn.Module):
    input_channel: int
    num_filter: int
    state_hw: Tuple[int, int]
    L: int = 5
    h2h_kernel: int = 5

    @nn.compact
    def __call__(self, inputs: Optional[jax.Array], state, seq_len: int, batch: int):
        sh, sw = self.state_hw
        if state is None:
            state = jnp.zeros((batch, sh, sw, self.num_filter))
        scan_kwargs = dict(
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        if inputs is not None:
            cell = nn.scan(TrajGRUCell, **scan_kwargs)(
                self.input_channel, self.num_filter, self.L, self.h2h_kernel, name="cell"
            )
            # i2h for all steps in one batched conv (reference :170-174)
            i2h = _apply_seq(
                lambda v: Conv2d(self.num_filter * 3, 3, 1, 1, name="i2h")(v), inputs
            )
            h, outs = cell(state, (i2h, inputs))
        else:
            cell = nn.scan(TrajGRUCell, length=seq_len, **scan_kwargs)(
                self.input_channel, self.num_filter, self.L, self.h2h_kernel, name="cell"
            )
            h, outs = cell(state, (None, None))
        return outs, h


class TrajGRUEF(nn.Module):
    """Reference: TrajGRU.py:330-343 + specs :348-398.
    Contract: (B, T_in, 1, H, W) -> (B, T_out, 1, H, W)."""

    output_seq_len: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        b, t_in, _, H, W = x.shape
        s1, s2, s3 = H // 4, H // 16, H // 32
        x = x[:, :, 0, :, :, None].transpose(1, 0, 2, 3, 4)

        x1 = _apply_seq(lambda v: leaky(Conv2d(8, 6, 4, 1, name="e1_conv")(v)), x)
        o1, st1 = TrajGRULayer(8, 64, (s1, s1), L=13, name="e_rnn1")(x1, None, t_in, b)
        x2 = _apply_seq(lambda v: leaky(Conv2d(192, 4, 4, 1, name="e2_conv")(v)), o1)
        o2, st2 = TrajGRULayer(192, 192, (s2, s2), L=13, name="e_rnn2")(x2, None, t_in, b)
        x3 = _apply_seq(lambda v: leaky(Conv2d(192, 3, 2, 1, name="e3_conv")(v)), o2)
        o3, st3 = TrajGRULayer(192, 192, (s3, s3), L=9, h2h_kernel=3, name="e_rnn3")(x3, None, t_in, b)

        t_out = self.output_seq_len
        f3, _ = TrajGRULayer(192, 192, (s3, s3), L=13, h2h_kernel=3, name="f_rnn3")(None, st3, t_out, b)
        d1 = _apply_seq(lambda v: leaky(ConvTranspose2d(192, 4, 2, 1, name="f_deconv1")(v)), f3)
        f2, _ = TrajGRULayer(192, 192, (s2, s2), L=13, name="f_rnn2")(d1, st2, t_out, b)
        d2 = _apply_seq(lambda v: leaky(ConvTranspose2d(64, 6, 4, 1, name="f_deconv2")(v)), f2)
        f1, _ = TrajGRULayer(64, 64, (s1, s1), L=9, name="f_rnn1")(d2, st1, t_out, b)

        def head(v):
            v = leaky(ConvTranspose2d(8, 6, 4, 1, name="f_deconv3")(v))
            v = leaky(Conv2d(8, 3, 1, 1, name="f_conv2")(v))
            return Conv2d(1, 1, 1, 0, name="f_conv3")(v)

        out = _apply_seq(head, f1)
        return out.transpose(1, 0, 4, 2, 3)


def create_traj_gru(output_frames: int) -> TrajGRUEF:
    """Reference: TrajGRU.py:408-409 (create_TrajGRU)."""
    return TrajGRUEF(output_seq_len=output_frames)
