"""ConvLSTM encoder-forecaster (reference: models/ConvLSTM.py).

Three conv-downsample stages each feeding a ConvLSTM over T_in; the
forecaster runs the mirror stack autoregressively for T_out steps from
the encoder's final states (reference: ConvLSTM.py:100-197). The
reference's Python time loops become lax.scan over the time axis.

Documented deviations:
  * The reference's peephole weights Wci/Wcf/Wco are created as
    ``nn.Parameter(zeros).to(device)`` (ConvLSTM.py:26-28) — on CUDA
    ``.to`` returns a plain tensor, so they are frozen zeros there.
    Here they are genuine learnable parameters (zero-init, so the
    initial function is identical).
  * The reference builds module-level singleton encoder/forecaster
    objects shared by every create_ConvLSTM call (ConvLSTM.py:251-259)
    and bakes batch_size into buffer shapes; construction here is
    explicit and shape-polymorphic.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from adnm_tpu.core.layers import Conv2d, ConvTranspose2d


def leaky(x):
    return jax.nn.leaky_relu(x, 0.2)


class ConvLSTMCell(nn.Module):
    """Peephole ConvLSTM cell (reference: ConvLSTM.py:14-65). NHWC."""

    input_channel: int
    num_filter: int
    state_hw: Tuple[int, int]
    kernel_size: int = 3

    @nn.compact
    def __call__(self, carry, x: Optional[jax.Array]):
        h, c = carry
        nf = self.num_filter
        sh, sw = self.state_hw
        wci = self.param("Wci", nn.initializers.zeros, (sh, sw, nf), jnp.float32)
        wcf = self.param("Wcf", nn.initializers.zeros, (sh, sw, nf), jnp.float32)
        wco = self.param("Wco", nn.initializers.zeros, (sh, sw, nf), jnp.float32)
        if x is None:
            x = jnp.zeros(h.shape[:-1] + (self.input_channel,), h.dtype)
        cat = jnp.concatenate([x, h], axis=-1)
        gates = Conv2d(nf * 4, self.kernel_size, 1, (self.kernel_size - 1) // 2, name="conv")(cat)
        i, f, tmp_c, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i + wci * c)
        f = jax.nn.sigmoid(f + wcf * c)
        c = f * c + i * jnp.tanh(tmp_c)
        o = jax.nn.sigmoid(o + wco * c)
        h = o * jnp.tanh(c)
        return (h, c), h


class ConvLSTMLayer(nn.Module):
    """Runs a cell over time via nn.scan. inputs: (T, B, H, W, C) or None
    (rollout with zero inputs for seq_len steps)."""

    input_channel: int
    num_filter: int
    state_hw: Tuple[int, int]
    kernel_size: int = 3

    @nn.compact
    def __call__(self, inputs: Optional[jax.Array], states, seq_len: int, batch: int):
        sh, sw = self.state_hw
        if states is None:
            shape = (batch, sh, sw, self.num_filter)
            states = (jnp.zeros(shape), jnp.zeros(shape))
        cell = nn.scan(
            ConvLSTMCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(self.input_channel, self.num_filter, self.state_hw, self.kernel_size, name="cell")
        if inputs is None:
            zeros = jnp.zeros((seq_len, batch, sh, sw, self.input_channel))
            (h, c), outs = cell(states, zeros)
        else:
            (h, c), outs = cell(states, inputs)
        return outs, (h, c)


def _apply_seq(layer_fn, x):
    """Apply a per-frame conv stack to (T, B, H, W, C) by folding T into B."""
    t, b = x.shape[:2]
    y = layer_fn(x.reshape((t * b,) + x.shape[2:]))
    return y.reshape((t, b) + y.shape[1:])


class ConvLSTMEF(nn.Module):
    """Encoder-forecaster wrapper (reference: ConvLSTM.py:184-197).
    Contract: (B, T_in, 1, H, W) -> (B, T_out, 1, H, W). H=W=256 for the
    reference spec; other sizes scale the stage grids by H/256.
    """

    output_seq_len: int
    base_size: int = 256

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        b, t_in, _, H, W = x.shape
        s1, s2, s3 = H // 4, H // 16, H // 32  # stage grids (64, 16, 8 at 256)
        x = x[:, :, 0, :, :, None].transpose(1, 0, 2, 3, 4)  # (T, B, H, W, 1)

        # ---- encoder (specs: ConvLSTM.py:211-226) ----------------------
        e_stage1 = lambda v: leaky(Conv2d(8, 6, 4, 1, name="e1_conv")(v))
        e_stage2 = lambda v: leaky(Conv2d(192, 4, 4, 1, name="e2_conv")(v))
        e_stage3 = lambda v: leaky(Conv2d(192, 3, 2, 1, name="e3_conv")(v))

        x1 = _apply_seq(e_stage1, x)
        o1, st1 = ConvLSTMLayer(8, 64, (s1, s1), name="e_rnn1")(x1, None, t_in, b)
        x2 = _apply_seq(e_stage2, o1)
        o2, st2 = ConvLSTMLayer(192, 192, (s2, s2), name="e_rnn2")(x2, None, t_in, b)
        x3 = _apply_seq(e_stage3, o2)
        o3, st3 = ConvLSTMLayer(192, 192, (s3, s3), name="e_rnn3")(x3, None, t_in, b)

        # ---- forecaster (specs: ConvLSTM.py:228-247) -------------------
        t_out = self.output_seq_len
        f3, _ = ConvLSTMLayer(192, 192, (s3, s3), name="f_rnn3")(None, st3, t_out, b)
        d1 = _apply_seq(lambda v: leaky(ConvTranspose2d(192, 4, 2, 1, name="f_deconv1")(v)), f3)
        f2, _ = ConvLSTMLayer(192, 192, (s2, s2), name="f_rnn2")(d1, st2, t_out, b)
        d2 = _apply_seq(lambda v: leaky(ConvTranspose2d(64, 6, 4, 1, name="f_deconv2")(v)), f2)
        f1, _ = ConvLSTMLayer(64, 64, (s1, s1), name="f_rnn1")(d2, st1, t_out, b)

        def head(v):
            v = leaky(ConvTranspose2d(8, 6, 4, 1, name="f_deconv3")(v))
            v = leaky(Conv2d(8, 3, 1, 1, name="f_conv2")(v))
            return Conv2d(1, 1, 1, 0, name="f_conv3")(v)

        out = _apply_seq(head, f1)  # (T_out, B, H, W, 1)
        return out.transpose(1, 0, 4, 2, 3)  # (B, T_out, 1, H, W)


def create_conv_lstm(output_frames: int) -> ConvLSTMEF:
    """Reference: ConvLSTM.py:258-259 (create_ConvLSTM)."""
    return ConvLSTMEF(output_seq_len=output_frames)
