"""VSSD Mamba2 mixer (the pre-ADN variant, selectable in the reference
via the import switch at models/ADNMUNet.py:23-24).

Reference: models/Vssd.py:48-283. Single depthwise conv over the whole
xBC block, grouped (ngroups=2) linear-attention duality or bimamba
chunked scan, then y = LayerNorm(y) * z gate and out_proj.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from adnm_tpu.core.layers import Conv2d, Dense
from adnm_tpu.mixers.ssd_mixer import _a_log_init, _dt_bias_init
from adnm_tpu.ops.ssd import linear_attn_dual, ssd_chunked_scan


class VSSDMixer(nn.Module):
    d_model: int
    headdim: int = 8
    d_conv: int = 3
    expand: int = 2
    ngroups: int = 2
    d_state: int = 16
    chunk_size: int = 256
    linear_attn_duality: bool = True
    bimamba: bool = True
    ssd_positive_dA: bool = True
    conv_bias: bool = False
    bias: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, u: jax.Array) -> jax.Array:
        b, h, w, d = u.shape
        d_inner = self.expand * self.d_model
        nheads = d_inner // self.headdim
        g = self.ngroups
        gN = g * self.d_state
        l = h * w

        zxbcdt = Dense(2 * d_inner + 2 * gN + nheads, use_bias=self.bias, dtype=self.dtype, name="in_proj")(u)
        z, xBC, dt = jnp.split(zxbcdt, [d_inner, 2 * d_inner + 2 * gN], axis=-1)
        dt_bias = self.param("dt_bias", lambda k: _dt_bias_init(k, nheads))
        dt = jax.nn.softplus(dt + dt_bias)
        A = -jnp.exp(self.param("A_log", lambda k: _a_log_init(k, nheads)))
        D = self.param("D", nn.initializers.ones, (nheads,), jnp.float32)

        pad = (self.d_conv - 1) // 2
        conv_dim = d_inner + 2 * gN
        xBC = jax.nn.silu(
            Conv2d(conv_dim, self.d_conv, 1, pad, groups=conv_dim,
                   use_bias=self.conv_bias, dtype=self.dtype, name="conv2d")(xBC)
        )
        x, Bm, Cm = jnp.split(xBC, [d_inner, d_inner + gN], axis=-1)
        x = x.reshape(b, l, nheads, self.headdim)
        dt = dt.reshape(b, l, nheads)
        # head-axis tensor parallelism + L sequence sharding, same recipe
        # as ADNSSDMixer (no-op without the mesh axes)
        from adnm_tpu.parallel.mesh import maybe_shard

        x = maybe_shard(x, "data", "seq", "model", None)
        dt = maybe_shard(dt, "data", "seq", "model")
        Bm = Bm.reshape(b, l, g, self.d_state)
        Cm = Cm.reshape(b, l, g, self.d_state)

        if self.linear_attn_duality:
            # grouped duality: head i uses group i % g
            # (reference Vssd.py:186-206 views heads as (H//g, g))
            ys = []
            for gi in range(g):
                xg = x.reshape(b, l, nheads // g, g, self.headdim)[:, :, :, gi]
                dtg = dt.reshape(b, l, nheads // g, g)[..., gi]
                Ag = A.reshape(nheads // g, g)[:, gi]
                Dg = D.reshape(nheads // g, g)[:, gi]
                ys.append(
                    linear_attn_dual(xg, dtg, Ag, Bm[:, :, gi], Cm[:, :, gi], Dg, self.ssd_positive_dA)
                )
            y = jnp.stack(ys, axis=3)  # (B, L, H//g, g, P)
            y = y.reshape(b, l, d_inner)
        else:
            # bimamba: head-halves forward/backward (Vssd.py:246-261)
            hh = nheads // 2
            x1, x2 = x[:, :, :hh], x[:, :, hh:]
            dt1, dt2 = dt[..., :hh], dt[..., hh:]
            A1, A2 = A[:hh], A[hh:]
            D1, D2 = D[:hh], D[hh:]
            B1, C1 = Bm[:, :, 0], Cm[:, :, 0]
            B2, C2 = Bm[:, :, 1], Cm[:, :, 1]
            y1 = ssd_chunked_scan(x1, dt1, A1, B1, C1, D1, self.chunk_size)
            y2 = ssd_chunked_scan(
                jnp.flip(x2, 1), jnp.flip(dt2, 1), A2, jnp.flip(B2, 1), jnp.flip(C2, 1), D2, self.chunk_size
            )
            y = jnp.concatenate([y1, jnp.flip(y2, 1)], axis=2).reshape(b, l, d_inner)

        y = nn.LayerNorm(epsilon=1e-5, name="norm")(y)
        y = y * z.reshape(b, l, d_inner)
        out = Dense(self.d_model, use_bias=self.bias, dtype=self.dtype, name="out_proj")(y)
        return out.reshape(b, h, w, self.d_model)
