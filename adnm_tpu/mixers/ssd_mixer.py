"""ADN-SSD Mamba2 mixer — the reference's novel kernel, TPU-native.

Reference: models/ADNssd.py:49-462 (Mamba2). Per token grid
(B, H, W, d_model):

  1. in_proj -> [z | xBC | dt] (ADNssd.py:100-101,309,315-317).
  2. Dual path: the reference splits xBC channels by even/odd index with
     gather ops (ADNssd.py:329-364) — hostile to TPU tiling. Because
     in_proj/out_proj are learned from scratch, the even/odd split is a
     fixed channel permutation absorbable into the adjacent weight
     matrices, so this implementation lays the two paths out as
     CONTIGUOUS halves (path1 == "even", path2 == "odd") and re-creates
     the reference's within-path2 re-interleave as a pure stack+reshape
     (no gathers/scatters). The full mixer is exactly
     permutation-equivalent to the reference graph: every scan head sees
     the same conv-flavor channel composition as the reference's.
  3. path1: depthwise 3x3 conv + SiLU (ADNssd.py:177-185,334).
     path2: two sub-chunks, each with asymmetric separable depthwise
     convs (1x3 o 3x1 vs 3x1 o 1x3, separate kernels for the x and BC
     parts: 8 small convs, ADNssd.py:106-170,343-346).
  4. dt/A/D head-halves per path (contiguous, vs ADNssd.py:374-386
     even/odd); z gets its own depthwise 3x3 + SiLU (ADNssd.py:234-243,
     388-390).
  5. Scan: non-causal linear-attention duality per path (default,
     ADNssd.py:394-411) or bimamba chunked scan (fwd + flipped,
     ADNssd.py:414-440).
  6. LayerNorm(y), concat (alpha1*y | alpha1*z) — alpha1 used twice,
     alpha2 unused, quirk preserved (ADNssd.py:245-246,459) —
     then out_proj (ADNssd.py:248,456-461).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from adnm_tpu.core.layers import Conv2d, Dense, scalar_param
from adnm_tpu.ops.ssd import (
    linear_attn_dual,
    linear_attn_dual_seqminor,
    ssd_chunked_scan,
)


def _dt_bias_init(key, nheads, dt_min=0.001, dt_max=0.1, dt_init_floor=1e-4):
    """log-uniform dt init -> inverse softplus (ADNssd.py:201-208)."""
    u = jax.random.uniform(key, (nheads,))
    dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
    dt = jnp.maximum(dt, dt_init_floor)
    return dt + jnp.log(-jnp.expm1(-dt))


def _a_log_init(key, nheads, a_min=1.0, a_max=16.0):
    """A ~ U(1, 16), stored as log (ADNssd.py:213-217)."""
    return jnp.log(jax.random.uniform(key, (nheads,), minval=a_min, maxval=a_max))


class ADNSSDMixer(nn.Module):
    """Input/output: (B, H, W, d_model) spatial grids (sequence form is a
    free reshape in NHWC)."""

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
    # Use the sequence-minor duality layout once L reaches this size
    # (ops/ssd.py linear_attn_dual_seqminor: avoids 8-32x lane-padding
    # of the (B, L, small) tensors in HBM at the refiner's L=65536;
    # below it the transposes aren't worth it and L itself would pad).
    seq_minor_min_l: int = 16384

    @nn.compact
    def __call__(self, u: jax.Array) -> jax.Array:
        b, h, w, d = u.shape
        d_inner = self.expand * self.d_model
        nheads = d_inner // self.headdim
        assert d_inner % self.headdim == 0 and nheads % 2 == 0
        gN = self.ngroups * self.d_state  # total B (== C) channels
        conv_dim = d_inner + 2 * gN
        d_in_proj = 2 * d_inner + 2 * gN + nheads

        zxbcdt = Dense(d_in_proj, use_bias=self.bias, dtype=self.dtype, name="in_proj")(u)
        z, xBC, dt = jnp.split(zxbcdt, [d_inner, 2 * d_inner + 2 * gN], axis=-1)

        dt_bias = self.param("dt_bias", lambda k: _dt_bias_init(k, nheads))
        dt = jax.nn.softplus(dt + dt_bias)  # (B, H, W, nheads)
        A_log = self.param("A_log", lambda k: _a_log_init(k, nheads))
        A = -jnp.exp(A_log)
        D = self.param("D", nn.initializers.ones, (nheads,), jnp.float32)

        # --- dual path (contiguous halves; see module docstring) -------
        half = conv_dim // 2  # = d_inner//2 + gN
        xBC1, xBC2 = xBC[..., :half], xBC[..., half:]

        # path1: depthwise d_conv x d_conv + SiLU
        pad = (self.d_conv - 1) // 2
        xBC1 = jax.nn.silu(
            Conv2d(half, self.d_conv, 1, pad, groups=half, use_bias=self.conv_bias,
                   dtype=self.dtype, name="conv2d")(xBC1)
        )

        # path2: two sub-chunks with asymmetric separable depthwise convs.
        # Sub-chunk layout: [x2a | x2b | bc2a | bc2b] with x halves of
        # d_inner//4 and bc halves of gN//2 each.
        qx = d_inner // 4
        qbc = gN // 2
        x2a = xBC2[..., :qx]
        x2b = xBC2[..., qx : 2 * qx]
        bc2a = xBC2[..., 2 * qx : 2 * qx + qbc]
        bc2b = xBC2[..., 2 * qx + qbc :]

        def sep(xx, c, k1, k2, name):
            # k1 then k2 (torch composes conv_13(conv_31(x)) etc.)
            xx = Conv2d(c, k1, 1, (k1[0] // 2, k1[1] // 2), groups=c,
                        use_bias=self.conv_bias, dtype=self.dtype, name=f"{name}_a")(xx)
            xx = Conv2d(c, k2, 1, (k2[0] // 2, k2[1] // 2), groups=c,
                        use_bias=self.conv_bias, dtype=self.dtype, name=f"{name}_b")(xx)
            return jax.nn.silu(xx)

        x2a = sep(x2a, qx, (3, 1), (1, 3), "conv_x1")   # conv_13_x1(conv_31_x1(.))
        x2b = sep(x2b, qx, (1, 3), (3, 1), "conv_x2")   # conv_31_x2(conv_13_x2(.))
        bc2a = sep(bc2a, qbc, (1, 3), (3, 1), "conv_bc1")  # conv_31_bc1(conv_13_bc1(.))
        bc2b = sep(bc2b, qbc, (3, 1), (1, 3), "conv_bc2")  # conv_13_bc2(conv_31_bc2(.))

        # Re-assemble path2 with the reference's channel interleave
        # (odd_part[:, ::2] = xbc_oe, [:, 1::2] = xbc_oo, ADNssd.py:354-364)
        # as a pure stack+reshape — each scan head mixes both asymmetric-
        # conv flavors exactly as in the reference, so the whole mixer is
        # permutation-equivalent to the reference graph.
        def interleave(a, b):
            return jnp.stack([a, b], axis=-1).reshape(*a.shape[:-1], a.shape[-1] * 2)

        x1 = xBC1[..., : d_inner // 2]
        B1 = xBC1[..., d_inner // 2 : d_inner // 2 + gN // 2]
        C1 = xBC1[..., d_inner // 2 + gN // 2 :]
        x2 = interleave(x2a, x2b)
        B2 = interleave(bc2a[..., : qbc // 2], bc2b[..., : qbc // 2])
        C2 = interleave(bc2a[..., qbc // 2 :], bc2b[..., qbc // 2 :])

        # dt / A / D head-halves
        hh = nheads // 2
        dt1, dt2 = dt[..., :hh], dt[..., hh:]
        A1, A2 = A[:hh], A[hh:]
        D1, D2 = D[:hh], D[hh:]

        # z gate conv
        z = jax.nn.silu(
            Conv2d(d_inner, self.d_conv, 1, pad, groups=d_inner,
                   use_bias=self.conv_bias, dtype=self.dtype, name="conv2d_z")(z)
        )

        # --- scans (sequence form: free reshape) ------------------------
        l = h * w

        def to_seq(t):
            return t.reshape(b, l, *t.shape[3:])

        def scan(xx, dd, AA, BB, CC, DD, reverse: bool):
            from adnm_tpu.parallel.mesh import maybe_shard

            if self.linear_attn_duality and l >= self.seq_minor_min_l:
                # Sequence-minor layout for the huge-L refiner mixers:
                # one transpose in/out keeps every (L x small) duality
                # tensor unpadded in HBM (see linear_attn_dual_seqminor).
                def to_seq_t(t):  # (B, H, W, C) -> (B, C, L)
                    return jnp.moveaxis(t, -1, 1).reshape(b, t.shape[-1], l)

                xx = to_seq_t(xx).reshape(b, hh, self.headdim, l)
                dd, BB, CC = to_seq_t(dd), to_seq_t(BB), to_seq_t(CC)
                xx = maybe_shard(xx, "data", "model", None, "seq")
                dd = maybe_shard(dd, "data", "model", "seq")
                y = linear_attn_dual_seqminor(
                    xx, dd, AA, BB, CC, DD, self.ssd_positive_dA
                )
                return jnp.moveaxis(y.reshape(b, hh * self.headdim, l), 1, -1)

            xx = to_seq(xx).reshape(b, l, hh, self.headdim)
            dd, BB, CC = to_seq(dd), to_seq(BB), to_seq(CC)
            # Tensor parallelism over the scan heads: under a mesh with a
            # 'model' axis the per-head state spaces are independent, so
            # the duality/scan partitions over heads with zero collectives
            # until the channel merge below; 'seq' co-shards L when that
            # axis is present (no-op otherwise — maybe_shard drops absent
            # axis names).
            xx = maybe_shard(xx, "data", "seq", "model", None)
            dd = maybe_shard(dd, "data", "seq", "model")
            if self.linear_attn_duality:
                y = linear_attn_dual(xx, dd, AA, BB, CC, DD, self.ssd_positive_dA)
            else:
                if reverse:
                    xx, dd, BB, CC = (jnp.flip(t, axis=1) for t in (xx, dd, BB, CC))
                # XLA chunked scan (a Pallas VMEM-carry kernel was
                # A/B'd against it at the refiner shapes and cut; r5
                # honest re-A/B in README "Kernel A/B").
                y = ssd_chunked_scan(xx, dd, AA, BB, CC, DD, self.chunk_size)
                if reverse:
                    y = jnp.flip(y, axis=1)
            return y.reshape(b, l, hh * self.headdim)

        y1 = scan(x1, dt1, A1, B1, C1, D1, reverse=False)
        y2 = scan(x2, dt2, A2, B2, C2, D2, reverse=self.bimamba)
        # channel-interleaved merge (reference y[..., ::2]=y1, ADNssd.py:409-411)
        y = jnp.stack([
            y1.reshape(b, l, -1), y2.reshape(b, l, -1)
        ], axis=-1).reshape(b, l, d_inner)

        # LayerNorm with bias, torch eps (ADNssd.py:226,456)
        y = nn.LayerNorm(epsilon=1e-5, name="norm")(y)
        alpha1 = scalar_param(self, "alpha1", 1.0)
        scalar_param(self, "alpha2", 1.0)  # exists but unused (ADNssd.py:459)
        z = to_seq(z)
        y = jnp.concatenate([alpha1 * y, alpha1 * z], axis=-1)
        out = Dense(self.d_model, use_bias=self.bias, dtype=self.dtype, name="out_proj")(y)
        return out.reshape(b, h, w, self.d_model)
