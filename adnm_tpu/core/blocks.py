"""Composite blocks of the ADNM-UNet family (NHWC).

TPU-native re-designs of the reference's composite modules
(reference: models/model_untils.py:226-892). Everything operates on
(B, H, W, D); the reference's (B, L, D) <-> NCHW permute round-trips are
gone — sequence mixers reshape to (B, H*W, D) for free at their boundary.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from adnm_tpu.core.layers import (
    ConvFFD,
    ConvLayer,
    DeConvLayer,
    Dense,
    FeedForward,
    IntensityGate,
    Mlp,
    Swish,
    gate_cast,
    scalar_param,
)
from adnm_tpu.core.wavelet import WTConvLayer


def _norm_name(instance_norm: bool, groups: int = 4) -> str:
    return "instance" if instance_norm else f"group{groups}"


class PatchEmbed(nn.Module):
    """WTConv residual -> 3x3 conv to embed_dim -> WTConv+norm residual,
    with learnable alpha/beta mixing and gamma channel scale. Also returns
    the last input frame as the global output residual.

    Reference: models/model_untils.py:226-314 (PatchEmbed). Input is the
    (B, H, W, T_in) frame stack; ``res`` is x[..., -1] (the most recent
    frame, model_untils.py:304).
    """

    in_channels: int
    embed_dim: int
    kernel: int = 6
    wt_levels: int = 2
    ls_init_value: Optional[float] = 1.0
    instance_norm: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        res = x[..., -1]  # (B, H, W) last input frame
        alpha1, beta1, alpha2, beta2 = gate_cast(
            x,
            scalar_param(self, "alpha1", 1.0),
            scalar_param(self, "beta1", 1.0),
            scalar_param(self, "alpha2", 1.0),
            scalar_param(self, "beta2", 1.0),
        )

        c1 = WTConvLayer(self.in_channels, self.kernel, 1, self.wt_levels, use_bias=False, act="gelu", name="conv1")(x)
        x = alpha1 * c1 + beta1 * x
        shortcut = ConvLayer(self.embed_dim, (3, 3), (1, 1), (1, 1), use_bias=False, act="gelu", name="conv2")(x)
        c3 = WTConvLayer(
            self.embed_dim, self.kernel, 1, self.wt_levels, use_bias=False,
            norm=_norm_name(self.instance_norm), name="conv3",
        )(shortcut)
        x = alpha2 * c3 + beta2 * shortcut
        if self.ls_init_value is not None:
            gamma = self.param(
                "gamma", lambda _, s: jnp.full(s, self.ls_init_value, jnp.float32), (self.embed_dim,)
            )
            x = x * gate_cast(x, gamma)
        return x, res


class SimplePatchEmbed(nn.Module):
    """Single-conv patch embed variant
    (reference: models/model_untils.py:318-355)."""

    in_channels: int
    embed_dim: int
    kernel: int = 6
    instance_norm: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        res = x[..., -1]
        x = ConvLayer(
            self.embed_dim, (self.kernel, self.kernel), (1, 1),
            ((self.kernel - 1) // 2, (self.kernel - 1) // 2),
            use_bias=False, norm=_norm_name(self.instance_norm), name="conv",
        )(x)
        return x, res


class WTLayer(nn.Module):
    """Wavelet-conv stage: optional gated skip-concat, WTConv alpha/beta
    residual, Mlp, gamma scale, 3x3 conv to next_dim.

    Reference: models/model_untils.py:358-426. Quirk preserved: when
    ``residual`` is given, the features concat at :408 is computed and
    DISCARDED — features only contribute on the no-residual path (:410).
    """

    this_dim: int
    next_dim: int
    kernel: int = 5
    wt_levels: int = 2
    use_bias: bool = True
    ls_init_value: Optional[float] = 1.0
    if_res: bool = False
    instance_norm: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        residual: Optional[jax.Array] = None,
        features: Optional[jax.Array] = None,
    ) -> jax.Array:
        gama1, gama2, gama3 = gate_cast(
            x,
            scalar_param(self, "gama1", 1.0),
            scalar_param(self, "gama2", 1.0),
            scalar_param(self, "gama3", 1.0),
        )
        if residual is not None:
            x = jnp.concatenate([gama1 * x, gama2 * residual.astype(x.dtype)], axis=-1)
            # reference :408 computes a features-concat and discards it.
        elif features is not None:
            x = x + gama3 * features.astype(x.dtype)

        alpha, beta = gate_cast(
            x, scalar_param(self, "alpha", 1.0), scalar_param(self, "beta", 1.0))
        d = x.shape[-1]
        norm = _norm_name(self.instance_norm, groups=8 if self.if_res else 4)
        wt = WTConvLayer(d, self.kernel, 1, self.wt_levels, self.use_bias, norm=norm, name="wtconv")(x)
        x = alpha * wt + beta * x
        x = Mlp(d, name="mlp")(x)
        if self.ls_init_value is not None:
            gamma = self.param("gamma", lambda _, s: jnp.full(s, self.ls_init_value, jnp.float32), (d,))
            x = x * gate_cast(x, gamma)
        return ConvLayer(self.next_dim, 3, 1, 1, use_bias=True, act="gelu", name="conv")(x)


class LayerToLayer(nn.Module):
    """Plain-conv stage variant of WTLayer
    (reference: models/model_untils.py:429-465)."""

    this_dim: int
    next_dim: int
    use_bias: bool = True
    if_res: bool = False
    instance_norm: bool = True

    @nn.compact
    def __call__(self, x, residual=None, features=None):
        gama1, gama2, gama3 = gate_cast(
            x,
            scalar_param(self, "gama1", 1.0),
            scalar_param(self, "gama2", 1.0),
            scalar_param(self, "gama3", 1.0),
        )
        if residual is not None:
            x = jnp.concatenate([gama1 * x, gama2 * residual.astype(x.dtype)], axis=-1)
        elif features is not None:
            x = x + gama3 * features.astype(x.dtype)
        norm = _norm_name(self.instance_norm, groups=8 if self.if_res else 4)
        return ConvLayer(self.next_dim, (3, 3), 1, (1, 1), use_bias=self.use_bias, norm=norm, act="gelu", name="conv")(x)


class DownSample(nn.Module):
    """MaxPool2d(ratio) (reference: models/model_untils.py:467-487)."""

    ratio: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        r = self.ratio
        return nn.max_pool(x, window_shape=(r, r), strides=(r, r))


class UpSample(nn.Module):
    """ConvTranspose2d(ratio) upsample via DeConvLayer padding math
    (reference: models/model_untils.py:490-520)."""

    dim: int
    kernel: int = 3
    ratio: int = 2
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return DeConvLayer(
            self.dim, self.ratio, (self.kernel, self.kernel), use_bias=self.use_bias, name="trans_conv"
        )(x)


class ChannelAttBridge(nn.Module):
    """Global channel attention over all skip levels: per-level GAP ->
    concat -> shared conv1d(k=3) -> per-level Linear -> IntensityGate.

    Reference: models/model_untils.py:535-616 (Channel_Att_Bridge,
    split_att='fc'). Returns one (B, 1, 1, C_i) attention map per level
    (the reference expands to full maps; broadcasting is free here).
    """

    c_list: Sequence[int]

    @nn.compact
    def __call__(self, skips: Sequence[jax.Array]) -> Tuple[jax.Array, ...]:
        # skips[i]: (B, H_i, W_i, C_i) -> GAP (B, C_i)
        pooled = [jnp.mean(s, axis=(1, 2)) for s in skips]
        att = jnp.concatenate(pooled, axis=-1)  # (B, sum C)
        # shared Conv1d(1->1, k=3, pad 1) over the channel axis.
        w = self.param(
            "get_all_att_kernel",
            lambda key, s: jax.random.uniform(key, s, jnp.float32, -1 / math.sqrt(3), 1 / math.sqrt(3)),
            (3,),
        )
        b = self.param(
            "get_all_att_bias",
            lambda key, s: jax.random.uniform(key, s, jnp.float32, -1 / math.sqrt(3), 1 / math.sqrt(3)),
            (1,),
        )
        att_p = jnp.pad(att, ((0, 0), (1, 1)))
        att = (
            att_p[:, :-2] * w[0] + att_p[:, 1:-1] * w[1] + att_p[:, 2:] * w[2] + b
        )
        gate = IntensityGate(name="sigmoid1")
        outs = []
        for i, c in enumerate(self.c_list):
            a = Dense(c, name=f"att{i + 1}")(att)
            a = gate(a)
            outs.append(a[:, None, None, :])  # broadcastable over H, W
        return tuple(outs)


class EncoderToDecoder(nn.Module):
    """Multi-scale spatial attention per skip connection.

    Reference: models/model_untils.py:620-794. Three pooling branches
    (max+avg pool with 1x3 / 3x1 / 3x3 windows -> grouped conv -> gate),
    alpha-weighted sum, gamma scale, FeedForward, ConvFFD. Quirk
    preserved: branch 2 reuses ffd13/act_func13 (reference :776-777),
    so ffd31/act_func31 exist but are unused.
    """

    embed_dim: int
    instance_norm: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, res: jax.Array) -> jax.Array:
        # Pin this module spatially replicated (batch sharding only):
        # its padded poolings miscompute when H is 'seq'-sharded (XLA
        # SPMD partitioner defect — padding/halo values leak into
        # outputs; observed inf/1e38 artifacts on the 8-device CPU
        # mesh). It runs only at the three smallest pyramid levels, so
        # replication is cheap; the internal FeedForward also skips its
        # 'seq' annotation (spatial_shard=False).
        from adnm_tpu.parallel.mesh import maybe_shard

        x = maybe_shard(x, "data")
        res = maybe_shard(res, "data")
        d = self.embed_dim
        gama, scale, shift = gate_cast(
            x,
            scalar_param(self, "gama", 1.0),
            scalar_param(self, "scale", 1.0),
            scalar_param(self, "shift", 0.0),
        )
        act_in = IntensityGate(name="act")
        from adnm_tpu.core.layers import _NORMS

        x = act_in(x + gama * res.astype(x.dtype))
        x = scale * _NORMS[_norm_name(self.instance_norm)](d)(x) + shift

        am = jax.sharding.get_abstract_mesh()
        seq_meshed = am is not None and not am.empty and "seq" in am.axis_names

        def pool_pair(v, wh, ww):
            if not seq_meshed:
                # fast path (single chip / DP-only mesh): padded SAME
                # reduce-windows fuse into one pass over the feature map
                pad = ((wh // 2, wh // 2), (ww // 2, ww // 2))
                mx = nn.max_pool(v, (wh, ww), strides=(1, 1), padding=pad)
                av = nn.avg_pool(v, (wh, ww), strides=(1, 1), padding=pad, count_include_pad=True)
                return mx + av
            # Under a 'seq'-sharded mesh: explicit finite padding + VALID
            # windows instead of padded reduce-windows — XLA's SPMD
            # partitioner mishandles max_pool's -inf window padding on a
            # sharded spatial dim (observed inf/NaN on the 8-device CPU
            # mesh when the conv pyramid is 'seq'-sharded), and this
            # module's replication pin above is only a constraint on the
            # input, not on the pool's own operand sharding. Zero-padded
            # VALID avg equals count_include_pad=True SAME exactly;
            # finite-min padding is equivalent for max since every window
            # holds real data. (Costs one padded copy per pool, so it is
            # gated to meshed traces only.)
            pad = ((0, 0), (wh // 2, wh // 2), (ww // 2, ww // 2), (0, 0))
            neg = jnp.finfo(v.dtype).min
            mx = nn.max_pool(
                jnp.pad(v, pad, constant_values=neg), (wh, ww), strides=(1, 1)
            )
            av = nn.avg_pool(jnp.pad(v, pad), (wh, ww), strides=(1, 1))
            return mx + av

        ffd13 = ConvLayer(d, 1, 1, 0, groups=d, name="ffd13")
        gate13 = IntensityGate(name="act_func13")

        # branch 1: 3x1 pool -> 1x3 grouped conv
        x31_pool = pool_pair(x, 3, 1)
        x13_conv = ConvLayer(d, (1, 3), (1, 1), (0, 1), groups=d // 4, act="gelu", name="conv13pool")(x31_pool)
        x1 = gate13(ffd13(x * x13_conv))

        # branch 2: 1x3 pool -> 3x1 grouped conv (shares ffd13/gate13, ref :776)
        x13_pool = pool_pair(x, 1, 3)
        x31_conv = ConvLayer(d, (3, 1), (1, 1), (1, 0), groups=d // 4, act="gelu", name="conv31pool")(x13_pool)
        x2 = gate13(ffd13(x * x31_conv))

        # branch 3: 3x3 pool -> 3x3 grouped conv
        x33_pool = pool_pair(x, 3, 3)
        x33_conv = ConvLayer(d, (3, 3), (1, 1), (1, 1), groups=d // 4, act="gelu", name="conv33pool")(x33_pool)
        x3 = IntensityGate(name="act_func33")(ConvLayer(d, 1, 1, 0, groups=d, name="ffd33")(x * x33_conv))

        alpha1, alpha2, alpha3 = gate_cast(
            x1,
            scalar_param(self, "alpha1", 0.33),
            scalar_param(self, "alpha2", 0.33),
            scalar_param(self, "alpha3", 0.33),
        )
        x_pool = alpha1 * x1 + alpha2 * x2 + alpha3 * x3
        gamma = self.param("gamma", nn.initializers.ones, (d,), jnp.float32)
        x_pool = x_pool * gate_cast(x_pool, gamma)
        x_pool = FeedForward(d, spatial_shard=False, name="ffd")(x_pool)
        return maybe_shard(ConvFFD(d, name="mlp")(x_pool), "data")


class OutProj(nn.Module):
    """Prediction head: WTConv residual stage -> 3x3 expand conv -> 1x1 to
    num_frames -> add alpha-weighted last-input-frame residual -> 3x3 conv
    + learnable Swish.

    Reference: models/model_untils.py:799-892 (OutProj). Output is NHWC
    with num_frames channels; the model wrapper moves frames to the T
    axis.
    """

    num_frames: int
    embed_dim: int
    out_expand: int = 2
    instance_norm: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, residual: Optional[jax.Array]) -> jax.Array:
        d = self.embed_dim
        alpha, beta = gate_cast(
            x, scalar_param(self, "alpha", 1.0), scalar_param(self, "beta", 1.0))
        shortcut = x
        # Reference hard-codes kernel 5 / wt_levels 3 here (:810-815).
        wt = WTConvLayer(
            d, 5, 1, 3, use_bias=False, act="gelu",
            norm=_norm_name(self.instance_norm), name="wtconv",
        )(x)
        x = alpha * wt + beta * shortcut
        gamma = self.param("gamma", nn.initializers.ones, (d,), jnp.float32)
        x = x * gate_cast(x, gamma)
        x = ConvLayer(d * self.out_expand, (3, 3), (1, 1), (1, 1), use_bias=False, act="gelu", name="conv_expand")(x)
        x = ConvLayer(self.num_frames, (1, 1), (1, 1), (0, 0), use_bias=False, act="gelu", name="conv_frames")(x)
        if residual is not None:
            alpha1, alpha2 = gate_cast(
                x, scalar_param(self, "alpha1", 1.0), scalar_param(self, "alpha2", 1.0))
            x = alpha1 * x + alpha2 * residual.astype(x.dtype)[..., None]  # broadcast last frame over T channels
        x = ConvLayer(
            self.num_frames, 3, 1, 1, use_bias=False,
            act_module=lambda: Swish(name="swish_act"), name="conv2",
        )(x)
        return x
