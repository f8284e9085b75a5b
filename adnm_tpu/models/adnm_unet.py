"""ADNM-UNet (the flagship model), TPU-native.

Reference: models/ADNMUNet.py. Architecture: 3-part U-Net —
Encoder (PatchEmbed -> WTLayer x2 -> Attention -> Mamba Block x3 with
maxpool downsampling; records 7 skips, ADNMUNet.py:337-483), Decoder
(Mamba Block x3 + Attention + WTLayer x3 with skip concats and a
Channel_Att_Bridge + EncoderToDecoder feature path, :486-636), Refiner
(4 Mamba blocks at full 256x256 + OutProj last-frame residual head,
:639-717). Everything here is NHWC spatial; sequence mixers reshape to
(B, L, D) internally for free.

Quirks preserved (SURVEY section 5): Block reads beta3/beta4 from
beta1/beta2 (ADNMUNet.py:145-146); the decoder's features[3] is never
consumed and features[4..6] feed WTLayer's discarded-concat path
(:605-630, model_untils.py:408). TPU re-design: those dead
EncoderToDecoder computations are elided by default (compute_dead_features
restores the reference's wasted work + its unused params).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from adnm_tpu.core.blocks import (
    ChannelAttBridge,
    DownSample,
    EncoderToDecoder,
    OutProj,
    PatchEmbed,
    SimplePatchEmbed,
    UpSample,
    WTLayer,
)
from adnm_tpu.core.layers import (
    BiasFreeLayerNorm,
    ConvLayer,
    FeedForward,
    Mlp,
    RMSNorm,
    gate_cast,
    scalar_param,
)
from adnm_tpu.mixers.attention import StandardAttention
from adnm_tpu.mixers.ssd_mixer import ADNSSDMixer


def schedule_headdim(d_model: int) -> int:
    """Reference: models/ADNMUNet.py:263-273 (create_block)."""
    if d_model <= 32:
        return 4
    if d_model <= 256:
        return 8
    if d_model <= 512:
        return 16
    if d_model <= 768:
        return 24
    return 32


class Block(nn.Module):
    """Mamba residual block (reference: models/ADNMUNet.py:51-165).

    num_layers of: scale/shift-modulated RMSNorm -> mixer -> beta-weighted
    residual -> norm -> FeedForward -> beta residual; optional learnable
    skip-concat + features injection; gamma scale; optional out Linear.
    Operates on (B, H, W, D).
    """

    dim: int
    out_dim: int
    headdim: int
    num_layers: int = 1
    norm_epsilon: float = 1e-5
    d_state: int = 16
    linear_attn_duality: bool = True
    mixer_type: str = "adnssd"  # "adnssd" | "vssd" (reference import switch, ADNMUNet.py:23-24)
    # "nhwc": x is (B, H, W, D) (the default everywhere). "cl": x is
    # channel-major (B, D, H, W) end to end — norms over axis 1, the
    # mixer's channel-major path without boundary transposes, and the
    # FFN's convs as channel einsums / fused shift-taps. Used by the
    # Refiner at 65k tokens where every token-minor d=32 intermediate
    # lane-pads 4x (bandwidth-bound step; see mixers/ssd_mixer.py).
    # The parameter tree is IDENTICAL between layouts.
    layout: str = "nhwc"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        residual: Optional[jax.Array] = None,
        features: Optional[jax.Array] = None,
    ) -> jax.Array:
        cl = self.layout == "cl"
        cax = 1 if cl else -1
        alpha1 = scalar_param(self, "alpha1", 1.0)
        alpha2 = scalar_param(self, "alpha2", 1.0)
        alpha3 = scalar_param(self, "alpha3", 1.0)
        alpha4 = scalar_param(self, "alpha4", 1.0)
        beta1 = self.param("beta1", nn.initializers.ones, (self.num_layers,), jnp.float32)
        beta2 = self.param("beta2", nn.initializers.ones, (self.num_layers,), jnp.float32)
        # beta3/beta4 exist but the reference reads beta1/beta2 in their
        # place (ADNMUNet.py:145-146) — parameters kept for parity.
        self.param("beta3", nn.initializers.ones, (self.num_layers,), jnp.float32)
        self.param("beta4", nn.initializers.ones, (self.num_layers,), jnp.float32)

        alpha1, alpha2, alpha3, alpha4, beta1, beta2 = gate_cast(
            x, alpha1, alpha2, alpha3, alpha4, beta1, beta2)
        if residual is not None:
            x = jnp.concatenate(
                [alpha1 * x, alpha2 * residual.astype(x.dtype)], axis=cax)
            if features is not None:
                f = features.astype(x.dtype)
                x = x + jnp.concatenate([alpha3 * f, alpha4 * f], axis=cax)
        elif features is not None:
            x = x + alpha3 * features.astype(x.dtype)

        d = x.shape[cax]
        if cl:
            assert self.mixer_type == "adnssd" and self.linear_attn_duality, (
                "layout='cl' supports the duality ADNSSD mixer only"
            )
        for i in range(self.num_layers):
            scale1, shift1, scale2, shift2 = gate_cast(
                x,
                scalar_param(self, f"scale1_{i}", 1.0),
                scalar_param(self, f"shift1_{i}", 0.0),
                scalar_param(self, f"scale2_{i}", 1.0),
                scalar_param(self, f"shift2_{i}", 0.0),
            )
            x_norm = scale1 * RMSNorm(d, self.norm_epsilon, axis=cax, name=f"norm1_{i}")(x) + shift1
            mixer_cls = ADNSSDMixer
            if self.mixer_type == "vssd":
                from adnm_tpu.mixers.vssd import VSSDMixer

                mixer_cls = VSSDMixer
            mixer = mixer_cls(
                d_model=d,
                headdim=self.headdim,
                d_state=self.d_state,
                linear_attn_duality=self.linear_attn_duality,
                dtype=self.dtype,
                name=f"mixer_{i}",
            )
            x = beta1[i] * x + beta2[i] * (mixer(x_norm, cl=True) if cl else mixer(x_norm))
            x_norm = scale2 * RMSNorm(d, self.norm_epsilon, axis=cax, name=f"norm2_{i}")(x) + shift2
            ffn = FeedForward(dim=d, expansion=2, dtype=self.dtype,
                              layout=self.layout, name=f"ffn_{i}")
            x = beta1[i] * x + beta2[i] * ffn(x_norm)

        gamma = gate_cast(x, self.param("gamma", nn.initializers.ones, (d,), jnp.float32))
        x = x * (gamma[:, None, None] if cl else gamma)
        if self.dim != self.out_dim:
            if cl:
                # Dense over the channel axis with Dense's exact param
                # tree (out_proj/kernel (d, out), out_proj/bias) — the
                # _Kernel holder shares Dense's torch-default init.
                from adnm_tpu.mixers.ssd_mixer import _Kernel

                k, bias = _Kernel((d, self.out_dim), d, bias=True, name="out_proj")()
                dt = self.dtype or x.dtype
                x = jnp.einsum("io,bihw->bohw", k.astype(dt), x.astype(dt),
                               preferred_element_type=dt) + bias.astype(dt)[None, :, None, None]
            else:
                from adnm_tpu.core.layers import Dense

                x = Dense(self.out_dim, dtype=self.dtype, name="out_proj")(x)
        return x


class AttentionBlock(nn.Module):
    """Attention wrapper with the Block skeleton
    (reference: models/ADNMUNet.py:172-238).

    ``attn_type`` selects the token mixer: "standard" (softmax MHA, the
    reference's wired choice, ADNMUNet.py:181) or "mla" (DeepSeek-V2
    multi-head latent attention, mixers/attention.py::MLA — present in
    the reference at models/MLA.py:108-307 but never wired into the
    model; here it is selectable, configured by the reference's own
    generate_mla_config table)."""

    dim: int
    out_dim: Optional[int] = None
    headdim: int = 4
    attn_type: str = "standard"  # "standard" | "mla"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, residual=None, features=None):
        out_dim = self.out_dim or self.dim
        alpha1 = scalar_param(self, "alpha1", 1.0)
        alpha2 = scalar_param(self, "alpha2", 1.0)
        alpha3 = scalar_param(self, "alpha3", 1.0)
        alpha4 = scalar_param(self, "alpha4", 1.0)
        beta1 = scalar_param(self, "beta1", 1.0)
        beta2 = scalar_param(self, "beta2", 1.0)
        beta3 = scalar_param(self, "beta3", 1.0)
        beta4 = scalar_param(self, "beta4", 1.0)

        alpha1, alpha2, alpha3, alpha4, beta1, beta2, beta3, beta4 = gate_cast(
            x, alpha1, alpha2, alpha3, alpha4, beta1, beta2, beta3, beta4)
        if residual is not None:
            x = jnp.concatenate(
                [alpha1 * x, alpha2 * residual.astype(x.dtype)], axis=-1)
            if features is not None:
                f = features.astype(x.dtype)
                x = x + jnp.concatenate([alpha3 * f, alpha4 * f], axis=-1)
        elif features is not None:
            x = x + alpha3 * features.astype(x.dtype)

        b, h, w, d = x.shape
        xs = x.reshape(b, h * w, d)
        scale1, shift1, scale2, shift2 = gate_cast(
            xs,
            scalar_param(self, "attn_scale1", 1.0),
            scalar_param(self, "attn_shift1", 0.0),
            scalar_param(self, "attn_scale2", 1.0),
            scalar_param(self, "attn_shift2", 0.0),
        )
        x_norm = scale1 * BiasFreeLayerNorm(d, name="attn_norm1")(xs) + shift1
        if self.attn_type == "mla":
            from adnm_tpu.mixers.attention import MLA, generate_mla_config

            attn = MLA(**generate_mla_config(d, strict=False), name="attn_layer")
        elif self.attn_type == "standard":
            attn = StandardAttention(d, heads=d // self.headdim, dim_head=self.headdim, dtype=self.dtype, name="attn_layer")
        else:
            raise ValueError(f"attn_type must be standard|mla, got {self.attn_type!r}")
        xs = beta1 * xs + beta2 * attn(x_norm)
        x_norm = scale2 * BiasFreeLayerNorm(d, name="attn_norm2")(xs) + shift2
        xs = beta3 * xs + beta4 * Mlp(d, dtype=self.dtype, name="attn_mlp")(x_norm)
        gamma = gate_cast(xs, self.param("gamma", nn.initializers.ones, (d,), jnp.float32))
        xs = xs * gamma
        if d != out_dim:
            from adnm_tpu.core.layers import Dense

            xs = Dense(out_dim, dtype=self.dtype, name="out_proj")(xs)
        return xs.reshape(b, h, w, out_dim)


class Encoder(nn.Module):
    """Reference: models/ADNMUNet.py:337-483."""

    embed_dim: Sequence[int]  # 6 entries
    depth: Sequence[int]
    headdim: int
    in_channels: int
    kernel: Sequence[int]
    ratio: Sequence[int]
    wt_levels: Sequence[int]
    norm_epsilon: float = 1e-5
    instance_norm: bool = True
    simple_patch: bool = False
    linear_attn_duality: bool = True
    mixer_type: str = "adnssd"
    attn_type: str = "standard"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array):
        from adnm_tpu.parallel.mesh import maybe_shard

        ed = self.embed_dim
        skips = []
        if self.simple_patch:
            x, res = SimplePatchEmbed(self.in_channels, ed[0], self.kernel[0], self.instance_norm, name="encoder1")(x)
        else:
            x, res = PatchEmbed(
                self.in_channels, ed[0], self.kernel[0], self.wt_levels[0],
                instance_norm=self.instance_norm, name="encoder1",
            )(x)
        # Spatial sharding of the conv pyramid: under a mesh with a 'seq'
        # axis the H dimension is split across devices at every stage whose
        # H is still divisible (maybe_shard drops it otherwise); XLA
        # inserts halo exchanges for the spatial convs. Activation memory
        # — the dominant footprint of a conv U-Net at 256^2 — scales with
        # the 'seq' degree, not just batch.
        x = maybe_shard(x, "data", "seq")
        skips.append(x)
        x = DownSample(self.ratio[0], name="down_sample1")(x)

        x = WTLayer(ed[0], ed[1], self.kernel[1], self.wt_levels[1], instance_norm=self.instance_norm, name="encoder2")(x)
        x = maybe_shard(x, "data", "seq")
        skips.append(x)
        x = DownSample(self.ratio[1], name="down_sample2")(x)

        x = WTLayer(ed[1], ed[2], self.kernel[2], self.wt_levels[2], instance_norm=self.instance_norm, name="encoder3")(x)
        x = maybe_shard(x, "data", "seq")
        skips.append(x)
        x = DownSample(self.ratio[2], name="down_sample3")(x)

        x = AttentionBlock(ed[2], headdim=self.headdim, attn_type=self.attn_type, dtype=self.dtype, name="attn")(x)
        skips.append(x)

        blk = functools.partial(
            Block, headdim=self.headdim, norm_epsilon=self.norm_epsilon,
            linear_attn_duality=self.linear_attn_duality, mixer_type=self.mixer_type,
            dtype=self.dtype,
        )
        x = blk(dim=ed[2], out_dim=ed[3], num_layers=self.depth[0], name="encoder4")(x)
        skips.append(x)
        x = DownSample(self.ratio[3], name="down_sample4")(x)

        x = blk(dim=ed[3], out_dim=ed[4], num_layers=self.depth[1], name="encoder5")(x)
        skips.append(x)
        x = DownSample(self.ratio[4], name="down_sample5")(x)

        x = blk(dim=ed[4], out_dim=ed[5], num_layers=self.depth[2], name="encoder6")(x)
        skips.append(x)

        x = AttentionBlock(ed[5], headdim=self.headdim, attn_type=self.attn_type, dtype=self.dtype, name="attn2")(x)
        return x, skips, res


class Decoder(nn.Module):
    """Reference: models/ADNMUNet.py:486-636."""

    embed_dim: Sequence[int]  # 6 entries
    depth: Sequence[int]
    headdim: int
    refine_dim: Sequence[int]
    kernel: Sequence[int]
    ratio: Sequence[int]
    wt_levels: Sequence[int]
    norm_epsilon: float = 1e-5
    instance_norm: bool = True
    compute_dead_features: bool = False
    linear_attn_duality: bool = True
    mixer_type: str = "adnssd"
    attn_type: str = "standard"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, skips: Sequence[jax.Array]) -> jax.Array:
        ed = list(self.embed_dim)
        # c_list with the duplicated level-2 entry (ADNMUNet.py:590)
        c_list = ed[:2] + [ed[2], ed[2]] + ed[3:]
        fusion = ChannelAttBridge(c_list, name="fusion")(skips)
        blk = functools.partial(
            Block, headdim=self.headdim, norm_epsilon=self.norm_epsilon,
            linear_attn_duality=self.linear_attn_duality, mixer_type=self.mixer_type,
            dtype=self.dtype,
        )

        # e2ds[i] processes skip[6-i] with its fused attention map
        # (ADNMUNet.py:593-606). Only features 0,1,2 are consumed
        # downstream; 3..6 are the reference's dead compute.
        n_used = 7 if self.compute_dead_features else 3
        features = {}
        for i in range(n_used):
            features[i] = EncoderToDecoder(
                c_list[6 - i], self.instance_norm, name=f"e2d_{i}"
            )(skips[6 - i], fusion[6 - i])

        x = blk(dim=ed[5], out_dim=ed[4], num_layers=self.depth[2], name="decoder1")(x, features=features[0])
        x = UpSample(ed[4], ratio=self.ratio[4], name="up_sample1")(x)

        x = blk(dim=ed[4] * 2, out_dim=ed[3], num_layers=self.depth[1], name="decoder2")(
            x, residual=skips[5], features=features[1]
        )
        x = UpSample(ed[3], ratio=self.ratio[3], name="up_sample2")(x)

        x = blk(dim=ed[3] * 2, out_dim=ed[2], num_layers=self.depth[0], name="decoder3")(
            x, residual=skips[4], features=features[2]
        )
        x = AttentionBlock(ed[2], ed[2], headdim=self.headdim, attn_type=self.attn_type, dtype=self.dtype, name="attn")(x)
        x = UpSample(ed[2], ratio=self.ratio[2], name="up_sample3")(x)

        from adnm_tpu.parallel.mesh import maybe_shard

        x = WTLayer(
            ed[2] * 2, ed[1], self.kernel[2], self.wt_levels[2], if_res=True,
            instance_norm=self.instance_norm, name="decoder4",
        )(x, residual=skips[2], features=features.get(4))
        x = maybe_shard(x, "data", "seq")
        x = UpSample(ed[1], ratio=self.ratio[1], name="up_sample4")(x)

        x = WTLayer(
            ed[1] * 2, ed[0], self.kernel[1], self.wt_levels[1], if_res=True,
            instance_norm=self.instance_norm, name="decoder5",
        )(x, residual=skips[1], features=features.get(5))
        x = maybe_shard(x, "data", "seq")
        x = UpSample(ed[0], ratio=self.ratio[0], name="up_sample5")(x)

        x = WTLayer(
            ed[0] * 2, ed[0], self.kernel[0], self.wt_levels[0], if_res=True,
            instance_norm=self.instance_norm, name="decoder6",
        )(x, residual=skips[0], features=features.get(6))
        x = maybe_shard(x, "data", "seq")

        x = ConvLayer(self.refine_dim[0], 1, 1, 0, dtype=self.dtype, name="decoder6_s")(x)
        return x


class Refiner(nn.Module):
    """Reference: models/ADNMUNet.py:639-717. Four Mamba blocks at full
    resolution (L = 65,536 tokens for 256x256) + OutProj head."""

    refine_dim: Sequence[int]  # 4 entries
    refine_depth: Sequence[int]
    refine_headdim: Sequence[int]
    out_channels: int
    wt_levels: Sequence[int]
    out_expand: int = 2
    norm_epsilon: float = 1e-5
    instance_norm: bool = True
    remat: bool = True
    linear_attn_duality: bool = True
    mixer_type: str = "adnssd"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, res: jax.Array) -> jax.Array:
        from adnm_tpu.parallel.mesh import maybe_shard

        # The decoder output and the last-frame residual arrive H-sharded
        # over 'seq' (the conv pyramid carries the same spatial sharding);
        # keep that layout — the token-form reshape below preserves it, so
        # the refiner's 65k-token mixers run on L-local shards.
        x = maybe_shard(x, "data", "seq")
        res = maybe_shard(res, "data", "seq")
        rd = self.refine_dim
        # Channel-major refiner (one transpose in, one out): at 65k tokens
        # with d=32 every token-minor intermediate lane-pads 4x, so the
        # four Blocks run end to end in (B, C, H, W) — norms/FFN/mixer all
        # channel-major, zero per-block transposes. Same parameter tree.
        cl = (
            self.linear_attn_duality
            and self.mixer_type == "adnssd"
            and x.shape[1] * x.shape[2] >= 16384  # ADNSSDMixer.seq_minor_min_l
        )
        if cl:
            x = jnp.moveaxis(x, -1, 1)
        BlockM = nn.remat(Block) if self.remat else Block
        for i in range(4):
            # Sequence sharding of the full-resolution token grid: under a
            # ('data', 'seq') mesh (jax.sharding.set_mesh) the H axis — and
            # with it L = H*W — is split over 'seq'; XLA turns the duality
            # K^T V contraction into a psum over 'seq'. No-op otherwise.
            if cl:
                x = maybe_shard(x, "data", None, "seq", None)
            else:
                x = maybe_shard(x, "data", "seq", None, None)
            x = BlockM(
                dim=rd[i],
                out_dim=rd[i + 1] if i < 3 else rd[-1],
                headdim=self.refine_headdim[i],
                num_layers=self.refine_depth[i],
                norm_epsilon=self.norm_epsilon,
                linear_attn_duality=self.linear_attn_duality,
                mixer_type=self.mixer_type,
                layout="cl" if cl else "nhwc",
                dtype=self.dtype,
                name=f"refiner{i + 1}",
            )(x)
        if cl:
            x = jnp.moveaxis(x, 1, -1)
        return OutProj(
            self.out_channels, rd[-1], self.out_expand, self.instance_norm, name="out_proj"
        )(x, res)


class ADNMUNet(nn.Module):
    """VisionMamba top level (reference: models/ADNMUNet.py:720-829).

    Contract: (B, T_in, 1, H, W) -> (B, T_out, 1, H, W).
    """

    embed_dim: Sequence[int] = (32, 64, 128, 256, 512, 1024)
    depth: Sequence[int] = (1, 1, 1)
    refine_depth: Sequence[int] = (1, 1, 1, 1)
    refine_dim: Sequence[int] = (32, 32, 32, 32)
    refine_headdim: Sequence[int] = (4, 4, 4, 4)
    headdim: int = 4
    channels: int = 5
    out_channels: int = 20
    kernel: Sequence[int] = (5, 5, 5)
    ratio: Sequence[int] = (2, 2, 2, 2, 2, 2)
    wt_levels: Sequence[int] = (3, 2, 1)
    out_expand: int = 2
    norm_epsilon: float = 1e-6
    instance_norm: bool = True
    simple_patch: bool = False
    compute_dead_features: bool = False
    linear_attn_duality: bool = True
    mixer_type: str = "adnssd"
    # Attention mixer for the AttentionBlock sites: "standard" (the
    # reference's wired choice) or "mla" (DeepSeek-V2 latent attention
    # — present-but-unwired in the reference, selectable here).
    attn_type: str = "standard"
    # Rematerialize the refiner blocks' forward in the backward pass.
    # Default True (fits the most HBM configurations); with the seq-minor
    # duality layout, batch <= 8 at 256^2 on 16G v5e also fits with False
    # for a faster backward (no recompute) — measured A/B in README.
    refiner_remat: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        b, t, _, h, w = x.shape
        x = x[:, :, 0].transpose(0, 2, 3, 1)  # (B, H, W, T_in)
        x, skips, res = Encoder(
            self.embed_dim, self.depth, self.headdim, self.channels,
            self.kernel, self.ratio, self.wt_levels, self.norm_epsilon,
            self.instance_norm, self.simple_patch,
            self.linear_attn_duality, self.mixer_type,
            attn_type=self.attn_type, dtype=self.dtype, name="encoder",
        )(x)
        x = Decoder(
            self.embed_dim, self.depth, self.headdim, self.refine_dim,
            self.kernel, self.ratio, self.wt_levels, self.norm_epsilon,
            self.instance_norm, self.compute_dead_features,
            self.linear_attn_duality, self.mixer_type,
            attn_type=self.attn_type, dtype=self.dtype, name="decoder",
        )(x, skips)
        out = Refiner(
            self.refine_dim, self.refine_depth, self.refine_headdim,
            self.out_channels, self.wt_levels, self.out_expand,
            self.norm_epsilon, self.instance_norm, remat=self.refiner_remat,
            linear_attn_duality=self.linear_attn_duality,
            mixer_type=self.mixer_type, dtype=self.dtype, name="refiner",
        )(x, res)
        return out.transpose(0, 3, 1, 2)[:, :, None]  # (B, T_out, 1, H, W)


def create_adnm_unet(
    input_frames: int, output_frames: int, frame_interval: int, img_size: int = 256, **kwargs
) -> ADNMUNet:
    """Reference: models/ADNMUNet.py:906-940 (create_ADNMUNet)."""
    if output_frames > 5:
        refine_dim = (32, 32, 32, 32)
    else:
        refine_dim = (32, 32, 16, 16)
    if frame_interval < 120 / input_frames:
        instance_norm = True
        kernel = (5, 5, 5)
    else:
        instance_norm = False
        kernel = (5, 3, 3)
    return ADNMUNet(
        embed_dim=(32, 64, 128, 256, 512, 1024),
        depth=(1, 1, 1),
        refine_depth=(1, 1, 1, 1),
        refine_headdim=(4, 4, 4, 4),
        refine_dim=refine_dim,
        headdim=4,
        channels=input_frames,
        out_channels=output_frames,
        kernel=kernel,
        ratio=(2, 2, 2, 2, 2, 2),
        wt_levels=(3, 2, 1),
        out_expand=2,
        norm_epsilon=1e-6,
        instance_norm=instance_norm,
        **kwargs,
    )


def apply_reference_init(params: Any, key: jax.Array, n_layer: int = 3) -> Any:
    """Reference init scheme (models/ADNMUNet.py:294-323,794-804):
    trunc_normal(0.02) on Linear weights + zero bias (segm_init_weights),
    then out_proj/fc2 weights get kaiming_uniform(a=sqrt(5)) / sqrt(n_layer)
    (mamba rescale, _init_weights). Applied as a pure tree transform over
    an initialized param tree; Dense kernels are ndim-2 leaves."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    keys = jax.random.split(key, len(flat))

    def modpath(path):
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        return tuple(names[:-1]), (names[-1] if names else ""), (names[-2] if len(names) > 1 else "")

    # modules whose kernel is 2-D are Linear layers (reference zeroes
    # their biases; conv biases keep torch default init)
    linear_modules = {
        modpath(path)[0]
        for path, leaf in flat
        if modpath(path)[1] == "kernel" and leaf.ndim == 2
    }
    new_leaves = []
    for (path, leaf), k in zip(flat, keys):
        parents, leafname, parent = modpath(path)
        if leafname == "kernel" and leaf.ndim == 2:
            fan_in = leaf.shape[0]
            if parent in ("out_proj", "fc2"):
                bound = math.sqrt(3.0) * math.sqrt(2.0 / 6.0) / math.sqrt(fan_in)
                leaf = jax.random.uniform(k, leaf.shape, leaf.dtype, -bound, bound)
                leaf = leaf / math.sqrt(n_layer)
            else:
                leaf = 0.02 * jax.random.truncated_normal(k, -2.0, 2.0, leaf.shape, leaf.dtype)
        elif leafname == "bias" and parents in linear_modules:
            leaf = jnp.zeros_like(leaf)
        new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
