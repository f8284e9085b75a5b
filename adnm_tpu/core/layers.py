"""Primitive NN layers (NHWC, channels-last).

TPU-native re-implementations of the reference's primitive blocks
(reference: models/model_untils.py). All spatial tensors are NHWC so the
(B, L, D) sequence form used by the mixers is a free reshape of
(B, H, W, D) — the reference's permute(0,3,1,2) round-trips disappear.

Parameter-shape conventions follow flax (conv kernels HWIO); scalar
gates (alpha/beta/gamma/scale/shift) are 0-d fp32 params as in the
reference.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def scalar_param(mdl: nn.Module, name: str, value: float) -> jax.Array:
    """A learnable 0-d fp32 scalar (reference: nn.Parameter(torch.tensor(v)))."""
    return mdl.param(name, lambda _: jnp.asarray(value, jnp.float32))


def gate_cast(x: jax.Array, *ps: jax.Array):
    """Cast learnable fp32 gate params (alpha/beta/gamma/scale/shift) to
    the activation's dtype for their multiply/add sites.

    Without this, ``f32_scalar * bf16_activation`` silently promotes the
    ACTIVATION to f32 (JAX type promotion), and everything downstream of
    every gate runs at 2x HBM bandwidth — the train-step profile showed
    f32[4,128,256,256] FFN passes in a bf16-compute step. Params stay
    fp32 (optimizer/checkpoints unchanged); under f32 compute this is a
    no-op, so parity oracles are unaffected."""
    dt = x.dtype
    out = tuple(p.astype(dt) for p in ps)
    return out if len(out) > 1 else out[0]


def _norm_stats_cast(x: jax.Array) -> jax.Array:
    # Normalization statistics in fp32 even under bf16 compute.
    return x.astype(jnp.float32)


class BiasFreeLayerNorm(nn.Module):
    """LayerNorm with weight but no bias, biased variance, eps=1e-5.

    Reference: models/model_untils.py:29-48 (BiasFree_LayerNorm).
    """

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        xf = _norm_stats_cast(x)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        out = (xf - mu) * jax.lax.rsqrt(var + self.eps) * w
        return out.astype(x.dtype)


class RMSNorm(nn.Module):
    """RMS norm over the channel axis (reference: mamba_ssm Triton
    RMSNorm, imported at models/ADNMUNet.py:28; used as Block norm_layer).

    ``axis`` selects where the channel dim lives (default -1, the NHWC /
    token-minor layout; the channel-major refiner path normalizes axis 1
    of (B, C, H, W) tensors — same parameters, same math)."""

    dim: int
    eps: float = 1e-6
    axis: int = -1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        xf = _norm_stats_cast(x)
        ms = jnp.mean(jnp.square(xf), axis=self.axis, keepdims=True)
        if self.axis != -1 and self.axis != x.ndim - 1:
            shape = [1] * x.ndim
            shape[self.axis] = self.dim
            w = w.reshape(shape)
        out = xf * jax.lax.rsqrt(ms + self.eps) * w
        return out.astype(x.dtype)


class GatedRMSNorm(nn.Module):
    """RMSNorm(x) * silu(z) — the mamba_ssm RMSNormGated
    (reference: models/ADNssd.py:8). Kept for the fused-gate scan path."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array, z: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        xf = _norm_stats_cast(x) * jax.nn.silu(_norm_stats_cast(z))
        ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(ms + self.eps) * w).astype(x.dtype)


class InstanceNorm(nn.Module):
    """Per-(sample, channel) normalization over H, W; no affine, eps=1e-5.

    Matches torch nn.InstanceNorm2d defaults (affine=False) used across
    the reference (e.g. models/model_untils.py:284). Input NHWC.
    """

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        xf = _norm_stats_cast(x)
        mu = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)


class GroupNorm(nn.Module):
    """GroupNorm with affine, eps=1e-5 (torch nn.GroupNorm defaults;
    reference: models/model_untils.py:284,371 et al.). Input NHWC."""

    groups: int
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        g = self.groups
        weight = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = _norm_stats_cast(x).reshape(b, h, w, g, c // g)
        mu = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
        var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
        xf = (xf - mu) * jax.lax.rsqrt(var + self.eps)
        return (xf.reshape(b, h, w, c) * weight + bias).astype(x.dtype)


class BatchNorm(nn.Module):
    """BatchNorm over (B, H, W) with running stats, eps=1e-5, momentum 0.1
    (torch defaults; used by the SmaAt/TransUnet baselines, reference:
    models/SmaAt_UNet.py:73). Cross-replica stats: wrap the train step in
    shard_map and set ``axis_name`` to psum batch statistics — the TPU
    equivalent of SyncBatchNorm (reference: train.py:100)."""

    dim: int
    eps: float = 1e-5
    momentum: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        weight = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(self.dim, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(self.dim, jnp.float32))
        if train:
            xf = _norm_stats_cast(x)
            reduce_axes = tuple(range(x.ndim - 1))
            mu = jnp.mean(xf, axis=reduce_axes)
            mu2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
            if self.axis_name is not None:
                mu = jax.lax.pmean(mu, self.axis_name)
                mu2 = jax.lax.pmean(mu2, self.axis_name)
            var = mu2 - jnp.square(mu)
            n = math.prod([x.shape[a] for a in reduce_axes])
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mu
                unbiased = var * n / max(n - 1, 1)
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mu, var = ra_mean.value, ra_var.value
        out = (x.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + self.eps)
        return (out * weight + bias).astype(x.dtype)


class Swish(nn.Module):
    """x * sigmoid(beta * x) with learnable beta
    (reference: models/model_untils.py:162-169)."""

    beta_init: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        beta = gate_cast(x, scalar_param(self, "beta", self.beta_init))
        return x * jax.nn.sigmoid(beta * x)


class IntensityGate(nn.Module):
    """silu(enhance * (x - threshold)) with learnable threshold/enhance
    (reference: models/model_untils.py:523-532)."""

    threshold_init: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        threshold, enhance = gate_cast(
            x,
            scalar_param(self, "threshold", self.threshold_init),
            scalar_param(self, "enhance", 1.0),
        )
        return jax.nn.silu(enhance * (x - threshold))


def _to_pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def _resolve_pads(x_shape, kernel_shape, strides, pad):
    """(pads, oh, ow) for NHWC x / HWIO kernel with torch-style padding."""
    kh, kw = kernel_shape[0], kernel_shape[1]
    _, h, w, _ = x_shape
    sh, sw = strides
    if pad == "SAME":
        oh, ow = -(-h // sh), -(-w // sw)
        ph_t = max((oh - 1) * sh + kh - h, 0)
        pw_t = max((ow - 1) * sw + kw - w, 0)
        pads = ((ph_t // 2, ph_t - ph_t // 2), (pw_t // 2, pw_t - pw_t // 2))
    else:
        pads = tuple((int(lo), int(hi)) for lo, hi in pad)
        oh = (h + pads[0][0] + pads[0][1] - kh) // sh + 1
        ow = (w + pads[1][0] + pads[1][1] - kw) // sw + 1
    return pads, oh, ow


def _grouped_conv_tapsum(x, kernel, strides, pad, groups):
    """Grouped NHWC conv as an explicit ``kh*kw`` shift-and-MAC.

    ``y[..., g*O+o] = sum_{dy,dx,i} kernel[dy,dx,i,g*O+o] * xpad[shifted][..., g*I+i]``
    — one strided slice + a tiny per-group einsum per tap, accumulated in
    fp32. For pure depthwise (I=O=1) the einsum is an elementwise
    multiply and XLA fuses all taps into one loop. Exists because lax's
    ``feature_group_count`` path has mesh-dependent WRONG weight grads
    under this XLA version (see Conv2d below); this lowering's backward
    is a plain dot-general and is gradient-exact under every mesh
    (verified in tests/test_parallel.py::TestXlaGroupedConvGradDefect).
    Used as the reference oracle for ``grouped_conv`` below.
    """
    kh, kw, i_per_g, features = kernel.shape
    b, h, w, cin = x.shape
    o_per_g = features // groups
    sh, sw = strides
    pads, oh, ow = _resolve_pads(x.shape, kernel.shape, strides, pad)
    xp = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))
    y = None
    for dy in range(kh):
        for dx in range(kw):
            xs = jax.lax.slice(
                xp,
                (0, dy, dx, 0),
                (b, dy + (oh - 1) * sh + 1, dx + (ow - 1) * sw + 1, cin),
                (1, sh, sw, 1),
            ).reshape(b, oh, ow, groups, i_per_g)
            wt = kernel[dy, dx].reshape(i_per_g, groups, o_per_g)
            t = jnp.einsum(
                "bhwgi,igo->bhwgo", xs, wt, preferred_element_type=jnp.float32
            )
            y = t if y is None else y + t
    return y.reshape(b, oh, ow, features)


def _grouped_conv_native(x, kernel, strides, pads, groups):
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=strides,
        padding=pads,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def mesh_needs_exact_weight_grad() -> bool:
    """True when the ACTIVE mesh can trigger XLA v0.9.0's grouped-conv
    weight-grad scaling defect (CLAUDE.md defect #3): the partitioner
    multiplies ``feature_group_count`` convs' weight grads by the
    product of the mesh axes the operands are replicated over, on any
    mesh with >= 2 non-trivial axes (measured 2x on ('data','seq')=(4,2)
    and ('data','model')=(4,2), 4x on (2,4)). No-mesh and single-axis
    meshes are exact (ratio 1.0, verified on the ('data',)=(8,) mesh and
    pinned in tests/test_parallel.py::TestXlaGroupedConvGradDefect), so
    single-chip/pure-DP training takes XLA's native fused weight-grad
    conv instead of the ~kh*kw-pass tap-einsum workaround — the r4 step
    breakdown showed the tap dW loop dominating the backward at the
    flagship's ~524 grouped-conv sites."""
    am = jax.sharding.get_abstract_mesh()
    if am is None or am.empty:
        return False
    return sum(1 for a in am.axis_names if am.shape[a] > 1) >= 2


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def grouped_conv(x, kernel, strides, pads, groups):
    """Grouped/depthwise NHWC conv: native XLA forward, mesh-exact backward.

    Forward and INPUT gradient use lax's ``feature_group_count`` path —
    the fast fused TPU kernels (one sweep over HBM with windowed VMEM
    reuse). The WEIGHT gradient is the one thing XLA v0.9.0's SPMD
    partitioner gets wrong for grouped convs (scaled by the product of
    the mesh axes the operands are replicated over, on any multi-axis
    mesh — see Conv2d below), so it alone is computed as an explicit
    per-tap einsum reduction, which lowers to plain dot-generals and is
    gradient-exact under every mesh
    (tests/test_parallel.py::TestXlaGroupedConvGradDefect).

    vs the previous all-tap-sum lowering (``_grouped_conv_tapsum``, kept
    as the tests' oracle): the forward no longer materializes kh*kw
    fp32 shifted copies of the input — measured as a large share of the
    r1-r3 step time (the flagship has ~50 depthwise conv sites at
    256x256, many with 5x5 kernels = 25 taps).

    ``strides``/``pads``/``groups`` must be hashable (tuples), ``pads``
    either "SAME" or ((ph_lo, ph_hi), (pw_lo, pw_hi)).
    """
    pads_t, _, _ = _resolve_pads(x.shape, kernel.shape, strides, pads)
    return _grouped_conv_native(x, kernel, strides, pads_t, groups)


def _grouped_conv_fwd(x, kernel, strides, pads, groups):
    pads_t, _, _ = _resolve_pads(x.shape, kernel.shape, strides, pads)
    y = _grouped_conv_native(x, kernel, strides, pads_t, groups)
    return y, (x, kernel)


def _grouped_conv_bwd(strides, pads, groups, resids, ct):
    x, kernel = resids
    kh, kw, i_per_g, features = kernel.shape
    b, _, _, cin = x.shape
    o_per_g = features // groups
    sh, sw = strides
    pads_t, oh, ow = _resolve_pads(x.shape, kernel.shape, strides, pads)

    # dx: activation cotangent of the native conv — NOT affected by the
    # partitioner's weight-grad defect; reuse XLA's own transposed-conv
    # rule by differentiating the native op wrt x only.
    _, vjp_x = jax.vjp(
        lambda xx: _grouped_conv_native(xx, kernel, strides, pads_t, groups), x
    )
    (dx,) = vjp_x(ct)

    # dW: explicit per-tap contraction (plain dot-generals; mesh-exact).
    xp = jnp.pad(x, ((0, 0), pads_t[0], pads_t[1], (0, 0)))
    ctg = ct.reshape(b, oh, ow, groups, o_per_g)
    taps = []
    for dy in range(kh):
        for dx_ in range(kw):
            xs = jax.lax.slice(
                xp,
                (0, dy, dx_, 0),
                (b, dy + (oh - 1) * sh + 1, dx_ + (ow - 1) * sw + 1, cin),
                (1, sh, sw, 1),
            ).reshape(b, oh, ow, groups, i_per_g)
            taps.append(jnp.einsum(
                "bhwgi,bhwgo->igo", xs, ctg,
                preferred_element_type=jnp.float32,
            ))
    dW = jnp.stack(taps).reshape(kh, kw, i_per_g, groups * o_per_g)
    return dx, dW.astype(kernel.dtype)


grouped_conv.defvjp(_grouped_conv_fwd, _grouped_conv_bwd)


def dw_taps_cl(x, kernel, bias=None):
    """Depthwise conv in channel-major layout: x (B, C, H, W), kernel
    (kh, kw, 1, C) HWIO, SAME padding. Lowered as kh*kw shifted
    multiply-adds — all slices of one padded tensor, fused by XLA into
    a single pass; plain elementwise ops, so gradients are mesh-exact
    under every SPMD mesh (no feature_group_count involved —
    CLAUDE.md defect #3 cannot apply)."""
    kh, kw, _, c = kernel.shape
    b, cc, h, w = x.shape
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
    y = None
    for dy in range(kh):
        for dx in range(kw):
            t = jax.lax.slice(xp, (0, 0, dy, dx), (b, cc, dy + h, dx + w))
            t = t * kernel[dy, dx, 0][None, :, None, None]
            y = t if y is None else y + t
    if bias is not None:
        y = y + bias[None, :, None, None]
    return y


class Conv2d(nn.Module):
    """2-D convolution on NHWC with torch-style symmetric padding and
    torch-default initializers (kaiming-uniform weight, fan-in-uniform
    bias) so scratch-trained dynamics match the reference's nn.Conv2d."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = (3, 3)
    stride: Union[int, Tuple[int, int]] = (1, 1)
    padding: Union[str, int, Tuple[int, int]] = 0
    groups: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = _to_pair(self.kernel_size)
        sh, sw = _to_pair(self.stride)
        cin = x.shape[-1]
        fan_in = (cin // self.groups) * kh * kw
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

        def kernel_init(key, shape, dtype=jnp.float32):
            a = math.sqrt(5.0)
            gain = math.sqrt(2.0 / (1 + a * a))
            k_bound = math.sqrt(3.0) * gain / math.sqrt(fan_in)
            return jax.random.uniform(key, shape, dtype, -k_bound, k_bound)

        kernel = self.param("kernel", kernel_init, (kh, kw, cin // self.groups, self.features), jnp.float32)
        if self.padding == "same" or self.padding == "SAME":
            pad = "SAME"
        else:
            ph, pw = _to_pair(self.padding)
            pad = [(ph, ph), (pw, pw)]
        dtype = self.dtype or x.dtype
        if self.groups > 1 and mesh_needs_exact_weight_grad():
            # Multi-axis mesh: XLA v0.9.0's SPMD partitioner scales
            # grouped convs' weight gradients by the product of the mesh
            # axes the operands are replicated over (silently — loss and
            # activations stay correct), so the weight grad alone
            # bypasses it via plain dot-generals (gradient-exact under
            # every mesh); the forward and input grad keep the fast
            # fused feature_group_count kernels. Defect matrix +
            # fixed-upstream tripwire:
            # tests/test_parallel.py::TestXlaGroupedConvGradDefect.
            pad_t = pad if pad == "SAME" else tuple(pad)
            y = grouped_conv(
                x.astype(dtype), kernel.astype(dtype), (sh, sw), pad_t, self.groups
            ).astype(dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(dtype),
                kernel.astype(dtype),
                window_strides=(sh, sw),
                padding=pad,
                feature_group_count=self.groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda key, shape, dt=jnp.float32: jax.random.uniform(key, shape, dt, -bound, bound),
                (self.features,),
                jnp.float32,
            )
            y = y + bias.astype(dtype)
        return y


class ConvTranspose2d(nn.Module):
    """Torch-semantics transposed conv on NHWC: out = (in-1)*stride - 2*pad
    + kernel + output_padding. Implemented as an lhs-dilated conv with a
    spatially flipped kernel (exactly torch's gradient-of-conv)."""

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]]
    padding: Union[int, Tuple[int, int]] = 0
    output_padding: Union[int, Tuple[int, int]] = 0
    groups: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = _to_pair(self.kernel_size)
        sh, sw = _to_pair(self.stride)
        ph, pw = _to_pair(self.padding)
        oph, opw = _to_pair(self.output_padding)
        cin = x.shape[-1]
        # torch ConvTranspose2d weight is (cin, cout//groups, kh, kw);
        # fan_in for init uses cout//groups * kh * kw.
        fan_in = (self.features // self.groups) * kh * kw
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

        def kernel_init(key, shape, dtype=jnp.float32):
            a = math.sqrt(5.0)
            gain = math.sqrt(2.0 / (1 + a * a))
            k_bound = math.sqrt(3.0) * gain / math.sqrt(fan_in)
            return jax.random.uniform(key, shape, dtype, -k_bound, k_bound)

        # Stored as HWIO for the equivalent forward conv: I = cin//groups
        # input channels contribute to each of `features` outputs.
        kernel = self.param("kernel", kernel_init, (kh, kw, cin // self.groups, self.features), jnp.float32)
        dtype = self.dtype or x.dtype
        tpad = ((kh - 1 - ph, kh - 1 - ph + oph), (kw - 1 - pw, kw - 1 - pw + opw))
        if self.groups > 1:
            # Same XLA v0.9.0 SPMD weight-grad defect as Conv2d (defect
            # #3, CLAUDE.md): grouped convs never go through lax's
            # feature_group_count. Materialize the lhs dilation and reuse
            # the gradient-exact tap-sum lowering (no model currently
            # uses grouped transposed convs; this keeps the public
            # `groups` field safe under every mesh).
            b, h, w, _ = x.shape
            xd = x.astype(dtype)
            if sh > 1 or sw > 1:
                xd = (
                    jnp.zeros((b, (h - 1) * sh + 1, (w - 1) * sw + 1, cin), dtype)
                    .at[:, ::sh, ::sw]
                    .set(xd)
                )
            y = _grouped_conv_tapsum(
                xd, jnp.flip(kernel, axis=(0, 1)).astype(dtype), (1, 1), tpad, self.groups
            ).astype(dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(dtype),
                jnp.flip(kernel, axis=(0, 1)).astype(dtype),
                window_strides=(1, 1),
                padding=list(tpad),
                lhs_dilation=(sh, sw),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda key, shape, dt=jnp.float32: jax.random.uniform(key, shape, dt, -bound, bound),
                (self.features,),
                jnp.float32,
            )
            y = y + bias.astype(dtype)
        return y


_NORMS = {
    None: None,
    "instance": lambda dim: InstanceNorm(),
    "group4": lambda dim: GroupNorm(groups=4, dim=dim),
    "group8": lambda dim: GroupNorm(groups=8, dim=dim),
    "biasfree_ln": lambda dim: BiasFreeLayerNorm(dim=dim),
}

_ACTS = {
    None: None,
    "gelu": jax.nn.gelu,
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
}


class ConvLayer(nn.Module):
    """conv -> scale*norm(x)+shift -> act
    (reference: models/model_untils.py:73-93, Conv2dLayer)."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = (3, 3)
    stride: Union[int, Tuple[int, int]] = (1, 1)
    padding: Union[str, int, Tuple[int, int]] = (1, 1)
    groups: int = 1
    use_bias: bool = True
    norm: Optional[str] = None
    act: Optional[str] = None
    act_module: Optional[Callable[[], nn.Module]] = None  # for learnable acts (Swish)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = Conv2d(
            self.features, self.kernel_size, self.stride, self.padding,
            self.groups, self.use_bias, self.dtype, name="conv",
        )(x)
        if self.norm is not None:
            scale, shift = gate_cast(
                x, scalar_param(self, "scale", 1.0), scalar_param(self, "shift", 0.0))
            x = scale * _NORMS[self.norm](self.features)(x) + shift
        if self.act_module is not None:
            x = self.act_module()(x)
        elif self.act is not None:
            x = _ACTS[self.act](x)
        return x


class DeConvLayer(nn.Module):
    """Transposed-conv upsampling layer with the reference's padding math
    (reference: models/model_untils.py:120-158, DeConv2dLayer)."""

    features: int
    ratio: int = 4
    kernel_size: Tuple[int, int] = (3, 3)
    groups: int = 1
    use_bias: bool = True
    norm: Optional[str] = None
    act: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size[1]
        padding_w = max(0, (k - self.ratio + 1) // 2)
        output_padding_w = self.ratio - k + 2 * padding_w
        x = ConvTranspose2d(
            self.features, self.kernel_size, (self.ratio, self.ratio),
            (padding_w, padding_w), (output_padding_w, output_padding_w),
            self.groups, self.use_bias, self.dtype, name="trans_conv",
        )(x)
        if self.norm is not None:
            scale, shift = gate_cast(
                x, scalar_param(self, "scale", 1.0), scalar_param(self, "shift", 0.0))
            x = scale * _NORMS[self.norm](self.features)(x) + shift
        if self.act is not None:
            x = _ACTS[self.act](x)
        return x


class Dense(nn.Module):
    """Linear layer with torch-default init (kaiming-uniform weight,
    fan-in-uniform bias)."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        bound = 1.0 / math.sqrt(cin)

        def kernel_init(key, shape, dtype=jnp.float32):
            a = math.sqrt(5.0)
            gain = math.sqrt(2.0 / (1 + a * a))
            k_bound = math.sqrt(3.0) * gain / math.sqrt(cin)
            return jax.random.uniform(key, shape, dtype, -k_bound, k_bound)

        kernel = self.param("kernel", kernel_init, (cin, self.features), jnp.float32)
        dtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(dtype), kernel.astype(dtype), preferred_element_type=dtype)
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda key, shape, dt=jnp.float32: jax.random.uniform(key, shape, dt, -bound, bound),
                (self.features,),
                jnp.float32,
            )
            y = y + bias.astype(dtype)
        return y


class Mlp(nn.Module):
    """fc1 -> GELU -> fc2 (dropout slots unused, act2 dead in reference)
    (reference: models/model_untils.py:52-70)."""

    dim: int
    hidden: Optional[int] = None
    out: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = self.hidden or self.dim * 2
        out = self.out or self.dim
        x = Dense(hidden, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.gelu(x)
        x = Dense(out, dtype=self.dtype, name="fc2")(x)
        return x


class _RawConvKernel(nn.Module):
    """Creates exactly the kernel/bias params a Conv2d would (same
    names, shapes, torch-default inits) without running its NHWC math —
    for layout-specialized execution paths over one shared tree."""

    shape: Tuple[int, ...]  # (kh, kw, cin_per_group, features) HWIO
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kh, kw, ipg, features = self.shape
        fan_in = ipg * kh * kw
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

        def kernel_init(key, shape, dtype=jnp.float32):
            a = math.sqrt(5.0)
            gain = math.sqrt(2.0 / (1 + a * a))
            k_bound = math.sqrt(3.0) * gain / math.sqrt(fan_in)
            return jax.random.uniform(key, shape, dtype, -k_bound, k_bound)

        kernel = self.param("kernel", kernel_init, self.shape, jnp.float32)
        if not self.use_bias:
            return kernel, None
        bias = self.param(
            "bias",
            lambda key, shape, dt=jnp.float32: jax.random.uniform(key, shape, dt, -bound, bound),
            (features,),
            jnp.float32,
        )
        return kernel, bias


class _ConvParams(nn.Module):
    """Param-tree stand-in for ``ConvLayer(name=...)`` (norm-free): the
    nested ``conv`` module's kernel/bias, nothing executed."""

    shape: Tuple[int, ...]
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        return _RawConvKernel(self.shape, self.use_bias, name="conv")()


class FeedForward(nn.Module):
    """1x1 expand (2*hidden) -> dw 3x3 -> gelu(x1)*sigmoid(x2) gate -> 1x1
    (reference: models/model_untils.py:172-197). Input NHWC, or
    channel-major (B, C, H, W) with ``layout="cl"`` (same param tree;
    used by the refiner's 65k-token blocks where token-minor d=32
    tensors lane-pad 4x — see the hybrid-layout note in __call__)."""

    dim: int
    expansion: int = 2
    dtype: Optional[Dtype] = None
    # EncoderToDecoder sets False: that module must stay spatially
    # replicated (its padded poolings miscompute under a 'seq'-sharded H
    # — XLA SPMD partitioner defect, see blocks.py pool_pair)
    spatial_shard: bool = True
    layout: str = "nhwc"  # "nhwc" | "cl"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from adnm_tpu.parallel.mesh import maybe_shard

        seq = "seq" if self.spatial_shard else None
        hidden = int(self.dim * self.expansion)
        if self.layout == "cl":
            # Fully channel-major on (B, C, H, W): 1x1 convs as channel
            # einsums, the depthwise conv as fused shift-taps
            # (dw_taps_cl), L in the lane dim for every tensor. A hybrid
            # that ran the 128-channel middle token-minor (native fused
            # dw conv, layout swaps inside the 1x1 matmuls) was A/B'd on
            # the chip and LOST (18.0 vs 16.1 ms per refiner block
            # fwd+bwd) — the lane-exact middle did not pay for the
            # boundary layout churn. Same param tree as the NHWC path.
            b, c, h, w = x.shape
            dt = self.dtype or x.dtype
            kin, bin_ = _ConvParams((1, 1, c, hidden * 2), name="project_in")()
            y = jnp.einsum("io,bihw->bohw", kin[0, 0].astype(dt),
                           x.astype(dt), preferred_element_type=dt)
            if bin_ is not None:
                y = y + bin_.astype(dt)[None, :, None, None]
            y = maybe_shard(y, "data", "model", seq, None)
            kdw, bdw = _ConvParams((3, 3, 1, hidden * 2), name="dwconv")()
            y = dw_taps_cl(y, kdw.astype(dt),
                           bdw.astype(dt) if bdw is not None else None)
            x1, x2 = jnp.split(y, 2, axis=1)
            y = jax.nn.gelu(x1) * jax.nn.sigmoid(x2)
            kout, bout = _ConvParams((1, 1, hidden, self.dim), name="project_out")()
            out = jnp.einsum("io,bihw->bohw", kout[0, 0].astype(dt), y,
                             preferred_element_type=dt)
            if bout is not None:
                out = out + bout.astype(dt)[None, :, None, None]
            return out
        x = ConvLayer(hidden * 2, (1, 1), (1, 1), (0, 0), dtype=self.dtype,
                      name="project_in")(x)
        # Megatron-style TP on the MLP: the expanded hidden channels split
        # over a 'model' mesh axis (column-parallel expand, row-parallel
        # project_out — XLA inserts the single all-reduce); the depthwise
        # conv and the gate are per-channel, so they stay collective-free.
        # No-op without a 'model' axis (parallel.mesh.maybe_shard).
        x = maybe_shard(x, "data", seq, None, "model")
        x = ConvLayer(hidden * 2, (3, 3), (1, 1), (1, 1), groups=hidden * 2,
                      dtype=self.dtype, name="dwconv")(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x = jax.nn.gelu(x1) * jax.nn.sigmoid(x2)
        return ConvLayer(self.dim, (1, 1), (1, 1), (0, 0), dtype=self.dtype,
                         name="project_out")(x)


class ConvFFD(nn.Module):
    """linear expand -> dw 3x3 conv -> GELU -> linear project
    (reference: models/model_untils.py:199-222). Input NHWC."""

    dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = Dense(self.dim * 2, dtype=self.dtype, name="in_proj")(x)
        x = ConvLayer(self.dim * 2, 3, 1, 1, groups=self.dim * 2, dtype=self.dtype, name="dw_conv")(x)
        x = jax.nn.gelu(x)
        return Dense(self.dim, dtype=self.dtype, name="out_proj")(x)
