"""Pallas TPU kernels: fused (gated) RMS norm.

TPU-native equivalents of mamba_ssm's fused Triton ``RMSNormGated`` /
``rms_norm_fn`` (reference: models/ADNssd.py:8, ADNMUNet.py:28-32):
one pass over the row computes the rsqrt moment and applies weight (and
the silu(z) gate) without materializing intermediates in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _rms_kernel(x_ref, w_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    o_ref[...] = (x * jax.lax.rsqrt(ms + eps) * w_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _gated_rms_kernel(x_ref, z_ref, w_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    z = z_ref[...].astype(jnp.float32)
    g = x * (z * jax.nn.sigmoid(z))
    ms = jnp.mean(jnp.square(g), axis=-1, keepdims=True)
    o_ref[...] = (g * jax.lax.rsqrt(ms + eps) * w_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _row_call(kernel, out_dtype, row_block, args, d):
    import jax.experimental.pallas as pl

    lead = args[0].shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    flat = [a.reshape(rows, d) for a in args[:-1]]
    w = args[-1]
    rb = min(row_block, rows)
    while rows % rb:
        rb -= 1
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        grid=(rows // rb,),
        in_specs=[pl.BlockSpec((rb, d), lambda i: (i, 0)) for _ in flat]
        + [pl.BlockSpec((1, d), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((rb, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, d), out_dtype),
        interpret=interpret,
    )(*flat, w.reshape(1, d))
    return out.reshape(*lead, d)


import numpy as np  # noqa: E402 (used by _row_call)


def rms_norm_pallas(x: jax.Array, weight: jax.Array, eps: float = 1e-6, row_block: int = 256) -> jax.Array:
    """y = x * rsqrt(mean(x^2) + eps) * weight, rowwise over the last axis."""
    kern = functools.partial(_rms_kernel, eps=eps)
    return _row_call(kern, x.dtype, row_block, (x, weight), x.shape[-1])


def gated_rms_norm_pallas(
    x: jax.Array, z: jax.Array, weight: jax.Array, eps: float = 1e-6, row_block: int = 256
) -> jax.Array:
    """y = RMSNorm(x * silu(z)) * weight — RMSNormGated semantics
    (mamba_ssm layernorm_gated with norm_before_gate=False)."""
    kern = functools.partial(_gated_rms_kernel, eps=eps)
    return _row_call(kern, x.dtype, row_block, (x, z, weight), x.shape[-1])
