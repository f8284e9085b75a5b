"""Attention mixers: standard softmax MHA and DeepSeek-V2 MLA.

StandardAttention — reference: models/ADNssd.py:26-47 (duplicate at
Vssd.py:24-45); used at the U-Net's coarse grids (<=1024 tokens,
ADNMUNet.py:453-454,480) where softmax attention is cheap.

MLA — reference: models/MLA.py:108-307; present in the reference but not
wired into any model (imported at ADNMUNet.py:25; the Attention wrapper
uses StandardAttention). Provided here with the same config generator
for capability parity.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from adnm_tpu.core.layers import Dense, RMSNorm


class StandardAttention(nn.Module):
    """Softmax MHA on (B, L, D) tokens (reference: ADNssd.py:26-47)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = self.heads * self.dim_head
        qkv = Dense(inner * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, l, _ = x.shape

        def heads(t):
            return t.reshape(b, l, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        # Tensor parallelism: heads are independent, so under a mesh with
        # a 'model' axis the QK^T / AV matmuls partition over heads
        # (tokens are gathered — attention is global over L anyway).
        from adnm_tpu.parallel.mesh import maybe_shard

        q = maybe_shard(q, "data", "model", None, None)
        k = maybe_shard(k, "data", "model", None, None)
        v = maybe_shard(v, "data", "model", None, None)
        scale = self.dim_head ** -0.5
        logits = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, inner)
        return Dense(self.dim, dtype=self.dtype, name="to_out")(out)


def _rope_cos_sin(seq_len: int, dim: int, theta: float, dtype=jnp.float32):
    inv_freq = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _apply_rope(q, k, cos, sin):
    """DeepSeek-V2 interleaved rope (reference: MLA.py:74-86): channels are
    de-interleaved pairwise before the rotation."""

    def de_interleave(t):
        b, h, s, d = t.shape
        return t.reshape(b, h, s, d // 2, 2).swapaxes(-1, -2).reshape(b, h, s, d)

    q, k = de_interleave(q), de_interleave(k)
    q = q * cos + _rotate_half(q) * sin
    k = k * cos + _rotate_half(k) * sin
    return q, k


class MLA(nn.Module):
    """Multi-head latent attention with low-rank q/kv compression + RoPE
    (reference: models/MLA.py:108-307)."""

    hidden_size: int
    num_heads: int
    q_lora_rank: int
    kv_lora_rank: int
    qk_rope_head_dim: int = 64
    qk_nope_head_dim: int = 64
    v_head_dim: int = 64
    rope_theta: float = 128000.0
    attention_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, l, _ = x.shape
        nh = self.num_heads
        q_head_dim = self.qk_nope_head_dim + self.qk_rope_head_dim

        q = Dense(self.q_lora_rank, use_bias=self.attention_bias, name="q_down_proj")(x)
        q = RMSNorm(self.q_lora_rank, name="q_down_norm")(q)
        q = Dense(nh * q_head_dim, use_bias=self.attention_bias, name="q_up_proj")(q)
        q = q.reshape(b, l, nh, q_head_dim).transpose(0, 2, 1, 3)
        q_nope, q_rope = jnp.split(q, [self.qk_nope_head_dim], axis=-1)

        ckv = Dense(self.kv_lora_rank + self.qk_rope_head_dim, use_bias=self.attention_bias, name="kv_down_proj")(x)
        ckv, k_rope = jnp.split(ckv, [self.kv_lora_rank], axis=-1)
        k_rope = k_rope.reshape(b, l, 1, self.qk_rope_head_dim).transpose(0, 2, 1, 3)
        kv = RMSNorm(self.kv_lora_rank, name="kv_down_norm")(ckv)
        kv = Dense(nh * (self.qk_nope_head_dim + self.v_head_dim), use_bias=self.attention_bias, name="kv_up_proj")(kv)
        kv = kv.reshape(b, l, nh, self.qk_nope_head_dim + self.v_head_dim).transpose(0, 2, 1, 3)
        k_nope, v = jnp.split(kv, [self.qk_nope_head_dim], axis=-1)

        cos, sin = _rope_cos_sin(l, self.qk_rope_head_dim, self.rope_theta, x.dtype)
        q_rope, k_rope = _apply_rope(q_rope, k_rope, cos, sin)

        q_full = jnp.concatenate([q_nope, q_rope], axis=-1)
        k_full = jnp.concatenate([k_nope, jnp.broadcast_to(k_rope, k_nope.shape[:-1] + (self.qk_rope_head_dim,))], axis=-1)
        logits = jnp.einsum("bhid,bhjd->bhij", q_full, k_full) / math.sqrt(q_head_dim)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, nh * self.v_head_dim)
        return Dense(self.hidden_size, use_bias=False, name="out_proj")(out)


def generate_mla_config(dim: int, strict: bool = True) -> dict:
    """Reference: models/MLA.py:351-400 (generate_mla_config).

    ``strict=False`` lifts the reference's power-of-two whitelist so the
    same head/rank formulas apply at arbitrary dims (needed when MLA is
    wired into the U-Net's AttentionBlock sites, whose dims follow the
    embed schedule — e.g. 128/1024 for the flagship but 8 in the tiny
    test configs); requires dim % max(1, dim // 8) == 0, which the
    formula guarantees for dim >= 8 multiples of 8."""
    if strict and dim not in (16, 32, 64, 128, 256, 512):
        raise ValueError(f"Unsupported dim={dim}")
    num_heads = max(1, dim // 8)
    v_head_dim = dim // num_heads
    return dict(
        hidden_size=dim,
        num_heads=num_heads,
        v_head_dim=v_head_dim,
        qk_rope_head_dim=64,
        qk_nope_head_dim=v_head_dim,
        q_lora_rank=max(64, dim // 4),
        kv_lora_rank=max(32, dim // 8),
        rope_theta=128000.0,
        attention_bias=False,
    )
