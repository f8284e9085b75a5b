"""Pallas TPU kernel: causal chunked SSD scan.

TPU-native equivalent of mamba_ssm's Triton ``mamba_chunk_scan_combined``
(reference: models/ADNssd.py:6,414-440). One kernel walks the chunk axis
sequentially (TPU grids iterate the trailing dimension in order), carrying
the (N, H*P) inter-chunk state in VMEM scratch — no HBM round-trip for
the recurrence, and the intra-chunk work is MXU matmuls.

Layout: heads are folded into lanes as (Q, H*P) blocks; the per-head
decay enters via broadcasted exp(cumsum) factors. The intra-chunk masked
attention is computed per head (static python loop) — use this kernel
for small-H paths (H <= 32, e.g. the ADNM refiner mixers); the XLA
implementation (adnm_tpu.ops.ssd.ssd_chunked_scan) is the general
fallback and the custom-VJP backward.

Numerics: all kernel matmuls run at Precision.HIGHEST (exact f32) —
measured max |pallas - xla| = 8e-6 when the XLA reference also runs at
highest matmul precision (the apparent mismatch under default settings
is the XLA path's bf16 MXU passes, not this kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from adnm_tpu.ops.ssd import ssd_chunked_scan


def _kernel(x_ref, dt_ref, a_ref, b_ref, c_ref, d_ref, out_ref, state_ref, *, H, P, N, Q):
    import jax.experimental.pallas as pl

    c_idx = pl.program_id(1)

    @pl.when(c_idx == 0)
    def _():
        state_ref[...] = jnp.zeros_like(state_ref)

    x = x_ref[0].astype(jnp.float32)  # (Q, H*P)
    dt = dt_ref[0].astype(jnp.float32)  # (Q, H)
    A = a_ref[0].astype(jnp.float32)  # (H,)
    Bm = b_ref[0].astype(jnp.float32)  # (Q, N)
    Cm = c_ref[0].astype(jnp.float32)  # (Q, N)
    D = d_ref[0].astype(jnp.float32)  # (H,)

    dA = dt * A[None, :]  # (Q, H) negative
    # cumsum via lower-triangular matmul (cumsum has no Pallas TPU lowering)
    row = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 1)
    tril = (row >= col).astype(jnp.float32)
    cum = jnp.dot(tril, dA, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)  # (Q, H)

    # head-broadcast (Q, H) -> (Q, H*P) as a matmul with a 0/1 expander
    # (Mosaic rejects the (Q,H,P)->(Q,H*P) reshape; this rides the MXU)
    hp_col = jax.lax.broadcasted_iota(jnp.int32, (H, H * P), 1)
    h_row = jax.lax.broadcasted_iota(jnp.int32, (H, H * P), 0)
    expander = (hp_col // P == h_row).astype(jnp.float32)  # (H, H*P)

    def lanes(v):
        return jnp.dot(v, expander, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)

    xdt = x * lanes(dt)
    S = state_ref[...]  # (N, H*P) f32

    # inter-chunk: y = (C @ S) * exp(cum)
    y = jnp.dot(Cm, S, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST) * lanes(jnp.exp(cum))

    # intra-chunk: per-head masked attention matmul
    qk = jnp.dot(Cm, Bm.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)  # (Q, Q)
    causal = row >= col
    intra = []
    for h in range(H):
        seg = cum[:, h][:, None] - cum[:, h][None, :]
        att = jnp.where(causal, qk * jnp.exp(seg), 0.0)
        intra.append(
            jnp.dot(att, xdt[:, h * P : (h + 1) * P], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        )
    y = y + jnp.concatenate(intra, axis=1)

    out_ref[0] = (y + x * lanes(jnp.broadcast_to(D[None, :], (Q, H)))).astype(out_ref.dtype)

    # state carry: S' = S * exp(cum_end) + B^T @ (xdt * exp(cum_end - cum))
    end = cum[-1:, :]  # (1, H)
    decay_in = lanes(jnp.exp(end - cum))  # (Q, H*P)
    state_ref[...] = S * lanes(jnp.exp(end)) + jnp.dot(
        Bm.T, xdt * decay_in, preferred_element_type=jnp.float32
    )


def _forward(x, dt, A, B_mat, C_mat, D, chunk_size):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, l, h, p = x.shape
    n = B_mat.shape[-1]
    q = min(chunk_size, l)
    assert l % q == 0
    nc = l // q
    xf = x.reshape(b, l, h * p)

    interpret = jax.default_backend() != "tpu"
    kern = functools.partial(_kernel, H=h, P=p, N=n, Q=q)
    out = pl.pallas_call(
        kern,
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, q, h * p), lambda bi, ci: (bi, ci, 0)),
            pl.BlockSpec((1, q, h), lambda bi, ci: (bi, ci, 0)),
            pl.BlockSpec((1, h), lambda bi, ci: (0, 0)),
            pl.BlockSpec((1, q, n), lambda bi, ci: (bi, ci, 0)),
            pl.BlockSpec((1, q, n), lambda bi, ci: (bi, ci, 0)),
            pl.BlockSpec((1, h), lambda bi, ci: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, q, h * p), lambda bi, ci: (bi, ci, 0)),
        out_shape=jax.ShapeDtypeStruct((b, l, h * p), x.dtype),
        scratch_shapes=[pltpu.VMEM((n, h * p), jnp.float32)],
        interpret=interpret,
    )(
        xf,
        dt,
        A[None, :],
        B_mat,
        C_mat,
        D[None, :],
    )
    return out.reshape(b, l, h, p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def ssd_chunked_scan_pallas(x, dt, A, B_mat, C_mat, D, chunk_size: int = 256):
    """Pallas forward, XLA backward (differentiates the reference
    ssd_chunked_scan). Semantics identical to ops.ssd.ssd_chunked_scan."""
    return _forward(x, dt, A, B_mat, C_mat, D, chunk_size)


def _fwd(x, dt, A, B_mat, C_mat, D, chunk_size):
    return _forward(x, dt, A, B_mat, C_mat, D, chunk_size), (x, dt, A, B_mat, C_mat, D)


def _bwd(chunk_size, res, g):
    x, dt, A, B_mat, C_mat, D = res
    _, vjp = jax.vjp(lambda *a: ssd_chunked_scan(*a, chunk_size=chunk_size), x, dt, A, B_mat, C_mat, D)
    return vjp(g)


ssd_chunked_scan_pallas.defvjp(_fwd, _bwd)
