"""State-space duality (Mamba2 SSD) scan ops, XLA-native.

Three implementations of the SSD token mixer:

  * ``linear_attn_dual`` — the NON-CAUSAL linear-attention duality, the
    reference's *default* execution path
    (reference: models/ADNssd.py:252-299, non_casual_linear_attn;
    enabled via linear_attn_duality=True at models/ADNMUNet.py:277).
    Pure einsums -> batched matmuls on the MXU; O(L * N * P) per head.
  * ``ssd_chunked_scan`` — causal chunked SSD matching the semantics of
    mamba_ssm's ``mamba_chunk_scan_combined`` Triton kernel
    (reference: models/ADNssd.py:6,414-440): intra-chunk attention-form
    matmuls + sequential inter-chunk state carry (lax.scan), chunk 256.
  * ``ssd_naive_scan`` — O(L^2) causal reference oracle for tests.

Conventions: x (B, L, H, P); dt (B, L, H) already softplus'd;
A (H,) negative; B_mat / C_mat (B, L, N) shared across heads (the
reference's default collapses its 2 groups into one N=16 group per dual
path, ADNssd.py:278-284); D (H,) skip.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def linear_attn_dual(
    x: jax.Array,
    dt: jax.Array,
    A: jax.Array,
    B_mat: jax.Array,
    C_mat: jax.Array,
    D: jax.Array,
    positive_dA: bool = True,
) -> jax.Array:
    """Non-causal linear-attention dual of Mamba2.

    dA = dt * A (negated when positive_dA, matching ssd_positve_dA=True,
    ADNssd.py:98,267-268 with A = -exp(A_log) so dA >= 0). Then
      y = C @ (B^T (x * dA)) + x * D.
    """
    dA = dt * A  # (B, L, H)
    if positive_dA:
        dA = -dA
    v_scaled = x * dA[..., None]  # (B, L, H, P)
    kv = jnp.einsum("bln,blhp->bhnp", B_mat, v_scaled)
    y = jnp.einsum("bln,bhnp->blhp", C_mat, kv)
    return y + x * D[None, None, :, None]


def linear_attn_dual_seqminor(
    x_t: jax.Array,
    dt_t: jax.Array,
    A: jax.Array,
    B_t: jax.Array,
    C_t: jax.Array,
    D: jax.Array,
    positive_dA: bool = True,
) -> jax.Array:
    """``linear_attn_dual`` in a sequence-minor (lane-friendly) layout.

    x_t: (B, H, P, L); dt_t: (B, H, L); B_t/C_t: (B, N, L); returns
    y_t: (B, H, P, L). Same math as ``linear_attn_dual`` (reference
    models/ADNssd.py:252-299) — only the tensor layout differs.

    Why: at the refiner's L=65536 with headdim P=4 and N=16, the
    token-minor layout puts tiny dims (4/8/16) in the TPU lane position,
    so every materialized (B, L, small) tensor pads to the 128-wide lane
    tile — 8-32x HBM bloat on the backward's saved operands and
    cotangents (dB/dC/dx). With L minor the big tensors tile perfectly
    (lane = L, sublane = small dims >= 8) and the duality stays two
    rank-3 matmuls per path: B/C are shared across heads, so
    kv[b,n,c] = sum_l B[b,n,l] v[b,c,l] with c = (h,p) folded.
    """
    b, h, p, l = x_t.shape
    dA = dt_t * A[None, :, None]  # (B, H, L)
    if positive_dA:
        dA = -dA
    v = (x_t * dA[:, :, None, :]).reshape(b, h * p, l)
    kv = jnp.einsum("bnl,bcl->bnc", B_t, v)
    y = jnp.einsum("bnl,bnc->bcl", C_t, kv).reshape(b, h, p, l)
    return y + x_t * D[None, :, None, None]


def ssd_naive_scan(x, dt, A, B_mat, C_mat, D, chunk_size: int = 64) -> jax.Array:
    """O(L^2) causal SSD oracle: y_t = C_t^T sum_{s<=t} exp(a_{s+1..t}) B_s x_s dt_s + D x_t."""
    b, l, h, p = x.shape
    dA = dt * A  # (B, L, H), negative
    cum = jnp.cumsum(dA, axis=1)  # (B, L, H)
    # decay(s -> t) = exp(cum_t - cum_s), t >= s
    decay = jnp.exp(cum[:, :, None, :] - cum[:, None, :, :])  # (B, T, S, H)
    mask = jnp.tril(jnp.ones((l, l), bool))
    decay = jnp.where(mask[None, :, :, None], decay, 0.0)
    qk = jnp.einsum("btn,bsn->bts", C_mat, B_mat)  # (B, T, S)
    att = qk[..., None] * decay  # (B, T, S, H)
    y = jnp.einsum("btsh,bshp->bthp", att, x * dt[..., None])
    return y + x * D[None, None, :, None]


def ssd_state_update(
    state: jax.Array,
    x_t: jax.Array,
    dt_t: jax.Array,
    A: jax.Array,
    B_t: jax.Array,
    C_t: jax.Array,
    D: jax.Array,
):
    """Single-token recurrent update for autoregressive decode — the
    TPU equivalent of mamba_ssm's ``selective_state_update`` Triton
    kernel (reference: models/ADNssd.py:9).

    Capability library, unwired by design (like the reference, which
    imports but never calls its counterpart in serving): every shipped
    model's sequence axis is SPATIAL — a frame's tokens all arrive at
    once, and the rollout horizon (cli/predict.py --horizon) must
    re-run the full conv U-Net per predicted frame because each new
    frame changes every token. Kept exported + oracle-tested
    (tests/test_ssd.py) for future token-autoregressive models.

    state: (B, H, N, P); x_t: (B, H, P); dt_t: (B, H); A: (H,) negative;
    B_t/C_t: (B, N); D: (H,). Returns (new_state, y_t) with
      new_state = state * exp(dt*A) + B_t (x_t dt_t)
      y_t = C_t^T new_state + D x_t.
    """
    decay = jnp.exp(dt_t * A)  # (B, H)
    xdt = x_t * dt_t[..., None]  # (B, H, P)
    new_state = state * decay[..., None, None] + jnp.einsum("bn,bhp->bhnp", B_t, xdt)
    y = jnp.einsum("bn,bhnp->bhp", C_t, new_state) + x_t * D[None, :, None]
    return new_state, y


def _segsum(a: jax.Array) -> jax.Array:
    """Stable segment-sum: out[..., t, s] = sum_{r=s+1..t} a[..., r] for
    t >= s, -inf otherwise. a: (..., Q) -> (..., Q, Q)."""
    q = a.shape[-1]
    cs = jnp.cumsum(a, axis=-1)
    out = cs[..., :, None] - cs[..., None, :]
    mask = jnp.tril(jnp.ones((q, q), bool), 0)
    return jnp.where(mask, out, -jnp.inf)


def ssd_chunked_scan(
    x: jax.Array,
    dt: jax.Array,
    A: jax.Array,
    B_mat: jax.Array,
    C_mat: jax.Array,
    D: jax.Array,
    chunk_size: int = 256,
    initial_state: Optional[jax.Array] = None,
) -> jax.Array:
    """Causal chunked SSD (mamba_chunk_scan_combined semantics).

    L must be divisible by chunk_size (the model's L = (2^k)^2 always is).
    Intra-chunk work is attention-form matmuls (MXU); the inter-chunk
    state (B, H, N, P) carries through a lax.scan over L/chunk chunks.
    """
    b, l, h, p = x.shape
    n = B_mat.shape[-1]
    q = min(chunk_size, l)
    assert l % q == 0, (l, q)
    nc = l // q

    xd = (x * dt[..., None]).reshape(b, nc, q, h, p)
    dA = (dt * A).reshape(b, nc, q, h)  # (B, C, Q, H)
    Bc = B_mat.reshape(b, nc, q, n)
    Cc = C_mat.reshape(b, nc, q, n)

    # intra-chunk: y_intra[t] = sum_{s<=t} exp(sum_{r=s+1..t} dA_r) (C_t.B_s) x_s dt_s
    seg = _segsum(jnp.moveaxis(dA, -1, 2))  # (B, C, H, Q, Q)
    decay = jnp.exp(seg)
    qk = jnp.einsum("bctn,bcsn->bcts", Cc, Bc)  # (B, C, Q, Q)
    y_intra = jnp.einsum("bchts,bcshp->bcthp", decay * qk[:, :, None], xd)

    # per-chunk end states: S_c = sum_s exp(cum_end - cum_s) B_s (x_s dt_s)
    cum = jnp.cumsum(dA, axis=2)  # (B, C, Q, H)
    end_decay = jnp.exp(cum[:, :, -1:, :] - cum)  # (B, C, Q, H)
    chunk_state = jnp.einsum("bcsn,bcsh,bcshp->bchnp", Bc, end_decay, xd)
    chunk_decay = jnp.exp(cum[:, :, -1, :])  # (B, C, H) total decay across chunk

    # inter-chunk carry (sequential over chunks)
    def step(S, inp):
        cstate, cdecay = inp  # (B, H, N, P), (B, H)
        S_out = S  # state entering this chunk
        S = S * cdecay[..., None, None] + cstate
        return S, S_out

    S0 = (
        initial_state
        if initial_state is not None
        else jnp.zeros((b, h, n, p), x.dtype)
    )
    _, S_in = jax.lax.scan(
        step,
        S0,
        (jnp.moveaxis(chunk_state, 1, 0), jnp.moveaxis(chunk_decay, 1, 0)),
    )
    S_in = jnp.moveaxis(S_in, 0, 1)  # (B, C, H, N, P) state entering each chunk

    in_decay = jnp.exp(cum)  # (B, C, Q, H): decay from chunk start to t inclusive
    y_inter = jnp.einsum("bctn,bcth,bchnp->bcthp", Cc, in_decay, S_in)

    y = (y_intra + y_inter).reshape(b, l, h, p)
    return y + x * D[None, None, :, None]
