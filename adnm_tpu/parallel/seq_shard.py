"""Sequence-sharded SSD linear-attention dual.

A TPU-native extension beyond reference parity (SURVEY section 2.4): the
non-causal duality (ops/ssd.py:linear_attn_dual) is einsum-decomposable
over the token axis L, so L = H*W can be sharded across a 'seq' mesh
axis: each device computes its local K^T V contribution, a psum over
'seq' forms the global (N, H, P) state, and the Q @ KV read-out stays
local. One small all-reduce rides the ICI per mixer — the token axis
(65,536 at full resolution) never needs to fit on one chip.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:  # jax >= 0.8 top-level API; the experimental path is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def sharded_linear_attn_dual(
    mesh: Mesh,
    x: jax.Array,
    dt: jax.Array,
    A: jax.Array,
    B_mat: jax.Array,
    C_mat: jax.Array,
    D: jax.Array,
    positive_dA: bool = True,
    batch_axis: Optional[str] = "data",
    seq_axis: str = "seq",
) -> jax.Array:
    """Same contract as ops.ssd.linear_attn_dual with L sharded over
    ``seq_axis`` (and batch over ``batch_axis`` if present in the mesh)."""
    bspec = batch_axis if (batch_axis and batch_axis in mesh.axis_names) else None

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(bspec, seq_axis, None, None),  # x (B, L, H, P)
            P(bspec, seq_axis, None),  # dt
            P(),  # A
            P(bspec, seq_axis, None),  # B
            P(bspec, seq_axis, None),  # C
            P(),  # D
        ),
        out_specs=P(bspec, seq_axis, None, None),
        check_vma=False,  # jax >= 0.9 name for check_rep
    )
    def f(x_l, dt_l, A_f, B_l, C_l, D_f):
        dA = dt_l * A_f
        if positive_dA:
            dA = -dA
        v_scaled = x_l * dA[..., None]
        kv_local = jnp.einsum("bln,blhp->bhnp", B_l, v_scaled)
        kv = jax.lax.psum(kv_local, seq_axis)
        y = jnp.einsum("bln,bhnp->blhp", C_l, kv)
        return y + x_l * D_f[None, None, :, None]

    return f(x, dt, A, B_mat, C_mat, D)
