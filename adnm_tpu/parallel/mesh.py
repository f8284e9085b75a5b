"""Device mesh + sharding rules (the TPU replacement for the reference's
nn.DataParallel + SyncBatchNorm, train.py:99-102).

Strategy: a ('data',) mesh shards the batch axis; params/optimizer state
are replicated. Under jit, XLA inserts the gradient all-reduce over ICI
and computes global batch statistics for BatchNorm models automatically
(SyncBatchNorm semantics for free). An optional ('data', 'seq') mesh
additionally shards the SSD token axis L for the linear-attention dual
(the K^T V contraction reduces over L, so XLA lowers it to a
psum-style reduce-scatter) — a TPU-native extension beyond reference
parity (SURVEY section 2.4).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if shape is None:
        shape = [n] + [1] * (len(axes) - 1)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch); replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
