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
    if len(devs) < n:
        raise RuntimeError(
            f"make_mesh: asked for {n} devices but only {len(devs)} "
            f"{devs[0].platform} device(s) are visible. For a virtual CPU "
            f"mesh, provision BEFORE first backend use: "
            f'jax.config.update("jax_num_cpu_devices", {n}); '
            f'jax.config.update("jax_platforms", "cpu") '
            f"(see adnm_tpu.parallel.provision_cpu_devices)."
        )
    devs = devs[:n]
    if shape is None:
        shape = [n] + [1] * (len(axes) - 1)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, tuple(axes))


def provision_cpu_devices(n_devices: int) -> bool:
    """Force the CPU platform with ``n_devices`` virtual devices, if the
    JAX backend has not been initialized yet (the standard fake-mesh
    technique for validating multi-chip sharding without hardware).

    Returns True if after the call ``len(jax.devices()) >= n_devices``.
    Must run before any JAX operation touches a backend; this container
    pins ``jax_platforms=axon`` via sitecustomize, so the config update
    (not the env var) is the only reliable switch.
    """
    from jax._src import xla_bridge as _xb

    if not getattr(_xb, "_backends", None):
        try:
            jax.config.update("jax_num_cpu_devices", n_devices)
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            import os

            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={n_devices}"
            ).strip()
            os.environ["JAX_PLATFORMS"] = "cpu"
    return len(jax.devices()) >= n_devices


def maybe_shard(x: jax.Array, *axes: Optional[str]) -> jax.Array:
    """Annotate ``x`` with a PartitionSpec over the ACTIVE mesh (set via
    ``jax.sharding.set_mesh``), silently dropping axis names the mesh
    does not have — and axis names whose dimension is not divisible by
    the mesh axis size (deep pyramid levels where H has shrunk below the
    shard count fall back to replicated instead of padded shards). No-op
    outside any mesh — so models can carry always-on sharding
    annotations (the GSPMD "annotate and let XLA insert collectives"
    recipe) and still run single-device.

    This is how the Refiner's 65k-token mixers get sequence sharding:
    constraining the (B, H, W, C) activations to P('data', 'seq')
    splits L = H*W over 'seq', and XLA lowers the duality's K^T V
    contraction to a psum over that axis (SURVEY section 2.4).
    """
    am = jax.sharding.get_abstract_mesh()
    if am is None or am.empty:
        return x
    names = set(am.axis_names)
    spec = tuple(
        a
        if (a in names and i < x.ndim and x.shape[i] % am.shape[a] == 0)
        else None
        for i, a in enumerate(axes)
    )
    if not any(spec):
        return x
    return jax.lax.with_sharding_constraint(x, P(*spec))


def assert_training_mesh(mesh: Optional[Mesh]) -> None:
    """Refuse TRAINING on meshes with three or more non-trivial axes.

    XLA v0.9.0's SPMD partitioner (Shardy and the legacy GSPMD pass
    alike) miscomputes WEIGHT gradients on >=3-axis meshes: at any
    activation reshard boundary, the weight-grad cross-replica reduction
    double-counts contributions over the axes the operands are
    replicated on (observed: conv/einsum kernel grads exactly
    ``axis_size`` times too large, while the loss and all activation
    cotangents stay correct — so training silently diverges). The
    minimal reproduction and the exact trigger matrix live in
    ``tests/test_parallel.py::TestXlaThreeAxisGradDefect``; that test
    FAILS LOUDLY when a jax upgrade fixes the defect, at which point
    this guard can be dropped. Every <=2-axis combination —
    ('data',), ('data','seq'), ('data','model'), each with or without
    ZeRO-1 — is verified gradient-exact and remains supported; 3-axis
    meshes remain fine for inference (forward output parity is tested
    on ('data','seq','model') in tests/test_parallel.py).

    A second, broader instance of the same defect class hits GROUPED
    convolutions (lax feature_group_count > 1) on ANY multi-axis mesh:
    their weight grads come back scaled by the product of the mesh axes
    the operands are replicated over. That one is fixed structurally —
    core.layers.Conv2d lowers groups>1 through an explicit tap-sum
    einsum instead of lax's grouped path (gradient-exact under every
    mesh; tests/test_parallel.py::TestXlaGroupedConvGradDefect) — so no
    guard is needed here for it.
    """
    if mesh is None:
        return
    hot = [a for a in mesh.axis_names if mesh.shape[a] > 1]
    if len(hot) > 2:
        raise ValueError(
            f"Training on a mesh with >=3 non-trivial axes {hot} is "
            f"disabled: XLA v0.9.0 miscomputes weight gradients on such "
            f"meshes (exact-factor double-counting at reshard "
            f"boundaries; see tests/test_parallel.py::"
            f"TestXlaThreeAxisGradDefect and adnm_tpu/parallel/mesh.py). "
            f"Use a 2-axis mesh — e.g. data x seq for training, and "
            f"keep the 'model' (tensor-parallel) axis for inference "
            f"sharding — or fold axes together."
        )


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch); replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
