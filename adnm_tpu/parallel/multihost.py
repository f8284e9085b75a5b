"""Multi-host (multi-process) training support.

The reference's only distributed feature is single-process
``nn.DataParallel`` over local GPUs (train.py:99-102). This module is
the TPU-native scale-out beyond that: every host runs the same program,
``jax.distributed`` wires the coordination service, and the device mesh
spans ALL hosts' chips — XLA then emits cross-host collectives
automatically from the same sharding annotations used single-process
(gradient all-reduce over 'data' rides DCN between hosts, ICI within a
slice; see parallel/mesh.py for the axis vocabulary).

Wiring (matches tests/test_multihost.py and cli/common.py):

  1. ``init_multihost(...)`` FIRST — before anything touches a device.
     On TPU pods all arguments autodetect from the runtime environment;
     on CPU (tests / this container) pass coordinator/count/id
     explicitly and collectives go through gloo.
  2. Build the mesh from the now-global device set (``make_mesh``).
  3. Per-host input pipeline: ``BatchLoader(..., row_shard=
     (process_index, process_count))`` — each host yields its
     ``batch_size`` rows of every GLOBAL batch (identical step count on
     every host BY CONSTRUCTION; a host with fewer steps deadlocks the
     others' collectives), and the Trainer assembles those rows into one
     global array (``jax.make_array_from_process_local_data``), so the
     effective global batch is ``local_batch * process_count``. Do NOT
     use the loader's ``shard=`` mode (whole-batch round-robin) for
     training — per-host batch counts can differ.

Training and loss/grad-norm telemetry are multi-host safe (scalars are
fully replicated, every host reads its local copy). Prediction
COLLECTION (``eval_epoch(collect=True)`` / ``Trainer.predict``, used by
cli/validate + cli/visualize) fetches full output arrays and is a
single-host workflow — run those tools on one host against a
checkpoint.
"""

from __future__ import annotations

import os
from typing import Optional


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> tuple[int, int]:
    """Initialize jax.distributed and return (process_index,
    process_count).

    Must run before any other JAX call (backend init is sticky). On TPU
    pods every argument may be None (autodetected from the runtime); on
    CPU the three must be given, and the CPU collectives implementation
    is switched to gloo (XLA's default CPU collectives are
    single-process only).
    """
    import jax

    if "cpu" in os.environ.get("JAX_PLATFORMS", "") or coordinator_address:
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # not a CPU run (e.g. TPU pod autodetect path)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    # LIFO atexit: this runs BEFORE jax's own distributed teardown, so
    # every consumer (CLIs, test workers) gets the synchronized shutdown
    # of finish_multihost() even without explicit wiring.
    import atexit

    atexit.register(finish_multihost)
    return jax.process_index(), jax.process_count()


def host_barrier(name: str, timeout_s: float = 3600.0) -> None:
    """Block until every process reaches this barrier (coordination
    service — host-level, long-timeout; NOT a device collective, so it
    is safe to call while processes are minutes apart, e.g. around
    asymmetric compiles — the default outlasts a full cold compile; a
    dead peer still fails fast via the service's error propagation).
    No-op when jax.distributed is not initialized."""
    from jax._src import distributed

    client = getattr(distributed.global_state, "client", None)
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))


def finish_multihost() -> None:
    """Synchronized teardown for multi-host CLI runs: barrier, then an
    explicit jax.distributed.shutdown() while every process is at the
    same point — otherwise interpreter-exit skew trips the runtime's
    shutdown barrier and the last log lines drown in coordination-service
    errors (observed live). No-op when not initialized."""
    import jax
    from jax._src import distributed

    if getattr(distributed.global_state, "client", None) is None:
        return
    host_barrier("adnm:finish")
    jax.distributed.shutdown()


def is_multiprocess_mesh(mesh) -> bool:
    """True when ``mesh`` spans devices owned by other processes (then
    host-local numpy batches must be assembled into global arrays via
    ``jax.make_array_from_process_local_data`` rather than device_put)."""
    import jax

    if mesh is None:
        return False
    pi = jax.process_index()
    return any(d.process_index != pi for d in mesh.devices.flat)
