"""Test configuration: run on a virtual 8-device CPU mesh.

This is the standard JAX fake-mesh technique for testing multi-device
sharding without hardware (replacing the reference's implicit
single-process DataParallel, train.py:99-102).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
