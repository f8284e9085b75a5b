"""Test configuration: run on a virtual 8-device CPU mesh.

This is the standard JAX fake-mesh technique for testing multi-device
sharding without hardware (replacing the reference's implicit
single-process DataParallel, train.py:99-102).

Note: this environment's axon sitecustomize pins jax_platforms at
import, so the env var alone is not enough — we override via jax.config
after import. Set ADNM_TEST_PLATFORM=axon to run the suite on the real
TPU chip instead (single device; multi-device tests self-skip).
"""

import os

os.environ["JAX_PLATFORMS"] = os.environ.get("ADNM_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache (shared with bench.py/__graft_entry__.py): the
# 1-core host recompiles big graphs in minutes; warm reruns take seconds.
# enable_compile_cache also hardens entry writes to atomic temp+rename —
# jax 0.9.0's stock put() is a torn-write segfault waiting to happen when
# the 2-process multi-host tests share this directory (utils/cache.py).
from adnm_tpu.utils.cache import enable_compile_cache  # noqa: E402

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
enable_compile_cache(_CACHE)
