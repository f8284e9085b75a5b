"""Worker process for tests/test_multihost.py (not a test module).

Usage: python multihost_worker.py <coordinator> <num_processes> <process_id>
Env: JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=K
(launched with PYTHONPATH scrubbed so the axon sitecustomize pin is gone).

Runs one DP train epoch of the tiny ADNM config on a ('data',) mesh
spanning ALL processes' devices, each process contributing its own
deterministic local batch, and prints a JSON result line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

coordinator, num_processes, process_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
mode = sys.argv[4] if len(sys.argv) > 4 else "dp"  # dp | dpseq_zero1

from adnm_tpu.parallel import init_multihost  # noqa: E402

pi, pc = init_multihost(coordinator, num_processes, process_id)
assert (pi, pc) == (process_id, num_processes), (pi, pc)

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# Both workers (and the pytest parent) share this cache: atomic entry
# writes are mandatory here, or a worker can read a torn executable the
# other worker is mid-writing and segfault (utils/cache.py).
from adnm_tpu.utils.cache import enable_compile_cache  # noqa: E402

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
enable_compile_cache(cache)

import numpy as np  # noqa: E402

from adnm_tpu.models.adnm_unet import ADNMUNet  # noqa: E402
from adnm_tpu.parallel import make_mesh  # noqa: E402
from adnm_tpu.train import Trainer, get_preset  # noqa: E402

CFG = dict(
    channels=5, out_channels=2, kernel=(3, 3, 3), wt_levels=(1, 1, 1),
    embed_dim=(8, 8, 16, 16, 16, 16), refine_dim=(8, 8, 8, 8),
)

n_global = jax.device_count()
if mode == "dpseq_zero1":
    # ('data','seq') mesh spanning both processes + ZeRO-1 sharded
    # optimizer moments: the full beyond-DP training combination,
    # multi-host. 'data' rows stay process-local (mesh device order),
    # the 'seq' halo/psum collectives cross hosts, and the raveled
    # moment shards span all processes' devices.
    mesh = make_mesh(n_global, axes=("data", "seq"), shape=(n_global // 2, 2))
    rows = mesh.shape["data"] // jax.process_count()
else:
    mesh = make_mesh(n_global)  # ('data',) over ALL processes' devices
    rows = jax.local_device_count()
model = ADNMUNet(**CFG)
preset = get_preset("ADNMUnet", 5, 2, 6, "Shanghai")
trainer = Trainer(
    model, preset, 5, 2, img_size=32, mesh=mesh, seed=0,
    shard_opt_state=(mode == "dpseq_zero1"),
)

# this process's rows of the global batch (seeded by process id)
local = np.random.default_rng(100 + process_id).uniform(
    0, 1, (rows, 7, 1, 32, 32)
).astype(np.float32)
stats = trainer.train_epoch([local], lr=1e-3, clip_norm=0.025)
print(json.dumps({
    "process": process_id,
    "loss": stats["loss"],
    "avg_grad_norm": stats["avg_grad_norm"],
}), flush=True)

# synchronized teardown: compile-time skew between workers (minutes on
# this 1-core host) otherwise trips the runtime's shutdown barrier
from adnm_tpu.parallel import finish_multihost  # noqa: E402

finish_multihost()
