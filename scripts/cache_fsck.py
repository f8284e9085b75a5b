"""Quarantine-until-clean fsck for the persistent XLA compile cache.

Cache entries written by jax 0.9.0's stock non-atomic ``LRUCache.put``
(before ``adnm_tpu.utils.cache.enable_compile_cache`` hardened writes to
atomic temp+rename) can be TORN: a concurrent reader snapshotted them
mid-write. A torn entry either fails deserialization cleanly
("proto deserialization failed") or — worse — passes the zstd + proto
framing and corrupts the heap inside XLA:CPU's AOT loader, aborting the
whole process (SIGSEGV/SIGABRT). That second failure mode took down the
full test suite at an unrelated later test in round 3 before the write
path was fixed.

This fsck loads every ``*-cache`` entry in a child process; when the
child dies, the entry it was loading is moved to the quarantine dir and
the child is relaunched, until a full pass completes. Entries that fail
cleanly are quarantined too (they are useless bytes jax would treat as a
miss-after-read). Quarantined entries simply recompile on next use.

Usage:
    python scripts/cache_fsck.py [cache_dir] [quarantine_dir]

Defaults: <repo>/.jax_cache and /tmp/jax_cache_quarantine. Exit 0 means
the cache is clean (possibly after quarantining). Run it whenever the
suite starts dying with signal 11/6 inside ``deserialize_executable``.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys, glob
cache_dir = sys.argv[1]
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")
from jax._src import compilation_cache as cc
backend = jax.devices()[0].client
devs = jax.devices()
keep, ok, fails = [], 0, []
for f in sorted(glob.glob(os.path.join(cache_dir, "*-cache"))):
    # Printed BEFORE the load so the parent knows which entry killed us.
    print(f"LOADING {f}", flush=True)
    raw = open(f, "rb").read()
    try:
        blob = cc.decompress_executable(raw)
        ser, _t = cc.extract_executable_and_time(blob)
        # Keep executables resident like a real long process would.
        keep.append(backend.deserialize_executable(ser, devs))
        ok += 1
    except Exception as e:
        print(f"CLEANFAIL {f} {type(e).__name__}", flush=True)
        fails.append(f)
print(f"DONE ok={ok} cleanfail={len(fails)}", flush=True)
"""


def _quarantine(path: str, quar: str) -> None:
    os.makedirs(quar, exist_ok=True)
    print(f"QUARANTINE {os.path.basename(path)}", flush=True)
    shutil.move(path, os.path.join(quar, os.path.basename(path)))


def fsck(cache_dir: str, quar: str, max_passes: int = 40) -> int:
    env = dict(os.environ)
    # Drop the axon sitecustomize pin so the child comes up on CPU.
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    for attempt in range(max_passes):
        proc = subprocess.run(
            [sys.executable, "-u", "-c", _CHILD, cache_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True, timeout=1800,
        )
        lines = proc.stdout.splitlines()
        cleanfails = [l.split()[1] for l in lines if l.startswith("CLEANFAIL")]
        done = [l for l in lines if l.startswith("DONE")]
        if proc.returncode == 0 and done:
            for f in cleanfails:
                if os.path.exists(f):
                    _quarantine(f, quar)
            print(f"CLEAN after {attempt + 1} pass(es): {done[0]}"
                  + (f" (+{len(cleanfails)} clean-fail entries quarantined)"
                     if cleanfails else ""))
            return 0
        loading = [l.split(None, 1)[1] for l in lines if l.startswith("LOADING")]
        if not loading:
            print(proc.stdout[-2000:])
            print(f"child died rc={proc.returncode} before loading any entry")
            return 1
        print(f"pass {attempt + 1}: child rc={proc.returncode} "
              f"died loading {os.path.basename(loading[-1])}", flush=True)
        _quarantine(loading[-1], quar)
    print(f"gave up after {max_passes} passes")
    return 1


if __name__ == "__main__":
    cache = sys.argv[1] if len(sys.argv) > 1 else os.path.join(_REPO, ".jax_cache")
    quar = sys.argv[2] if len(sys.argv) > 2 else "/tmp/jax_cache_quarantine"
    sys.exit(fsck(cache, quar))
