"""Crash-safe persistent XLA compile cache setup.

Every long-lived entry point in this repo (tests, bench, driver dry run,
multi-host workers) shares an on-disk compile cache — the 1-core host
recompiles big graphs in minutes, so warm reruns matter. jax 0.9.0's
file cache backend (``jax._src.lru_cache.LRUCache.put``) writes entries
with a plain non-atomic ``Path.write_bytes`` and, with eviction disabled
(the default), takes NO lock: a concurrent process that ``get``s the
same key mid-write reads a TRUNCATED serialized executable, and
deserialization of a torn executable crashes the reader with a hard
SIGSEGV inside ``get_executable_and_time`` (observed: the full test
suite segfaulted in ``Trainer.__init__`` while the cache held entries
freshly written by the 2-process multi-host tests).

``enable_compile_cache`` below configures the cache directory AND
monkeypatches the backend's ``put`` to write-to-temp + ``os.replace``
(atomic on POSIX), so a reader can only ever see a complete entry.
The patch is a no-op when eviction is enabled (that mode already
serializes get/put under a file lock) and fails soft if jax internals
move (the cache then just keeps jax's stock behavior).
"""

from __future__ import annotations

import os
import tempfile

_PATCHED = False


def _patch_atomic_put() -> None:
    global _PATCHED
    if _PATCHED:
        return
    try:
        from jax._src import lru_cache as _lru

        stock_put = _lru.LRUCache.put

        def atomic_put(self, key: str, val: bytes) -> None:
            if not key:
                raise ValueError("key cannot be empty")
            if getattr(self, "eviction_enabled", False):
                # eviction mode holds a file lock around get/put already
                return stock_put(self, key, val)
            cache_path = self.path / f"{key}{_lru._CACHE_SUFFIX}"
            if cache_path.exists():
                return
            fd, tmp = tempfile.mkstemp(
                dir=str(self.path), prefix=".tmp-", suffix=_lru._CACHE_SUFFIX
            )
            try:
                with os.fdopen(fd, "wb") as f:
                    f.write(val)
                os.replace(tmp, str(cache_path))  # atomic: readers never see a torn entry
            except BaseException:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                raise

        _lru.LRUCache.put = atomic_put
        _PATCHED = True
    except Exception:
        pass  # unknown jax internals: keep stock behavior


def enable_compile_cache(path: str, min_compile_secs: float = 1.0) -> None:
    """Point jax's persistent compile cache at ``path`` with atomic,
    concurrent-process-safe entry writes. Safe to call more than once
    and before/after other jax.config updates."""
    import jax

    _patch_atomic_put()
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", float(min_compile_secs)
        )
    except Exception:
        pass
