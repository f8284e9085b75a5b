"""utils/cache.py: atomic compile-cache writes.

jax 0.9.0's LRUCache.put writes entries non-atomically with no lock
when eviction is disabled (the default); concurrent processes sharing
.jax_cache (pytest parent + the 2 multi-host workers, or the driver
dryrun subprocess) can read a torn serialized executable and segfault
in deserialization — observed once in a full-suite run. These tests pin
the patched behavior; the cross-process race itself is exercised for
real every suite run by tests/test_multihost.py sharing the cache.
"""

import os

import pytest

from adnm_tpu.utils.cache import _patch_atomic_put, enable_compile_cache


@pytest.fixture()
def cache(tmp_path):
    lru = pytest.importorskip("jax._src.lru_cache")
    _patch_atomic_put()
    return lru.LRUCache(str(tmp_path), max_size=-1), tmp_path


class TestAtomicPut:
    def test_patch_installed(self):
        from jax._src import lru_cache

        _patch_atomic_put()
        assert lru_cache.LRUCache.put.__name__ == "atomic_put"

    def test_roundtrip_and_no_temp_residue(self, cache):
        c, path = cache
        c.put("k1", b"payload-1")
        assert c.get("k1") == b"payload-1"
        # the temp file must be renamed away, never left behind
        assert not [p for p in os.listdir(path) if p.startswith(".tmp-")]

    def test_existing_entry_not_overwritten(self, cache):
        # stock semantics: put on an existing key is a no-op
        c, _ = cache
        c.put("k", b"first")
        c.put("k", b"second")
        assert c.get("k") == b"first"

    def test_failed_write_leaves_no_partial_entry(self, cache, monkeypatch):
        c, path = cache

        def boom(fd, closefd=True, **kw):
            raise OSError("disk full")

        import adnm_tpu.utils.cache as mod

        monkeypatch.setattr(mod.os, "fdopen", boom)
        with pytest.raises(OSError):
            c.put("k", b"v")
        # neither a cache entry nor temp debris may exist: a torn entry
        # is exactly the segfault this module guards against
        assert c.get("k") is None
        assert not [p for p in os.listdir(path) if p.startswith(".tmp-")]

    def test_enable_compile_cache_sets_dir(self, tmp_path):
        import jax

        old = jax.config.jax_compilation_cache_dir
        try:
            enable_compile_cache(str(tmp_path), min_compile_secs=2.0)
            assert jax.config.jax_compilation_cache_dir == str(tmp_path)
        finally:
            enable_compile_cache(old or "")
