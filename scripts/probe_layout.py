"""Probe: does XLA:TPU lane-pad small trailing (channel) dims, taxing
every NHWC activation with C < 128?

The flagship's refiner runs 65k-token mixers at d=32 and the encoder's
first two levels at C=32/64; if (B, H, W, 32) arrays tile as (8, 128)
on the two minormost dims, every such tensor costs 4x its logical bytes
in HBM traffic. This times the same logical-byte elementwise workload
at different trailing dims with forced-materialization timing: per-
logical-byte time should be flat if layouts are tight, and scale like
128/C if the minor dim pads.

Also probes a conv-shaped workload (depthwise 3x3) at the same channel
counts, since conv layout constraints are what pin C minor.

Run: python scripts/probe_layout.py   (prints one JSON line per case)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit_chained(fn, x, K=30, iters=6, n_calls=4):
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def run(v):
        out = jax.lax.fori_loop(0, K, lambda i, c: fn(c), v)
        return jnp.sum(out.astype(jnp.float32))

    v = float(run(x))
    assert np.isfinite(v)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [run(x) for _ in range(n_calls)]
        np.asarray([float(o) for o in outs])
        best = min(best, (time.perf_counter() - t0) / (n_calls * K))
    return best


def main():
    from adnm_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    total = 4 * 256 * 256 * 128  # logical elements, constant across cases

    # elementwise chain (mul+add+silu), bf16
    for c in (8, 16, 32, 64, 128, 256):
        shape = (4, 256, 256 * 128 // c // 1, c)
        n = int(np.prod(shape))
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        t = timeit_chained(lambda v: jax.nn.silu(v * 1.01 + 0.5), x)
        by = 2 * n * 2  # read+write bf16 logical bytes
        print(json.dumps({
            "probe": "elementwise", "c": c, "shape": list(shape),
            "ms": round(t * 1e3, 4),
            "logical_gb_per_s": round(by / t / 1e9, 1),
        }), flush=True)

    # depthwise 3x3 conv (the conv layout constraint), bf16
    from adnm_tpu.core.layers import _grouped_conv_native

    for c in (32, 64, 128):
        shape = (4, 256, 256 * 128 // c, c)
        n = int(np.prod(shape))
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, 1, c)) * 0.1, jnp.bfloat16)
        t = timeit_chained(
            lambda v: _grouped_conv_native(v, w, (1, 1), ((1, 1), (1, 1)), c), x)
        by = 2 * n * 2
        print(json.dumps({
            "probe": "dwconv3x3", "c": c, "shape": list(shape),
            "ms": round(t * 1e3, 4),
            "logical_gb_per_s": round(by / t / 1e9, 1),
        }), flush=True)

    # fp32 norm-stats chain at the InstanceNorm shape
    for c in (32, 128):
        shape = (4, 256, 256 * 128 // c, c)
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

        def inorm(v):
            vf = v.astype(jnp.float32)
            mu = jnp.mean(vf, axis=(1, 2), keepdims=True)
            var = jnp.var(vf, axis=(1, 2), keepdims=True)
            return ((vf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(v.dtype)

        t = timeit_chained(inorm, x)
        n = int(np.prod(shape))
        print(json.dumps({
            "probe": "instance_norm", "c": c, "ms": round(t * 1e3, 4),
            "logical_gb_per_s": round(2 * n * 2 / t / 1e9, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
