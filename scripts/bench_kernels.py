"""Hot-kernel benchmarks on the real TPU chip (regression tracking).

Measures the shipped XLA implementations at the flagship's hot shapes
(refiner: B=4, L=256*256=65,536 tokens, per-path H=8 heads, P=4, N=16;
reference: models/ADNMUNet.py:639-717, ADNssd.py:414-440):

  1. chunked SSD scan (ops.ssd.ssd_chunked_scan, bimamba path), forward
     and forward+backward;
  2. the (gated) RMSNorm formulations XLA fuses inside Block/mixer.

Timing methodology (r5, honest): each op is chained K times inside one
jit (lax.fori_loop) that returns a SCALAR reduced from the final carry;
a trial times several such calls and then fetches every call's scalar
to host (np.asarray) — a value fetch cannot complete before the compute
that produces it, so dispatch-only readings are impossible (the r1-r4
``block_until_ready`` readings on this tunnel-attached chip were
dispatch artifacts; see bench.py docstring). Per-op time =
trial_time / (n_calls * K); the scalar-fetch cost (~3 ms/trial) is
amortized over n_calls*K ops and charged to the measurement.

History: an earlier "earn it or cut it" A/B (2026-08-16, v5e-1, fp32)
deleted handwritten Pallas equivalents (VMEM-carry chunked scan;
row-block fused norms) based on a table measured with bare
``block_until_ready`` — timing later shown to be dispatch-bound and
invalid (bench.py r4 post-mortem). The r5 re-A/B with THIS protocol is
recorded in README's kernel table; the XLA paths remain the shipped
implementations.

Run: python scripts/bench_kernels.py [--quick]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain(fn, K):
    """Amortize the host<->device dispatch latency by chaining K
    dependent applications of ``fn`` inside one jit, returning a SCALAR
    reduced from the final carry — so a host fetch of the result forces
    the whole chain to have executed. ``fn(carry, *rest)`` must return
    an array of carry's shape."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(carry, *rest):
        out = jax.lax.fori_loop(0, K, lambda i, c: fn(c, *rest), carry)
        return jnp.sum(out.astype(jnp.float32))

    return run


def timeit_chained(fn, *args, K=50, iters=8, warmup=2, n_calls=4):
    """Best/median per-op seconds over ``iters`` trials; each trial runs
    ``n_calls`` chained-K jit calls and fetches ALL their scalars
    (np.asarray) inside the timed region — the forced-materialization
    protocol (bench.py r4 post-mortem)."""
    import numpy as np

    jfn = chain(fn, K)
    for _ in range(warmup):
        v = float(jfn(*args))  # compile + forced completion
    assert np.isfinite(v), v
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [jfn(*args) for _ in range(n_calls)]
        np.asarray([float(o) for o in outs])  # forces every call
        times.append((time.perf_counter() - t0) / (n_calls * K))
    return float(min(times)), float(sorted(times)[len(times) // 2])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="smaller L for smoke")
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from adnm_tpu.utils.cache import enable_compile_cache

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    enable_compile_cache(cache)

    from adnm_tpu.ops.ssd import linear_attn_dual, ssd_chunked_scan

    backend = jax.default_backend()
    dtype = jnp.dtype(args.dtype)
    B, L, H, P, N = 4, (4096 if args.quick else 65536), 8, 4, 16
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.standard_normal((B, L, H, P)), dtype)
    dt = jax.nn.softplus(jnp.asarray(rng.standard_normal((B, L, H)), dtype))
    A = -jnp.exp(jnp.asarray(rng.uniform(0, 1, (H,)), jnp.float32))
    Bm = jnp.asarray(rng.standard_normal((B, L, N)), dtype)
    Cm = jnp.asarray(rng.standard_normal((B, L, N)), dtype)
    D = jnp.ones((H,), jnp.float32)

    def rec(name, best, med, **kw):
        row = {"bench": name, "backend": backend, "dtype": args.dtype,
               "best_ms": round(best * 1e3, 4), "median_ms": round(med * 1e3, 4), **kw}
        print(json.dumps(row), flush=True)

    shape = dict(B=B, L=L, H=H, P=P, N=N)

    # ---- duality (default path) + chunked scan (bimamba path) --------
    rec("linear_attn_dual_fwd",
        *timeit_chained(lambda xx: linear_attn_dual(xx, dt, A, Bm, Cm, D), x), **shape)
    rec("ssd_scan_fwd",
        *timeit_chained(lambda xx: ssd_chunked_scan(xx, dt, A, Bm, Cm, D, chunk_size=256), x),
        **shape)
    g = jax.grad(lambda xx: jnp.sum(ssd_chunked_scan(xx, dt, A, Bm, Cm, D, chunk_size=256) ** 2))
    rec("ssd_scan_fwdbwd", *timeit_chained(g, x, K=25), **shape)
    g2 = jax.grad(lambda xx: jnp.sum(linear_attn_dual(xx, dt, A, Bm, Cm, D) ** 2))
    rec("linear_attn_dual_fwdbwd", *timeit_chained(g2, x, K=25), **shape)

    # ---- Pallas equivalents (the r5 honest re-A/B; VERDICT r4 item 4) --
    try:
        from adnm_tpu.ops.pallas import (
            gated_rms_norm_pallas,
            rms_norm_pallas,
            ssd_chunked_scan_pallas,
        )
        have_pallas = True
    except Exception as e:
        print(json.dumps({"bench": "pallas_import_failed", "error": str(e)[:200]}),
              flush=True)
        have_pallas = False
    if have_pallas:
        rec("ssd_scan_fwd_pallas",
            *timeit_chained(lambda xx: ssd_chunked_scan_pallas(
                xx, dt, A, Bm, Cm, D, chunk_size=256), x), **shape)
        gp = jax.grad(lambda xx: jnp.sum(ssd_chunked_scan_pallas(
            xx, dt, A, Bm, Cm, D, chunk_size=256) ** 2))
        rec("ssd_scan_fwdbwd_pallas", *timeit_chained(gp, x, K=25), **shape)

    # ---- (gated) RMSNorm at Block shapes ------------------------------
    for d in (32, 64):
        rows_x = jnp.asarray(rng.standard_normal((B, L, d)), dtype)
        rows_z = jnp.asarray(rng.standard_normal((B, L, d)), dtype)
        w = jnp.ones((d,), jnp.float32)

        def rms_xla(v, ww=w):
            vf = v.astype(jnp.float32)
            ms = jnp.mean(jnp.square(vf), axis=-1, keepdims=True)
            return (vf * jax.lax.rsqrt(ms + 1e-6) * ww).astype(v.dtype)

        def grms_xla(v, z, ww=w):
            gg = v.astype(jnp.float32) * jax.nn.silu(z.astype(jnp.float32))
            ms = jnp.mean(jnp.square(gg), axis=-1, keepdims=True)
            return (gg * jax.lax.rsqrt(ms + 1e-6) * ww).astype(v.dtype)

        rec(f"rmsnorm_d{d}", *timeit_chained(rms_xla, rows_x, K=100), rows=B * L)
        rec(f"gated_rmsnorm_d{d}",
            *timeit_chained(lambda v: grms_xla(v, rows_z), rows_x, K=100), rows=B * L)
        if have_pallas:
            rec(f"rmsnorm_d{d}_pallas",
                *timeit_chained(lambda v: rms_norm_pallas(v, w), rows_x, K=100),
                rows=B * L)
            rec(f"gated_rmsnorm_d{d}_pallas",
                *timeit_chained(lambda v: gated_rms_norm_pallas(v, rows_z, w),
                                rows_x, K=100), rows=B * L)


if __name__ == "__main__":
    main()
