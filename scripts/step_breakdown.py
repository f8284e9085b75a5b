"""Component-level wall-time breakdown of the flagship ADNM-UNet step.

Times each architectural piece at its real shapes (default batch 4,
256x256 -> L = 65,536 refiner tokens) with the SAME forced-materialization
protocol as bench.py (r4): every timed trial ends with a host fetch of a
scalar derived from the outputs — dispatch-only readings are impossible.
Use to locate where the real step time goes before optimizing (the r1-r3
"latency-bound" readings were dispatch artifacts; see bench.py docstring).

Usage:
    python scripts/step_breakdown.py                 # all pieces, B=4
    python scripts/step_breakdown.py --only refiner  # substring filter
    python scripts/step_breakdown.py --batch 14 --grad
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

import numpy as np

# Runnable as `python scripts/step_breakdown.py` from the repo root:
# sys.path[0] is scripts/, so the adnm_tpu package needs the parent dir.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch_scalar(tree):
    """Reduce an output pytree to ONE device scalar (cheap; keeps the
    timed fetch at ~bytes instead of tensors)."""
    import jax
    import jax.numpy as jnp

    leaves = [jnp.sum(x) for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    return jnp.sum(jnp.stack([l.astype(jnp.float32) for l in leaves]))


def timeit(name, fn, *args, n=4, trials=2):
    """jit(fn), warm up with a value fetch, then best-of-trials of n
    calls each; every trial fetches the stacked per-call scalars."""
    import jax

    jfn = jax.jit(lambda *a: _fetch_scalar(fn(*a)))
    try:
        v = float(jfn(*args))  # compile + first run, forced
    except Exception as e:
        print(f"{name:34s} FAILED {type(e).__name__}: {e}")
        return None
    best = float("inf")
    for _ in range(trials):
        outs = []
        t0 = time.perf_counter()
        for _ in range(n):
            outs.append(jfn(*args))
        np.asarray([float(o) for o in outs])  # forces every call
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:34s} {best * 1e3:9.2f} ms   (warm first={v:.3e})")
    gc.collect()
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--only", default="")
    ap.add_argument("--grad", action="store_true",
                    help="also time fwd+bwd (grad wrt params) per piece")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    from adnm_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(".jax_cache")

    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}  batch={args.batch}")
    B = args.batch
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def want(name):
        return args.only in name

    def module_piece(name, mod, *xs, method=None):
        """Time a flax module's jitted apply (and optionally its grad)."""
        if not want(name):
            return
        init = jax.jit(lambda *a: mod.init(key, *a))
        variables = init(*xs)
        fwd = lambda v, *a: mod.apply(v, *a)
        timeit(f"{name} fwd", fwd, variables, *xs, n=args.iters)
        if args.grad:
            def loss(v, *a):
                return _fetch_scalar(mod.apply(v, *a))

            timeit(f"{name} fwd+bwd", jax.grad(loss), variables, *xs,
                   n=args.iters)
        del variables
        gc.collect()

    # ---- raw ops ------------------------------------------------------
    L, HH, P, N = 65536, 8, 4, 16
    if want("dual_op"):
        x_t = jnp.asarray(rng.standard_normal((B, HH, P, L)), jnp.bfloat16)
        dt_t = jnp.asarray(rng.uniform(0.1, 1.0, (B, HH, L)), jnp.bfloat16)
        A = -jnp.ones((HH,), jnp.bfloat16)
        B_t = jnp.asarray(rng.standard_normal((B, N, L)), jnp.bfloat16)
        C_t = jnp.asarray(rng.standard_normal((B, N, L)), jnp.bfloat16)
        D = jnp.ones((HH,), jnp.bfloat16)
        from adnm_tpu.ops.ssd import linear_attn_dual_seqminor

        timeit("dual_op(seqminor,L=65536) fwd", linear_attn_dual_seqminor,
               x_t, dt_t, A, B_t, C_t, D, n=args.iters)
        if args.grad:
            g = jax.grad(lambda *a: _fetch_scalar(
                linear_attn_dual_seqminor(*a)).astype(jnp.float32))
            timeit("dual_op(seqminor,L=65536) bwd", g,
                   x_t, dt_t, A, B_t, C_t, D, n=args.iters)
        del x_t, dt_t, B_t, C_t
        gc.collect()

    # ---- refiner pieces (d=32, L=65536) --------------------------------
    x32 = jnp.asarray(rng.standard_normal((B, 256, 256, 32)), jnp.bfloat16)

    from adnm_tpu.mixers.ssd_mixer import ADNSSDMixer

    module_piece("mixer(d=32,256^2)", ADNSSDMixer(32, headdim=4,
                                                  dtype=jnp.bfloat16), x32)

    from adnm_tpu.models.adnm_unet import Block, Refiner

    module_piece("block(d=32,256^2)",
                 Block(dim=32, out_dim=32, headdim=4, num_layers=1,
                       dtype=jnp.bfloat16), x32)

    if want("refiner_full"):
        res = jnp.asarray(rng.uniform(0, 1, (B, 256, 256)), jnp.float32)
        module_piece(
            "refiner_full(4 blocks+outproj)",
            Refiner((32, 32, 32, 32), (1, 1, 1, 1), (4, 4, 4, 4), 20,
                    (3, 2, 1), remat=False, dtype=jnp.bfloat16),
            x32, res,
        )

    # ---- conv pyramid pieces -------------------------------------------
    from adnm_tpu.core.blocks import PatchEmbed, WTConvLayer

    module_piece("wtconv(d=32,k5,lv3,256^2)",
                 WTConvLayer(32, 5, 1, 3, use_bias=False, act="gelu"), x32)

    x5 = jnp.asarray(rng.uniform(0, 1, (B, 256, 256, 5)), jnp.float32)
    module_piece("patch_embed(5->32,256^2)",
                 PatchEmbed(5, 32, kernel=5, wt_levels=3), x5)

    from adnm_tpu.models.adnm_unet import Encoder

    module_piece(
        "encoder(full)",
        Encoder((32, 64, 128, 256, 512, 1024), (1, 1, 1), 4, 5,
                (5, 5, 5), (2, 2, 2, 2, 2, 2), (3, 2, 1),
                dtype=jnp.bfloat16),
        x5,
    )

    # ---- full model / trainer -------------------------------------------
    if want("model") or want("train") or want("loss"):
        from adnm_tpu.models import create_model
        from adnm_tpu.train import Trainer, get_preset

        model = create_model("ADNMUnet", 5, 20, 6)
        preset = get_preset("ADNMUnet", 5, 20, 6, "Shanghai")
        trainer = Trainer(model, preset, 5, 20, img_size=256,
                          compute_dtype=jnp.bfloat16)
        batch = jnp.asarray(
            rng.uniform(0, 1, (B, 25, 1, 256, 256)).astype(np.float32))

        if want("loss"):
            out = jnp.asarray(rng.uniform(0, 1, (B, 20, 1, 256, 256)),
                              jnp.float32)
            tgt = batch[:, 5:]
            timeit("loss_fn(enRainfall)", preset.loss_fn, out, tgt,
                   n=args.iters)

        if want("model_fwd"):
            timeit("model_fwd(eval graph)",
                   lambda st, b: trainer._eval_step_impl(st, b),
                   trainer.state, batch, n=args.iters)

        if want("train_step"):
            lr, clip = jnp.float32(1e-3), jnp.float32(0.025)
            # chained through donated state, same as bench
            st = trainer.state
            jstep = trainer._train_step
            st, l0, _ = jstep(st, batch, lr, clip)
            float(l0)
            for trial in range(2):
                losses = []
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    st, l, _ = jstep(st, batch, lr, clip)
                    losses.append(l[None] if l.ndim == 0 else l)
                np.asarray(jnp.concatenate(losses))
                dt = (time.perf_counter() - t0) / args.iters
                print(f"{'train_step(full)':34s} {dt * 1e3:9.2f} ms   (trial {trial})")
        del trainer
        gc.collect()


if __name__ == "__main__":
    main()
