"""Component-level wall-time breakdown of the flagship ADNM-UNet step.

Times each architectural piece at its real shapes (default batch 4,
256x256 -> L = 65,536 refiner tokens) with the forced-materialization
protocol (bench.py r4): every timed region ends with a host fetch of a
scalar derived from the outputs — dispatch-only readings are impossible.

r5 addition: per-call timings on this tunnel-attached chip carry a
~25 ms round-trip floor PER JIT CALL (measured: every sub-ms piece read
uniformly ~25-26 ms), so each piece is chained K times inside ONE jit
via a lax.fori_loop whose carry threads a tiny output-derived
perturbation back into the input — K dependent applications, one
round trip. Per-op time = (trial - one round trip) is not attempted;
instead K is large enough (default 16) that the floor amortizes to
~1.6 ms and the chained estimate is reported directly.

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

    leaves = [jnp.sum(x.astype(jnp.float32))
              for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    return jnp.sum(jnp.stack(leaves))


def timeit(name, fn, *args, n=16, trials=2, chain_arg=0):
    """Chain ``n`` dependent applications of ``fn`` inside one jit and
    report per-application seconds, best of ``trials`` (each trial is
    one round trip ending in a forced host fetch).

    ``chain_arg`` indexes the positional arg (an array) through which
    the loop-carried dependence is threaded: each iteration adds
    1e-20 * (previous output scalar) to it — numerically negligible,
    but it forces XLA to execute the applications sequentially instead
    of folding them into one.
    """
    import jax
    import jax.numpy as jnp

    def jfn_body(*a):
        x0 = a[chain_arg]

        def body(i, carry):
            s, x = carry
            a2 = list(a)
            a2[chain_arg] = x
            s2 = _fetch_scalar(fn(*a2))
            x2 = x + (s2 * 1e-20).astype(x.dtype)
            return s + s2, x2

        s, _ = jax.lax.fori_loop(
            0, n, body, (jnp.float32(0.0), x0))
        return s

    jfn = jax.jit(jfn_body)
    try:
        v = float(jfn(*args))  # compile + first run, forced
    except Exception as e:
        print(f"{name:34s} FAILED {type(e).__name__}: {e}")
        return None
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = float(jfn(*args))  # one round trip, n applications
        best = min(best, (time.perf_counter() - t0) / n)
        assert np.isfinite(out), (name, out)
    print(f"{name:34s} {best * 1e3:9.2f} ms   (chained x{n}, warm first={v:.3e})")
    gc.collect()
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--only", default="")
    ap.add_argument("--grad", action="store_true",
                    help="also time fwd+bwd (grad wrt params) per piece")
    ap.add_argument("--iters", type=int, default=16,
                    help="chained applications per jit call")
    args = ap.parse_args()

    from adnm_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))

    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}  batch={args.batch}")
    B = args.batch
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def want(name):
        return args.only in name

    def module_piece(name, mod, *xs, extra_xs=()):
        """Time a flax module's jitted apply (and optionally its grad),
        chained through the first input."""
        if not want(name):
            return
        init = jax.jit(lambda *a: mod.init(key, *a))
        variables = init(*xs, *extra_xs)
        fwd = lambda x, v: mod.apply(v, x, *extra_xs)
        timeit(f"{name} fwd", fwd, xs[0], variables, n=args.iters)
        if args.grad:
            def loss(x, v):
                return _fetch_scalar(mod.apply(v, x, *extra_xs))

            # grad wrt params AND input (the real backward: both
            # cotangent paths), chained through the input
            g = jax.grad(loss, argnums=(0, 1))
            timeit(f"{name} fwd+bwd", g, xs[0], variables, n=args.iters)
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

    from adnm_tpu.models.adnm_unet import Block, Decoder, Encoder, Refiner

    module_piece("block(d=32,256^2)",
                 Block(dim=32, out_dim=32, headdim=4, num_layers=1,
                       dtype=jnp.bfloat16), x32)
    # the layout the Refiner actually runs at this grid (r5):
    module_piece("block_cl(d=32,256^2)",
                 Block(dim=32, out_dim=32, headdim=4, num_layers=1,
                       layout="cl", dtype=jnp.bfloat16),
                 jnp.moveaxis(x32, -1, 1))

    if want("refiner_full"):
        res = jnp.asarray(rng.uniform(0, 1, (B, 256, 256)), jnp.float32)
        module_piece(
            "refiner_full(4 blocks+outproj)",
            Refiner((32, 32, 32, 32), (1, 1, 1, 1), (4, 4, 4, 4), 20,
                    (3, 2, 1), remat=False, dtype=jnp.bfloat16),
            x32, extra_xs=(res,),
        )

    # ---- conv pyramid pieces -------------------------------------------
    from adnm_tpu.core.blocks import EncoderToDecoder, PatchEmbed, WTConvLayer

    module_piece("wtconv(d=32,k5,lv3,256^2)",
                 WTConvLayer(32, 5, 1, 3, use_bias=False, act="gelu"), x32)

    x5 = jnp.asarray(rng.uniform(0, 1, (B, 256, 256, 5)), jnp.float32)
    module_piece("patch_embed(5->32,256^2)",
                 PatchEmbed(5, 32, kernel=5, wt_levels=3), x5)

    ed = (32, 64, 128, 256, 512, 1024)
    enc = Encoder(ed, (1, 1, 1), 4, 5, (5, 5, 5), (2, 2, 2, 2, 2, 2),
                  (3, 2, 1), dtype=jnp.bfloat16)
    module_piece("encoder(full)", enc, x5)

    if want("e2d"):
        # the largest EncoderToDecoder site: skip[4] level, 32^2 x 512
        xs_ = jnp.asarray(rng.standard_normal((B, 32, 32, 512)), jnp.bfloat16)
        module_piece("e2d(32^2,512)", EncoderToDecoder(512),
                     xs_, extra_xs=(jnp.ones((B, 1, 1, 512), jnp.bfloat16),))

    if want("decoder"):
        # decoder at real skip shapes (encoder output feeds it)
        variables = jax.jit(lambda x: enc.init(key, x))(x5)
        xe, skips, _ = jax.jit(lambda v, x: enc.apply(v, x))(variables, x5)
        dec = Decoder(ed, (1, 1, 1), 4, (32, 32, 32, 32), (5, 5, 5),
                      (2, 2, 2, 2, 2, 2), (3, 2, 1), dtype=jnp.bfloat16)
        dvars = jax.jit(lambda x, s: dec.init(key, x, s))(xe, skips)
        fwd = lambda x, v, s: dec.apply(v, x, s)
        timeit("decoder(full) fwd", fwd, xe, dvars, skips, n=args.iters)
        if args.grad:
            def dloss(x, v, s):
                return _fetch_scalar(dec.apply(v, x, s))

            timeit("decoder(full) fwd+bwd", jax.grad(dloss, argnums=(0, 1)),
                   xe, dvars, skips, n=args.iters)
        del variables, dvars, skips
        gc.collect()

    # ---- full model / trainer -------------------------------------------
    if want("model_fwd") or want("train_step") or want("loss"):
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
            timeit("loss_fn(enRainfall)", lambda o, t: preset.loss_fn(o, t),
                   out, tgt, n=args.iters)

        if want("model_fwd"):
            timeit("model_fwd(eval graph)",
                   lambda b, st: trainer._eval_step_impl(st, b)[1],
                   batch, trainer.state, n=args.iters)

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
