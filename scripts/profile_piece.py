"""Per-fusion TPU profile of a hot piece (default: the refiner's
channel-major Block fwd+bwd at B=4, 256^2, d=32).

Captures a jax.profiler trace around a few warm executions and parses
the xplane.pb with jax.profiler.ProfileData (no tensorboard needed),
aggregating device-plane event durations by fusion name. This is the
instrument the honest-timing rounds were missing: it attributes the
measured step time to individual XLA fusions, so layout/fusion work can
be targeted instead of guessed.

Usage:
    python scripts/profile_piece.py [--piece block_cl|mixer_cl|train_step]
                                    [--batch 4] [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch_scalar(tree):
    import jax
    import jax.numpy as jnp

    leaves = [jnp.sum(x.astype(jnp.float32))
              for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    return jnp.sum(jnp.stack(leaves))


def build(piece: str, batch: int):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    if piece in ("block_cl", "block"):
        from adnm_tpu.models.adnm_unet import Block

        layout = "cl" if piece == "block_cl" else "nhwc"
        mod = Block(dim=32, out_dim=32, headdim=4, num_layers=1,
                    layout=layout, dtype=jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((batch, 256, 256, 32)), jnp.bfloat16)
        if layout == "cl":
            x = jnp.moveaxis(x, -1, 1)
        v = jax.jit(lambda a: mod.init(key, a))(x)

        def loss(a, vv):
            return _fetch_scalar(mod.apply(vv, a))

        fn = jax.jit(jax.grad(loss, argnums=(0, 1)))
        args = (x, v)
    elif piece == "mixer_cl":
        from adnm_tpu.mixers.ssd_mixer import ADNSSDMixer

        mod = ADNSSDMixer(32, headdim=4, dtype=jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((batch, 32, 256, 256)), jnp.bfloat16)
        v = jax.jit(lambda a: mod.init(key, a, cl=True))(x)

        def loss(a, vv):
            return _fetch_scalar(mod.apply(vv, a, cl=True))

        fn = jax.jit(jax.grad(loss, argnums=(0, 1)))
        args = (x, v)
    elif piece == "train_step":
        from adnm_tpu.models import create_model
        from adnm_tpu.train import Trainer, get_preset

        model = create_model("ADNMUnet", 5, 20, 6, refiner_remat=False)
        preset = get_preset("ADNMUnet", 5, 20, 6, "Shanghai")
        trainer = Trainer(model, preset, 5, 20, img_size=256,
                          compute_dtype=jnp.bfloat16)
        b = jnp.asarray(rng.uniform(0, 1, (batch, 25, 1, 256, 256)), jnp.float32)
        lr, clip = jnp.float32(1e-3), jnp.float32(0.025)

        # thread the donated state through successive calls
        holder = {"st": trainer.state}

        def fn(bb):
            holder["st"], loss, gn = trainer._train_step(
                holder["st"], bb, lr, clip)
            return loss

        args = (b,)
    else:
        raise SystemExit(f"unknown piece {piece}")
    return fn, args


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--piece", default="block_cl")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from adnm_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))

    import jax

    print(f"devices: {jax.devices()}  piece={args.piece} batch={args.batch}")
    fn, fargs = build(args.piece, args.batch)

    def run_once():
        out = fn(*fargs)
        # force completion through a value fetch
        leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
        np.asarray(jax.numpy.sum(leaves[0].astype(jax.numpy.float32)))

    run_once()  # compile + warm

    tdir = "/tmp/adnm_profile"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(args.iters):
            run_once()

    paths = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    if not paths:
        raise SystemExit("no xplane.pb produced — tracing unsupported here?")
    from jax.profiler import ProfileData

    with open(paths[0], "rb") as f:
        data = ProfileData.from_serialized_xspace(f.read())

    # aggregate device-plane event durations by name
    agg = {}
    for plane in data.planes:
        pname = plane.name
        if "TPU" not in pname and "Device" not in pname and "/device" not in pname.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                d = ev.duration_ns
                name = ev.name
                a = agg.setdefault(name, [0.0, 0])
                a[0] += d
                a[1] += 1
    if not agg:
        print("planes found:", [p.name for p in data.planes])
        raise SystemExit("no device-plane events — dumping plane names above")
    total = sum(v[0] for v in agg.values())
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print(f"total device event time: {total / 1e6 / args.iters:.2f} ms/iter "
          f"(over {args.iters} iters; nested events may double-count)")
    for name, (ns, cnt) in rows[: args.top]:
        print(f"{ns / 1e6 / args.iters:9.3f} ms  x{cnt // args.iters:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
