"""Shared CLI plumbing (replaces the reference's edit-the-source
configuration, train.py:23-66, with flags)."""

from __future__ import annotations

import argparse
import math
import os

import jax

from adnm_tpu.data import BatchLoader, make_datasets
from adnm_tpu.models import MODEL_NAMES, create_model
from adnm_tpu.train import Trainer, get_preset


def add_common_args(p: argparse.ArgumentParser):
    p.add_argument("--model", default="ADNMUnet", choices=list(MODEL_NAMES))
    p.add_argument("--dataset", default="Shanghai", choices=["Shanghai", "LAPS"])
    p.add_argument("--data-path", default=os.environ.get("ADNM_DATA", "datasets/shanghai.h5"))
    p.add_argument("--synthetic", action="store_true", help="use the synthetic dataset (no h5 needed)")
    p.add_argument("--synthetic-len", type=int, default=64)
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--root", default=os.environ.get("ADNM_ROOT", "runs"),
                   help="output root for model_params/ and results/ (reference: config.py:5)")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the batch over all local devices")
    p.add_argument("--mesh", default=None, metavar="AXIS=N,...",
                   help="explicit device mesh, e.g. 'data=4,seq=2' — batch "
                        "over 'data', conv pyramid H / refiner tokens over "
                        "'seq', heads + MLP hidden channels over 'model' "
                        "(implies --data-parallel). Training meshes are "
                        "limited to 2 non-trivial axes (XLA v0.9.0 weight-"
                        "grad defect on >=3-axis meshes); 3-axis meshes incl. "
                        "'model' are for validate/visualize (inference TP)")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="multi-host training: jax.distributed coordinator "
                        "address. Run the SAME command on every host with "
                        "--num-processes/--process-id; the mesh then spans "
                        "all hosts' devices and each host streams its "
                        "batch-size rows of every global batch "
                        "(validate/visualize collection stays single-host — "
                        "see parallel/multihost.py). On TPU pods all three "
                        "flags autodetect if you pass --num-processes alone")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--zero1", action="store_true",
                   help="ZeRO-1: shard the optimizer moments over the mesh's "
                        "'data' axis instead of replicating them")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the training forward (jax.checkpoint): "
                        "activation memory ~O(1) in depth at ~60%% more step "
                        "FLOPs; numerics identical. Note: at 256^2 on 16G v5e "
                        "batch 12 already fits without it (bench headline) — "
                        "intended for larger-HBM parts/shapes. Ignored for "
                        "BatchNorm models")
    p.add_argument("--no-refiner-remat", action="store_true",
                   help="ADNMUnet only: do NOT rematerialize the refiner "
                        "blocks' forward in the backward (the 65k-token "
                        "mixers). Trades HBM for speed: measured ~14%% "
                        "faster train step at batch <= 8 at 256^2 on 16G "
                        "v5e; batch 12 needs the default (remat on) to fit")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (fp32 params/optimizer — mixed "
                        "precision; the loss is computed in fp32). This is "
                        "the benched TPU configuration — roughly halves the "
                        "step time vs fp32 compute on the MXU")
    p.add_argument("--attn-type", default="standard", choices=["standard", "mla"],
                   help="ADNMUnet only: mixer at the AttentionBlock sites — "
                        "standard softmax MHA (the reference's wired choice) "
                        "or DeepSeek-V2 MLA (present-but-unwired in the "
                        "reference, selectable here)")
    p.add_argument("--transfer-dtype", default="float32", choices=["float32", "uint8"],
                   help="batch wire format host->device. uint8 ships "
                        "round(x*255) and normalizes on device: 4x fewer "
                        "transfer bytes and a 4x smaller scan-mode batch "
                        "stack in HBM; <=1/510 per-pixel requantization vs "
                        "float32 (the h5 source is uint8 anyway)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pretrained-npz", default=None,
                   help="TransUnet only: ImageNet R50+ViT-B_16 .npz to initialize "
                        "the encoder (reference: TransUnet.py:718-765)")
    p.add_argument("--compile-cache", default=os.environ.get("ADNM_COMPILE_CACHE", ".jax_cache"),
                   help="persistent XLA compile-cache dir ('' disables). Repeat "
                        "invocations skip the multi-minute model compile "
                        "(utils/cache.py hardens writes against concurrent "
                        "processes; the stock jax cache tears)")


def task_shape(args):
    """(input_frames, output_frames, frame_interval, thresholds) per
    dataset (reference: train.py:40-66)."""
    if args.dataset == "LAPS":
        return 5, 3, 60, (0.1, 0.3, 0.5, 0.7, 0.8)
    return 5, 20, 6, (20, 30, 35, 40)


def _parse_mesh(spec: str):
    """Validate an ``AXIS=N,...`` mesh spec. The batch is sharded over
    'data' (Trainer hardcodes PartitionSpec('data')), so a 'data' axis is
    required; malformed entries fail with a readable message instead of
    an int('') traceback or a cryptic NamedSharding error downstream."""
    axes, sizes = [], []
    for part in spec.split(","):
        name, eq, n = part.partition("=")
        name = name.strip()
        if not eq or not name or not n.strip().isdecimal() or int(n) < 1:
            raise SystemExit(
                f"--mesh: malformed entry {part!r} (expected AXIS=N with "
                f"N a positive integer, e.g. 'data=4,seq=2')"
            )
        if name in axes:
            raise SystemExit(f"--mesh: duplicate axis {name!r}")
        axes.append(name)
        sizes.append(int(n))
    if "data" not in axes:
        raise SystemExit(
            "--mesh: a 'data' axis is required (the batch is sharded over "
            "'data'); add data=1 for a non-data-parallel mesh"
        )
    return axes, sizes


def build(args, need_loaders=True):
    if getattr(args, "compile_cache", None):
        from adnm_tpu.utils.cache import enable_compile_cache

        enable_compile_cache(args.compile_cache)
    input_frames, output_frames, frame_interval, thresholds = task_shape(args)
    proc_shard = None
    if getattr(args, "coordinator", None) or getattr(args, "num_processes", None):
        from adnm_tpu.parallel import init_multihost

        pi, pc = init_multihost(
            args.coordinator, args.num_processes, getattr(args, "process_id", None)
        )
        print(f"multihost: process {pi}/{pc}, {jax.device_count()} global devices")
        if pc > 1:
            proc_shard = (pi, pc)
    mesh = None
    if getattr(args, "mesh", None):
        from adnm_tpu.parallel import make_mesh

        axes, sizes = _parse_mesh(args.mesh)
        mesh = make_mesh(math.prod(sizes), axes=tuple(axes), shape=tuple(sizes))
    elif args.data_parallel:
        devs = jax.devices()
        mesh = jax.sharding.Mesh(devs, ("data",))
    if proc_shard is not None:
        from adnm_tpu.parallel.multihost import is_multiprocess_mesh

        if not is_multiprocess_mesh(mesh):
            raise SystemExit(
                "multi-host run without a mesh spanning all hosts' devices: "
                "add --data-parallel (or a --mesh covering "
                f"{jax.device_count()} global devices) — otherwise each host "
                "would silently train an independent model and race writes "
                "to the same checkpoint path"
            )
        n_data = dict(zip(mesh.axis_names, mesh.devices.shape)).get("data", 1)
        if (args.batch_size * proc_shard[1]) % n_data != 0:
            # fail in seconds, not after minutes of model init/compile
            # (Trainer._put enforces the same invariant at runtime)
            raise SystemExit(
                f"--batch-size {args.batch_size} x {proc_shard[1]} hosts = "
                f"{args.batch_size * proc_shard[1]} global rows per step, "
                f"which does not divide the mesh 'data' axis ({n_data}); "
                f"pick a divisible per-host batch size"
            )
    model_kwargs = {}
    if getattr(args, "no_refiner_remat", False):
        if args.model != "ADNMUnet":
            raise SystemExit("--no-refiner-remat is only supported for --model ADNMUnet")
        model_kwargs["refiner_remat"] = False
    if getattr(args, "attn_type", "standard") not in (None, "standard"):
        if args.model != "ADNMUnet":
            raise SystemExit("--attn-type is only supported for --model ADNMUnet")
        model_kwargs["attn_type"] = args.attn_type
    model = create_model(
        args.model, input_frames, output_frames, frame_interval,
        img_size=args.img_size, **model_kwargs,
    )
    preset = get_preset(args.model, input_frames, output_frames, frame_interval, args.dataset)
    param_transform = None
    if args.model == "ADNMUnet":
        from adnm_tpu.models.adnm_unet import apply_reference_init

        param_transform = apply_reference_init
    accum = getattr(args, "accum_steps", 1) or 1
    if args.batch_size % accum:
        raise SystemExit(
            f"--accum-steps {accum} must divide --batch-size {args.batch_size}"
        )
    trainer = Trainer(
        model, preset, input_frames, output_frames,
        img_size=args.img_size, mesh=mesh, seed=args.seed,
        param_transform=param_transform,
        shard_opt_state=getattr(args, "zero1", False),
        remat_forward=getattr(args, "remat", False),
        compute_dtype=jax.numpy.bfloat16 if getattr(args, "bf16", False) else jax.numpy.float32,
        scan_steps=getattr(args, "scan_steps", 1) or 1,
        accum_steps=accum,
    )
    if getattr(args, "pretrained_npz", None):
        if args.model != "TransUnet":
            raise SystemExit("--pretrained-npz is only supported for --model TransUnet")
        import numpy as np

        from adnm_tpu.train.npz_import import load_transunet_npz

        npz = np.load(args.pretrained_npz)
        params = load_transunet_npz(npz, jax.device_get(trainer.state.params))
        trainer.state = trainer.state.replace(params=jax.tree.map(jax.numpy.asarray, params))
        print(f"loaded pretrained encoder from {args.pretrained_npz}")
    loaders = None
    if need_loaders:
        data_path = None if args.synthetic else args.data_path
        if args.dataset == "LAPS":
            from adnm_tpu.data.laps import make_laps_datasets

            tr, va, te = make_laps_datasets(data_path, args.img_size, synthetic_len=args.synthetic_len)
        else:
            tr, va, te = make_datasets(data_path, args.img_size, synthetic_len=args.synthetic_len)
        # Multi-host: only the TRAIN stream is process-sharded — each
        # host takes its batch_size rows of every GLOBAL batch
        # (row_shard guarantees an identical step count on every host;
        # one short host deadlocks the others' collectives). Val/test
        # stay unsharded so every host computes the same full-set loss
        # (best-checkpoint gating must agree across hosts).
        tdt = getattr(args, "transfer_dtype", "float32") or "float32"
        loaders = (
            BatchLoader(tr, args.batch_size, shuffle=True, seed=args.seed,
                        row_shard=proc_shard, transfer_dtype=tdt),
            BatchLoader(va, args.batch_size, drop_last=False, transfer_dtype=tdt),
            BatchLoader(te, args.batch_size, drop_last=False, transfer_dtype=tdt),
        )
    return trainer, loaders, (input_frames, output_frames, frame_interval, thresholds)
