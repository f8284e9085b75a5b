"""Convert a reference torch checkpoint ({model}_best.pth, reference
train.py:174) into an adnm_tpu orbax checkpoint loadable by the
validate/visualize/predict CLIs.

Usage:
    python scripts/convert_reference_ckpt.py --model SmaATUnet \
        --pth /path/to/SmaATUnet_best.pth --out runs  \
        [--output-frames 20] [--input-frames 5]

Writes {out}/model_params/Shanghai/{model}/{model}_best in our layout
(fresh optimizer state; params + batch stats from the torch file).
Supported: all seven models (ADNMUnet included).
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main(argv=None):
    p = argparse.ArgumentParser("convert-reference-ckpt")
    p.add_argument("--model", required=True,
                   choices=["SmaATUnet", "ConvLSTM", "TrajGRU", "LPTQPN", "TransUnet", "SwinUnet", "ADNMUnet"])
    p.add_argument("--pth", required=True)
    p.add_argument("--out", default="runs")
    p.add_argument("--dataset", default="Shanghai")
    p.add_argument("--input-frames", type=int, default=5)
    p.add_argument("--output-frames", type=int, default=20)
    p.add_argument("--img-size", type=int, default=256)
    args = p.parse_args(argv)

    import torch

    from adnm_tpu.models import create_model
    from adnm_tpu.train import Trainer, get_preset
    from adnm_tpu.train import torch_import as ti
    from adnm_tpu.train.checkpoint import best_ckpt_dir, save_state

    sd = torch.load(args.pth, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    frame_interval = 6 if args.dataset == "Shanghai" else 60
    model = create_model(args.model, args.input_frames, args.output_frames, frame_interval,
                         img_size=args.img_size)
    preset = get_preset(args.model, args.input_frames, args.output_frames, frame_interval, args.dataset)
    trainer = Trainer(model, preset, args.input_frames, args.output_frames, img_size=args.img_size)

    stats = trainer.state.batch_stats
    if args.model == "SmaATUnet":
        params, stats = ti.convert_smaat_state_dict(sd)
    elif args.model == "ConvLSTM":
        params = ti.convert_convlstm_state_dict(sd)
    elif args.model == "TrajGRU":
        params = ti.convert_trajgru_state_dict(sd)
    elif args.model == "LPTQPN":
        params = ti.convert_lptqpn_state_dict(sd)
    elif args.model == "TransUnet":
        params, stats = ti.convert_transunet_state_dict(sd)
    elif args.model == "SwinUnet":
        params = ti.convert_swinunet_state_dict(sd)
    elif args.model == "ADNMUnet":
        from adnm_tpu.train.adnm_import import convert_adnm_state_dict

        params = convert_adnm_state_dict(sd)

    # structural check: every imported leaf must match the model's tree
    import jax
    import numpy as np

    ref_leaves = jax.tree_util.tree_leaves_with_path(trainer.state.params)
    got = dict(jax.tree_util.tree_leaves_with_path(params))
    missing, mismatched = [], []
    for path, leaf in ref_leaves:
        if path not in got:
            missing.append(jax.tree_util.keystr(path))
        elif np.asarray(got[path]).shape != leaf.shape:
            mismatched.append((jax.tree_util.keystr(path), np.asarray(got[path]).shape, leaf.shape))
    if missing or mismatched:
        for m in missing[:10]:
            print("missing:", m)
        for m in mismatched[:10]:
            print("shape mismatch:", m)
        raise SystemExit(f"conversion incomplete: {len(missing)} missing, {len(mismatched)} mismatched")

    state = trainer.state.replace(params=params, batch_stats=stats)
    out_path = best_ckpt_dir(args.out, args.dataset, args.model)
    save_state(out_path, state)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
