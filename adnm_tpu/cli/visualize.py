"""Visualization entry point (reference: pic_results.py driver loop
:236-275): load best checkpoint, run the test split, render pred/gt/input
strips per sample."""

from __future__ import annotations

import argparse
import os

import numpy as np

from adnm_tpu.cli.common import add_common_args, build
from adnm_tpu.train.checkpoint import best_ckpt_dir
from adnm_tpu.viz import vis_res


def main(argv=None):
    p = argparse.ArgumentParser("adnm-visualize")
    add_common_args(p)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--out", default=None, help="output dir (default {root}/result_pics2/{dataset})")
    p.add_argument("--max-samples", type=int, default=8)
    args = p.parse_args(argv)

    trainer, (_, _, test_loader), (ti, to, _, _) = build(args)
    ckpt_path = args.ckpt or best_ckpt_dir(args.root, args.dataset, args.model)
    if os.path.exists(ckpt_path):
        trainer.load(ckpt_path)
        print(f"loaded checkpoint: {ckpt_path}")
    out_root = args.out or os.path.join(args.root, "result_pics2", args.dataset)
    even = args.dataset == "Shanghai"  # 20-frame outputs get even-index subsample

    count = 0
    for batch in test_loader:
        _, preds = trainer.predict(batch)
        preds = np.asarray(preds)
        for b in range(preds.shape[0]):
            if count >= args.max_samples:
                return
            sample_dir = os.path.join(out_root, args.model, f"sample{count}")
            vis_res(
                preds[b, :, 0],
                gt_seq=batch[b, ti:, 0],
                input_seq=batch[b, :ti, 0],
                save_path=sample_dir,
                pic_name=args.model,
                even_index_only=even,
            )
            count += 1
            print(f"wrote {sample_dir}")


if __name__ == "__main__":
    main()
