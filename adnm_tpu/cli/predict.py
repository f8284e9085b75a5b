"""Inference entry point: on-device nowcast from a saved checkpoint.

Serving-path addition beyond the reference (which only has the
validate/visualize drivers): reads input frames from .npy
((T_in, H, W) or (B, T_in, 1, H, W)), runs the jitted forward, writes
predictions to .npy and optionally renders PNG strips.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from adnm_tpu.cli.common import add_common_args, build
from adnm_tpu.train.checkpoint import best_ckpt_dir


def main(argv=None):
    p = argparse.ArgumentParser("adnm-predict")
    add_common_args(p)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--input", required=True, help=".npy input frames")
    p.add_argument("--output", default="prediction.npy")
    p.add_argument("--png", default=None, help="optional dir for rendered strips")
    p.add_argument("--horizon", type=int, default=None,
                   help="chained rollout: keep feeding the last T_in predicted "
                        "frames back until >= horizon frames are produced "
                        "(extends beyond the model's native T_out)")
    args = p.parse_args(argv)

    trainer, _, (ti, to, _, _) = build(args, need_loaders=False)
    ckpt_path = args.ckpt or best_ckpt_dir(args.root, args.dataset, args.model)
    if os.path.exists(ckpt_path):
        trainer.load(ckpt_path)
        print(f"loaded checkpoint: {ckpt_path}")
    else:
        print(f"warning: no checkpoint at {ckpt_path}; predicting with fresh init")

    x = np.load(args.input).astype(np.float32)
    if x.ndim == 3:
        x = x[None, :, None]
    assert x.ndim == 5 and x.shape[1] == ti, f"expected (B,{ti},1,H,W), got {x.shape}"

    def forward(inp):
        # pad a target block so eval_step's slicing works uniformly
        batch = np.concatenate([inp, np.zeros((inp.shape[0], to) + inp.shape[2:], np.float32)], axis=1)
        _, out = trainer.predict(batch)
        return np.asarray(out)

    preds = forward(x)
    if args.horizon and args.horizon > to:
        chunks = [preds]
        total = preds.shape[1]
        cur = preds
        while total < args.horizon:
            inp = np.clip(cur[:, -ti:], 0.0, 1.0)
            cur = forward(inp)
            chunks.append(cur)
            total += cur.shape[1]
        preds = np.concatenate(chunks, axis=1)[:, : args.horizon]
    np.save(args.output, preds)
    print(f"wrote {args.output} {preds.shape}")
    if args.png:
        from adnm_tpu.viz import vis_res

        for b in range(preds.shape[0]):
            vis_res(preds[b, :, 0], input_seq=x[b, :, 0],
                    save_path=os.path.join(args.png, f"sample{b}"), pic_name="pred")
        print(f"rendered strips under {args.png}")


if __name__ == "__main__":
    main()
