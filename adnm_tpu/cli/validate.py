"""Validate entry point (reference: validate.py; loads the best
checkpoint and prints CSI/HSS per threshold + FAR/RMSE/SSIM/LPIPS)."""

from __future__ import annotations

import argparse
import os

from adnm_tpu.cli.common import add_common_args, build
from adnm_tpu.metrics import SimplifiedEvaluator
from adnm_tpu.train.checkpoint import best_ckpt_dir


def main(argv=None):
    p = argparse.ArgumentParser("adnm-validate")
    add_common_args(p)
    p.add_argument("--ckpt", default=None, help="override checkpoint dir")
    args = p.parse_args(argv)

    trainer, (_, _, test_loader), (ti, to, _, thresholds) = build(args)
    ckpt_path = args.ckpt or best_ckpt_dir(args.root, args.dataset, args.model)
    if os.path.exists(ckpt_path):
        trainer.load(ckpt_path)
        print(f"loaded checkpoint: {ckpt_path}")
    else:
        print(f"checkpoint not found ({ckpt_path}); evaluating fresh init")
    test_loss, preds, gts = trainer.eval_epoch(test_loader, collect=True)
    evaluator = SimplifiedEvaluator(seq_len=to, value_scale=90, thresholds=list(thresholds))
    evaluator.evaluate(preds, gts)  # reference orientation (validate.py:117)
    results = evaluator.done()
    for thresh, m in results["threshold_metrics"].items():
        print(f"{thresh}mm CSI: {m['CSI']:.4f} POD: {m['POD']:.4f} HSS: {m['HSS']:.4f}")
    print(f"FAR:  {results['FAR']:.4f}")
    print(f"RMSE: {results['RMSE']:.2f}")
    print(f"SSIM: {results['SSIM']:.4f}")
    if results["LPIPS_available"]:
        print(f"LPIPS: {results['LPIPS']:.4f}")
    else:
        print("LPIPS: UNAVAILABLE (no pretrained weights in this "
              "environment — export with scripts/export_lpips.py and set "
              "ADNM_LPIPS_WEIGHTS; column must NOT be compared)")


if __name__ == "__main__":
    main()
