"""One-command real-data parity runbook (reference protocol:
validate.py:68-125 / train.py:209-250).

The moment shanghai.h5 and a reference ``{model}_best.pth`` are
available, a single command produces the per-threshold
CSI/POD/HSS + FAR/RMSE/SSIM/LPIPS table to compare line-by-line with
the reference's own ``python -m validate`` output:

    python scripts/parity_runbook.py --model ADNMUnet \
        --pth /path/ADNMUnet_best.pth --data /path/shanghai.h5 \
        [--lpips-weights lpips_alex.npz] [--out runs]

Steps performed: (1) h5 schema validation against the layout the
reference reads (Shanghai.py:24-59: f['train']['all_len'] scalar and
f['train'][str(i)] uint8 clips of shape (25, 565, 784)); (2) torch
checkpoint conversion via scripts/convert_reference_ckpt.py; (3) test
split evaluation with the reference's metric protocol, including its
evaluate(preds, gts) argument orientation (validate.py:117); (4) a JSON
metrics dump next to the checkpoint for archival diffing.

Dry-runnable today without data:
    python scripts/parity_runbook.py --model SmaATUnet --synthetic
(fresh-init weights, synthetic radar clips — exercises every step but
the h5/pth ingestion; covered by tests/test_runbook.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def validate_h5_schema(path: str) -> dict:
    """Check the file matches the layout the reference's Shanghai.py
    reads. Returns a summary dict; raises with a precise message if not."""
    import h5py

    info = {}
    with h5py.File(path, "r") as f:
        if "train" not in f:
            raise SystemExit(f"{path}: missing top-level group 'train' (Shanghai.py:35)")
        g = f["train"]
        if "all_len" not in g:
            raise SystemExit(f"{path}: missing 'train/all_len' (Shanghai.py:36)")
        total = int(g["all_len"][()])
        info["all_len"] = total
        missing = [str(i) for i in (0, total - 1) if str(i) not in g]
        if missing:
            raise SystemExit(f"{path}: missing clip datasets {missing} under 'train'")
        clip = g["0"]
        info["clip_shape"] = tuple(clip.shape)
        info["clip_dtype"] = str(clip.dtype)
        if len(clip.shape) != 3 or clip.shape[0] != 25:
            raise SystemExit(
                f"{path}: clip '0' has shape {clip.shape}, expected (25, H, W) "
                "(25-frame clips, Shanghai.py:52-59)"
            )
    return info


def run(argv=None) -> dict:
    p = argparse.ArgumentParser("parity-runbook")
    p.add_argument("--model", default="ADNMUnet")
    p.add_argument("--pth", default=None, help="reference {model}_best.pth (omit for fresh init)")
    p.add_argument("--data", default=None, help="shanghai.h5 (omit with --synthetic)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--out", default="runs")
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--lpips-weights", default=None)
    args = p.parse_args(argv)

    if not args.synthetic and not args.data:
        raise SystemExit("need --data shanghai.h5 (or --synthetic for a dry run)")
    if args.lpips_weights:
        os.environ["ADNM_LPIPS_WEIGHTS"] = args.lpips_weights

    # 1. schema validation
    if args.data:
        info = validate_h5_schema(args.data)
        print(f"[runbook] h5 schema OK: {info}")

    # 2. checkpoint conversion
    if args.pth:
        import convert_reference_ckpt

        convert_reference_ckpt.main([
            "--model", args.model, "--pth", args.pth, "--out", args.out,
            "--img-size", str(args.img_size),
        ])
        print(f"[runbook] converted {args.pth}")

    # 3. validation with the reference protocol
    from adnm_tpu.cli.common import add_common_args, build
    from adnm_tpu.metrics import SimplifiedEvaluator
    from adnm_tpu.train.checkpoint import best_ckpt_dir

    vp = argparse.ArgumentParser()
    add_common_args(vp)
    vargs = vp.parse_args(
        ["--model", args.model, "--root", args.out,
         "--img-size", str(args.img_size), "--batch-size", str(args.batch_size)]
        + (["--synthetic"] if args.synthetic else ["--data-path", args.data])
    )
    trainer, (_, _, test_loader), (_, to, _, thresholds) = build(vargs)
    ckpt = best_ckpt_dir(args.out, "Shanghai", args.model)
    if os.path.exists(ckpt):
        trainer.load(ckpt)
        print(f"[runbook] loaded {ckpt}")
    else:
        print("[runbook] no checkpoint — evaluating fresh init (dry run)")
    test_loss, preds, gts = trainer.eval_epoch(test_loader, collect=True)

    evaluator = SimplifiedEvaluator(seq_len=to, value_scale=90, thresholds=list(thresholds))
    evaluator.evaluate(preds, gts)  # reference orientation (validate.py:117)
    results = evaluator.done()

    # 4. table + archival JSON
    table = {"model": args.model, "test_loss": float(test_loss),
             "thresholds": {}, "overall": {}}
    print(f"\n[runbook] {args.model} — reference-protocol metrics")
    for thresh, m in results["threshold_metrics"].items():
        print(f"  {thresh}mm  CSI {m['CSI']:.4f}  POD {m['POD']:.4f}  HSS {m['HSS']:.4f}")
        table["thresholds"][str(thresh)] = {k: float(m[k]) for k in ("CSI", "POD", "HSS")}
    for k in ("FAR", "RMSE", "SSIM", "LPIPS"):
        print(f"  {k}: {results[k]:.4f}")
        table["overall"][k] = float(results[k])
    out_json = os.path.join(args.out, f"{args.model}_parity_metrics.json")
    os.makedirs(args.out, exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(table, f, indent=2)
    print(f"[runbook] wrote {out_json}")
    print("[runbook] compare against the reference: edit its validate.py "
          "model_name and run `python -m validate` on the same shanghai.h5.")
    return table


if __name__ == "__main__":
    run()
