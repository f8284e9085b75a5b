"""Train entry point (reference: train.py; `python -m adnm_tpu.cli.train`).

Ends with the reference's final protocol: reload best checkpoint, run the
test split, and print per-threshold CSI/HSS plus FAR/RMSE/SSIM/LPIPS
(train.py:209-250).
"""

from __future__ import annotations

import argparse
import os

from adnm_tpu.cli.common import add_common_args, build
from adnm_tpu.metrics import SimplifiedEvaluator
from adnm_tpu.train.checkpoint import best_ckpt_dir


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("adnm-train")
    add_common_args(p)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--no-final-eval", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="restore the full train state (params+opt+step) from the best checkpoint before training")
    p.add_argument("--save-every", type=int, default=None,
                   help="also write rotating epoch snapshots every N epochs")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture an XLA profiler trace of the training run "
                        "into DIR (view with TensorBoard/Perfetto; "
                        "utils.profiling.profile_trace)")
    p.add_argument("--scan-steps", type=int, default=1, metavar="K",
                   help="run K train steps per device dispatch (one jitted "
                        "lax.scan over K stacked batches): same step math/"
                        "order (matches to float rounding), but per-step "
                        "host dispatch stops gating the device — throughput "
                        "win when the host is slow relative to the step "
                        "(single-host only)")
    p.add_argument("--accum-steps", type=int, default=1, metavar="M",
                   help="gradient accumulation: split each batch into M "
                        "equal microbatches scanned inside the step, one "
                        "optimizer update on the averaged grads — ~M-fold "
                        "lower activation memory for the same effective "
                        "batch (exact for the reference losses; BatchNorm "
                        "stats become per-microbatch). batch-size %% M == 0")
    return p


def main(argv=None):
    args = make_parser().parse_args(argv)

    try:
        _main(args)
    finally:
        from adnm_tpu.parallel.multihost import finish_multihost

        finish_multihost()


def _main(args):
    trainer, (train_loader, val_loader, test_loader), (ti, to, _, thresholds) = build(args)
    ckpt_path = best_ckpt_dir(args.root, args.dataset, args.model)
    if args.resume and os.path.exists(ckpt_path):
        trainer.load(ckpt_path)
        print(f"resumed from {ckpt_path} (step {int(trainer.state.step)})")
    print(f"model {args.model}  params "
          f"{sum(x.size for x in __import__('jax').tree.leaves(trainer.state.params)):,}")
    metrics_path = os.path.join(args.root, "results", args.dataset, f"{args.model}_train.jsonl")
    import contextlib

    from adnm_tpu.utils.profiling import profile_trace

    prof = profile_trace(args.profile) if args.profile else contextlib.nullcontext()
    with prof:
        trainer.fit(train_loader, val_loader, test_loader, epochs=args.epochs,
                    ckpt_path=ckpt_path, metrics_path=metrics_path, save_every=args.save_every)
    if args.profile:
        print(f"profiler trace written to {args.profile}")

    if args.no_final_eval:
        return
    print("-----------------test best-----------------")
    if os.path.exists(ckpt_path):
        trainer.load(ckpt_path)
    # prediction collection is a single-host workflow (outputs are not
    # addressable across hosts): multi-host runs report the loss and
    # defer metrics to the single-host validate path
    collect = not trainer._multiprocess
    test_loss, preds, gts = trainer.eval_epoch(test_loader, collect=collect)
    print(f"best-checkpoint test loss: {test_loss}")
    if not collect:
        print("multi-host run: metrics need prediction collection — run "
              "`python -m adnm_tpu.cli.validate` as a single host against "
              f"{ckpt_path}")
        return
    if args.dataset == "LAPS":
        from adnm_tpu.data.laps import laps_evaluate

        laps_evaluate(preds, gts, thresholds)  # reference orientation (train.py:235)
        return
    evaluator = SimplifiedEvaluator(seq_len=to, value_scale=90, thresholds=list(thresholds))
    evaluator.evaluate(preds, gts)  # reference orientation (train.py:241)
    results = evaluator.done()
    for thresh, m in results["threshold_metrics"].items():
        print(f"{thresh}mm CSI: {m['CSI']:.4f} HSS: {m['HSS']:.4f}")
    print("\nOverall Metrics:")
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
