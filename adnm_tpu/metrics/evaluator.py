"""Streaming nowcast evaluator (reference: datasets/Shanghai_metrics.py).

Same interface and numerics as the reference's SimplifiedEvaluator
(CSI/POD/HSS/FAR per threshold + MAE/MSE/RMSE/PSNR/SSIM/LPIPS), but the
per-frame hot loop — 4 thresholds x B x T frames of HxW numpy in the
reference (Shanghai_metrics.py:68-101) — runs as ONE jitted device
computation per batch here.

Orientation quirk preserved: ``evaluate(true_batch, pred_batch)`` is
called by the reference drivers as ``evaluate(preds, gts)``
(train.py:241, validate.py:117), so POD/FAR have hit/miss roles swapped
relative to their names. Our drivers call it identically for parity.

LPIPS is optional: the reference uses the ``lpips`` pip package with
pretrained AlexNet (Shanghai_metrics.py:37-39). This environment has no
pretrained weights, so LPIPS reports NaN unless weights are provided
(see adnm_tpu.metrics.lpips_jax).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from adnm_tpu.metrics.ssim import cv2_parity_ssim


@functools.partial(jax.jit, static_argnames=("thresholds", "value_scale"))
def _batch_stats(true_b: jax.Array, pred_b: jax.Array, thresholds: tuple, value_scale: float):
    """Per-frame contingency counts + regression losses for a batch.

    true_b/pred_b: (B, T, H, W) float in [0, 1] (already clipped).
    Returns counts (n_thr, B, T, 4) int32 [TP, FN, FP, TN] with obs=true_b
    roles as in _cal_frame (Shanghai_metrics.py:105-114), and
    (B, T) mae/mse/ssim arrays in the 0..value_scale domain.
    """
    # float2int: clip -> *scale -> uint truncation (Shanghai_metrics.py:45-47)
    gt_i = jnp.floor(true_b * value_scale).astype(jnp.int32)
    pr_i = jnp.floor(pred_b * value_scale).astype(jnp.int32)
    counts = []
    for thr in thresholds:
        obs = gt_i >= thr
        sim = pr_i >= thr
        tp = jnp.sum(obs & sim, axis=(-2, -1))
        fn = jnp.sum(obs & ~sim, axis=(-2, -1))
        fp = jnp.sum(~obs & sim, axis=(-2, -1))
        tn = jnp.sum(~obs & ~sim, axis=(-2, -1))
        counts.append(jnp.stack([tp, fn, fp, tn], axis=-1))
    counts = jnp.stack(counts, axis=0).astype(jnp.int32)

    ts = true_b * value_scale
    ps = pred_b * value_scale
    mae = jnp.mean(jnp.abs(ps - ts), axis=(-2, -1))
    mse = jnp.mean(jnp.square(ps - ts), axis=(-2, -1))
    ssim = cv2_parity_ssim(ps, ts, value_scale)
    return counts, mae, mse, ssim


class SimplifiedEvaluator:
    """Drop-in equivalent of the reference evaluator
    (datasets/Shanghai_metrics.py:14-314)."""

    def __init__(
        self,
        seq_len: int,
        value_scale: float,
        thresholds: Sequence[int] = (20, 30, 35, 40),
        lpips_fn=None,
    ):
        self.seq_len = seq_len
        self.value_scale = value_scale
        self.thresholds = list(thresholds)
        if lpips_fn is None:
            try:
                from adnm_tpu.metrics.lpips_jax import default_lpips

                lpips_fn = default_lpips()
            except Exception as e:
                import warnings

                warnings.warn(
                    f"LPIPS disabled — reported as NaN ({e}). Export weights "
                    "with scripts/export_lpips.py and set ADNM_LPIPS_WEIGHTS.",
                    stacklevel=2,
                )
                lpips_fn = None
        self.lpips_fn = lpips_fn
        self.reset()

    def reset(self):
        self.metrics = {
            t: {"hits": [], "misses": [], "falsealarms": [], "correctnegs": []}
            for t in self.thresholds
        }
        self.losses = {k: [] for k in ("mse", "mae", "rmse", "psnr", "ssim", "lpips")}
        self.total = 0
        self.TP, self.TN, self.FP, self.FN = [], [], [], []

    def evaluate(self, true_batch, pred_batch):
        """true_batch/pred_batch: (B, T, H, W). NOTE the reference drivers
        pass (preds, gts) — keep that orientation for parity."""
        true_b = jnp.clip(jnp.asarray(np.asarray(true_batch), jnp.float32), 0.0, 1.0)
        pred_b = jnp.clip(jnp.asarray(np.asarray(pred_batch), jnp.float32), 0.0, 1.0)
        counts, mae, mse, ssim = _batch_stats(
            true_b, pred_b, tuple(self.thresholds), float(self.value_scale)
        )
        counts = np.asarray(counts)
        mae = np.asarray(mae)
        mse = np.asarray(mse)
        ssim = np.asarray(ssim)
        rmse = np.sqrt(mse)
        psnr = 20 * np.log10(self.value_scale / np.sqrt(mse))

        bsz = true_b.shape[0]
        for k, thr in enumerate(self.thresholds):
            self.metrics[thr]["hits"].extend(counts[k, :, :, 0].tolist())
            self.metrics[thr]["misses"].extend(counts[k, :, :, 1].tolist())
            self.metrics[thr]["falsealarms"].extend(counts[k, :, :, 2].tolist())
            self.metrics[thr]["correctnegs"].extend(counts[k, :, :, 3].tolist())
        self.losses["mae"].extend(mae.tolist())
        self.losses["mse"].extend(mse.tolist())
        self.losses["rmse"].extend(rmse.tolist())
        self.losses["psnr"].extend(psnr.tolist())
        self.losses["ssim"].extend(ssim.tolist())
        if self.lpips_fn is not None:
            lp = np.asarray(self.lpips_fn(pred_b, true_b))  # (B, T)
            self.losses["lpips"].extend(lp.tolist())
        else:
            self.losses["lpips"].extend(np.full((bsz, true_b.shape[1]), np.nan).tolist())
        self.total += bsz

    def done(self) -> dict:
        """Aggregate (reference: Shanghai_metrics.py:218-290)."""
        threshold_metrics = {}
        all_far = []
        tp_sum = tn_sum = fp_sum = fn_sum = 0
        for thr in self.thresholds:
            hits = np.nan_to_num(np.array(self.metrics[thr]["hits"], dtype=np.float64))
            misses = np.nan_to_num(np.array(self.metrics[thr]["misses"], dtype=np.float64))
            fas = np.nan_to_num(np.array(self.metrics[thr]["falsealarms"], dtype=np.float64))
            cns = np.nan_to_num(np.array(self.metrics[thr]["correctnegs"], dtype=np.float64))
            TP, TN, FP, FN = hits.sum(), cns.sum(), fas.sum(), misses.sum()
            tp_sum += TP
            tn_sum += TN
            fp_sum += FP
            fn_sum += FN
            with np.errstate(divide="ignore", invalid="ignore"):
                CSI = TP / (TP + FP + FN)
                POD = TP / (TP + FN)
                HSS = (2 * (TP * TN - FP * FN)) / (
                    FP**2 + FN**2 + 2 * TP * TN + (FP + FN) * (TP + TN)
                )
                FAR = FP / (TP + FP)
            all_far.append(FAR)
            threshold_metrics[thr] = {
                "TP": TP, "TN": TN, "FP": FP, "FN": FN,
                "CSI": CSI, "POD": POD, "HSS": HSS,
            }
        n_thr = len(self.thresholds)
        self.TP.append(tp_sum / n_thr)
        self.FP.append(fp_sum / n_thr)
        self.TN.append(tn_sum / n_thr)
        self.FN.append(fn_sum / n_thr)
        rmse = np.mean(np.sqrt(np.mean(np.array(self.losses["mse"]), axis=0)))
        ssim = np.mean(self.losses["ssim"])
        lpips_v = np.mean(self.losses["lpips"])
        return {
            "threshold_metrics": threshold_metrics,
            "FAR": np.mean(all_far),
            "RMSE": rmse,
            "SSIM": ssim,
            "LPIPS": lpips_v,
            # Loud machine-readable marker: consumers must check this
            # before publishing an LPIPS column (no weights in-env ->
            # the column is NaN, never silently comparable).
            "LPIPS_available": self.lpips_fn is not None,
        }
