"""LAPS dataset + evaluator.

The reference imports ``datasets/LAPS.py`` and ``datasets/LAPS_metrics.py``
(train.py:42-43, validate.py:42-43) but neither file exists in the repo —
the LAPS branch is dead there (SURVEY section 5). This module restores a
working LAPS path with the interface the reference drivers expect:

  * task shape 5 input -> 3 output frames at 60-min intervals
    (train.py:48-50), rain-rate thresholds (0.1, 0.3, 0.5, 0.7, 0.8);
  * a clip dataset mirroring the Shanghai HDF5 layout with 8-frame
    clips (synthetic fallback when no h5 is given);
  * ``laps_evaluate(preds, gts, thresholds)`` — the function-call
    convention used at train.py:235 on flattened arrays, returning and
    printing per-threshold CSI/POD/HSS/FAR.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from adnm_tpu.data.shanghai import ShanghaiDataset

LAPS_THRESHOLDS = (0.1, 0.3, 0.5, 0.7, 0.8)


class LAPSDataset(ShanghaiDataset):
    """8-frame (5 in + 3 out) clips, Shanghai-style storage."""

    def __init__(self, data_path: Optional[str], img_size: int = 256, split: str = "train",
                 cache: bool = True, synthetic_len: int = 64):
        super().__init__(data_path, img_size, split, cache=cache,
                         synthetic_len=synthetic_len, seq_len=8)


def make_laps_datasets(data_path: Optional[str], img_size: int = 256, synthetic_len: int = 64,
                       cache: bool = True):
    return tuple(
        LAPSDataset(data_path, img_size, s, cache=cache, synthetic_len=synthetic_len)
        for s in ("train", "val", "test")
    )


def laps_evaluate(preds: np.ndarray, gts: np.ndarray,
                  thresholds: Sequence[float] = LAPS_THRESHOLDS, verbose: bool = True) -> dict:
    """Flat-array threshold metrics (the reference calls
    ``SimplifiedEvaluator(preds, gts, thresholds)`` as a function,
    train.py:233-235). Orientation mirrors the Shanghai quirk: ``preds``
    lands in the observation slot."""
    obs = np.asarray(preds).reshape(-1)
    sim = np.asarray(gts).reshape(-1)
    out = {}
    with np.errstate(divide="ignore", invalid="ignore"):
        for thr in thresholds:
            o = obs >= thr
            s = sim >= thr
            TP = int(np.sum(o & s))
            FN = int(np.sum(o & ~s))
            FP = int(np.sum(~o & s))
            TN = int(np.sum(~o & ~s))
            CSI = TP / (TP + FP + FN) if TP + FP + FN else float("nan")
            POD = TP / (TP + FN) if TP + FN else float("nan")
            FAR = FP / (TP + FP) if TP + FP else float("nan")
            HSS = (2 * (TP * TN - FP * FN)) / (
                FP**2 + FN**2 + 2 * TP * TN + (FP + FN) * (TP + TN)
            ) if (TP + TN + FP + FN) else float("nan")
            out[thr] = {"TP": TP, "FN": FN, "FP": FP, "TN": TN,
                        "CSI": CSI, "POD": POD, "FAR": FAR, "HSS": HSS}
            if verbose:
                print(f"{thr}mm CSI: {CSI:.4f} POD: {POD:.4f} HSS: {HSS:.4f} FAR: {FAR:.4f}")
    return out
