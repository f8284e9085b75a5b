"""LAPS dataset/evaluator tests."""

import numpy as np

from adnm_tpu.data.laps import LAPSDataset, laps_evaluate, make_laps_datasets


def test_laps_clip_shape():
    ds = LAPSDataset(None, img_size=32, split="train", synthetic_len=10)
    clip = ds[0]
    assert clip.shape == (8, 32, 32)


def test_laps_evaluate_counts():
    rng = np.random.default_rng(0)
    preds = rng.uniform(0, 1, (4, 3, 16, 16))
    gts = rng.uniform(0, 1, preds.shape)
    res = laps_evaluate(preds, gts, (0.5,), verbose=False)
    m = res[0.5]
    o = preds.reshape(-1) >= 0.5
    s = gts.reshape(-1) >= 0.5
    assert m["TP"] == int(np.sum(o & s))
    assert m["CSI"] == m["TP"] / (m["TP"] + m["FP"] + m["FN"])


def test_laps_splits():
    tr, va, te = make_laps_datasets(None, img_size=16, synthetic_len=20)
    assert len(tr) == 14 and len(va) == 3 and len(te) == 3
