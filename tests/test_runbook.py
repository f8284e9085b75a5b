"""The real-data parity runbook must be runnable today: synthetic dry
run end to end, and h5 schema validation against both a conforming and
a non-conforming file."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_h5_schema_validation(tmp_path):
    h5py = pytest.importorskip("h5py")
    import parity_runbook

    good = str(tmp_path / "good.h5")
    with h5py.File(good, "w") as f:
        g = f.create_group("train")
        g["all_len"] = 3
        for i in range(3):
            g[str(i)] = np.zeros((25, 64, 80), np.uint8)
    info = parity_runbook.validate_h5_schema(good)
    assert info["all_len"] == 3 and info["clip_shape"] == (25, 64, 80)

    bad = str(tmp_path / "bad.h5")
    with h5py.File(bad, "w") as f:
        f.create_group("test")
    with pytest.raises(SystemExit, match="missing top-level group 'train'"):
        parity_runbook.validate_h5_schema(bad)


def test_runbook_synthetic_dry_run(tmp_path):
    import parity_runbook

    table = parity_runbook.run([
        "--model", "SmaATUnet", "--synthetic", "--out", str(tmp_path / "runs"),
        "--img-size", "32", "--batch-size", "2",
    ])
    assert set(table["overall"]) == {"FAR", "RMSE", "SSIM", "LPIPS"}
    assert set(table["thresholds"]) == {"20", "30", "35", "40"}
    for t, m in table["thresholds"].items():
        assert set(m) == {"CSI", "POD", "HSS"}, (t, m)
    # contingency ratios may be NaN on a fresh init (0/0 when a threshold
    # never fires — reference masks these via np.seterr, Shanghai_metrics.py:7);
    # the error metrics must be finite.
    assert np.isfinite(table["overall"]["RMSE"])
    assert np.isfinite(table["overall"]["SSIM"])
    assert os.path.exists(tmp_path / "runs" / "SmaATUnet_parity_metrics.json")
