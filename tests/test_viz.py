"""Colormap + renderer tests (reference: pic_results.py / Shanghai.py)."""

import os

import numpy as np
import pytest

from adnm_tpu.viz import BOUNDS, COLOR_MAP, gray2color, vis_res, vis_res_1b1


class TestColormap:
    def test_matches_matplotlib_boundarynorm(self):
        mpl = pytest.importorskip("matplotlib")
        from matplotlib import colors

        img = np.random.default_rng(0).integers(0, 90, (32, 32)).astype(np.uint8)
        ours = gray2color(img)
        cmap = colors.ListedColormap(COLOR_MAP)
        norm = colors.BoundaryNorm(BOUNDS, cmap.N)
        expect = cmap(norm(img))
        np.testing.assert_allclose(ours, expect, atol=1e-6)

    def test_shape(self):
        img = np.zeros((8, 8), np.uint8)
        assert gray2color(img).shape == (8, 8, 4)


class TestRender:
    def test_vis_res_writes_strips(self, tmp_path):
        rng = np.random.default_rng(1)
        pred = rng.uniform(0, 1, (20, 16, 16))
        gt = rng.uniform(0, 1, (20, 16, 16))
        inp = rng.uniform(0, 1, (5, 16, 16))
        vis_res(pred, gt_seq=gt, input_seq=inp, save_path=str(tmp_path),
                pic_name="pred", even_index_only=True)
        for name in ("pred.png", "gt.png", "input.png"):
            assert (tmp_path / name).exists()
        from PIL import Image

        img = Image.open(tmp_path / "pred.png")
        # 10 frames (even-index of 20) of 16px + 9 gaps of 10px
        assert img.size == (10 * 16 + 9 * 10, 16)

    def test_vis_res_1b1(self, tmp_path):
        pred = np.random.default_rng(2).uniform(0, 1, (3, 8, 8))
        vis_res_1b1(pred, save_path=str(tmp_path))
        assert len(list(tmp_path.glob("gt*.png"))) == 3
