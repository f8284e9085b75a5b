"""Evaluator parity tests vs independent numpy/cv2 oracles
(protocol from reference datasets/Shanghai_metrics.py)."""

import numpy as np
import pytest

from adnm_tpu.metrics import SimplifiedEvaluator, cv2_parity_ssim


def _np_ssim_cv2(pred, true, value_scale=90.0):
    cv2 = pytest.importorskip("cv2")
    c1 = (0.01 * value_scale) ** 2
    c2 = (0.03 * value_scale) ** 2
    img1 = pred.astype(np.float64)
    img2 = true.astype(np.float64)
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())
    mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = cv2.filter2D(img1**2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2**2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1_mu2
    m = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return m.mean()


class TestSSIM:
    def test_cv2_parity(self):
        rng = np.random.default_rng(0)
        a = rng.uniform(0, 90, (48, 48)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 5, a.shape), 0, 90).astype(np.float32)
        ours = float(cv2_parity_ssim(a[None], b[None])[0])
        oracle = _np_ssim_cv2(a, b)
        np.testing.assert_allclose(ours, oracle, atol=2e-4)

    def test_identical_images(self):
        a = np.random.default_rng(1).uniform(0, 90, (32, 32)).astype(np.float32)
        assert float(cv2_parity_ssim(a[None], a[None])[0]) == pytest.approx(1.0, abs=1e-5)


class TestEvaluator:
    def _oracle_counts(self, gt, pred, thr, scale=90):
        gt_i = (np.clip(gt, 0, 1) * scale).astype(np.uint16)
        pr_i = (np.clip(pred, 0, 1) * scale).astype(np.uint16)
        obs = (gt_i >= thr).astype(int)
        sim = (pr_i >= thr).astype(int)
        TP = np.sum((obs == 1) & (sim == 1))
        FN = np.sum((obs == 1) & (sim == 0))
        FP = np.sum((obs == 0) & (sim == 1))
        TN = np.sum((obs == 0) & (sim == 0))
        return TP, FN, FP, TN

    def test_counts_and_csi(self):
        rng = np.random.default_rng(2)
        gt = rng.uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
        pred = np.clip(gt + rng.normal(0, 0.2, gt.shape), 0, 1).astype(np.float32)
        ev = SimplifiedEvaluator(seq_len=3, value_scale=90, thresholds=[20, 30, 35, 40], lpips_fn=False)
        ev.lpips_fn = None
        ev.evaluate(gt, pred)
        res = ev.done()
        for thr in (20, 30, 35, 40):
            TPs = FNs = FPs = TNs = 0
            for b in range(2):
                for t in range(3):
                    TP, FN, FP, TN = self._oracle_counts(gt[b, t], pred[b, t], thr)
                    TPs += TP; FNs += FN; FPs += FP; TNs += TN
            m = res["threshold_metrics"][thr]
            assert m["TP"] == TPs and m["FN"] == FNs and m["FP"] == FPs and m["TN"] == TNs
            csi = TPs / (TPs + FPs + FNs)
            np.testing.assert_allclose(m["CSI"], csi, rtol=1e-9)
            hss = (2 * (TPs * TNs - FPs * FNs)) / (
                FPs**2 + FNs**2 + 2 * TPs * TNs + (FPs + FNs) * (TPs + TNs)
            )
            np.testing.assert_allclose(m["HSS"], hss, rtol=1e-9)

    def test_rmse_aggregation(self):
        # RMSE = mean over frames of sqrt(mean over sequences of mse)
        rng = np.random.default_rng(3)
        gt = rng.uniform(0, 1, (4, 2, 16, 16)).astype(np.float32)
        pred = rng.uniform(0, 1, gt.shape).astype(np.float32)
        ev = SimplifiedEvaluator(seq_len=2, value_scale=90, lpips_fn=False)
        ev.lpips_fn = None
        ev.evaluate(gt, pred)
        res = ev.done()
        mse = ((np.clip(pred, 0, 1) * 90 - np.clip(gt, 0, 1) * 90) ** 2).mean(axis=(2, 3))
        expect = np.mean(np.sqrt(np.mean(mse, axis=0)))
        np.testing.assert_allclose(res["RMSE"], expect, rtol=1e-4)

    def test_streaming_two_batches_equals_one(self):
        rng = np.random.default_rng(4)
        gt = rng.uniform(0, 1, (4, 2, 16, 16)).astype(np.float32)
        pred = rng.uniform(0, 1, gt.shape).astype(np.float32)
        ev1 = SimplifiedEvaluator(2, 90, lpips_fn=False); ev1.lpips_fn = None
        ev1.evaluate(gt, pred)
        r1 = ev1.done()
        ev2 = SimplifiedEvaluator(2, 90, lpips_fn=False); ev2.lpips_fn = None
        ev2.evaluate(gt[:2], pred[:2])
        ev2.evaluate(gt[2:], pred[2:])
        r2 = ev2.done()
        np.testing.assert_allclose(r1["RMSE"], r2["RMSE"], rtol=1e-6)
        for thr in (20, 30, 35, 40):
            assert r1["threshold_metrics"][thr]["TP"] == r2["threshold_metrics"][thr]["TP"]

    def test_reset(self):
        ev = SimplifiedEvaluator(2, 90, lpips_fn=False); ev.lpips_fn = None
        rng = np.random.default_rng(5)
        ev.evaluate(rng.uniform(0, 1, (1, 2, 16, 16)), rng.uniform(0, 1, (1, 2, 16, 16)))
        ev.reset()
        assert ev.total == 0 and ev.losses["mse"] == []


class TestData:
    def test_synthetic_dataset_shapes(self):
        from adnm_tpu.data import ShanghaiDataset, BatchLoader

        ds = ShanghaiDataset(None, img_size=64, split="train", synthetic_len=16)
        clip = ds[0]
        assert clip.shape == (25, 64, 64)
        assert clip.dtype == np.float32
        assert 0 <= clip.min() and clip.max() <= 1
        dl = BatchLoader(ds, batch_size=2, shuffle=True)
        b = next(iter(dl))
        assert b.shape == (2, 25, 1, 64, 64)

    def test_split_disjoint_and_sized(self):
        from adnm_tpu.data import make_datasets

        tr, va, te = make_datasets(None, img_size=32, synthetic_len=40)
        assert len(tr) == 28 and len(va) == 6 and len(te) == 6
