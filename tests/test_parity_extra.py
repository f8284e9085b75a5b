"""Extra parity evidence: the Haar block-arithmetic transform equals the
reference's grouped-conv formulation, and evaluator quantization matches
numpy uint16 truncation at bin boundaries."""

import numpy as np
import pytest

import jax.numpy as jnp

from adnm_tpu.core.wavelet import haar_dwt, haar_idwt


class TestHaarVsConvFormulation:
    """The reference computes the DWT as a grouped stride-2 conv with a
    db1 filter bank (WTConv2d.py:31-51); our reshape arithmetic must be
    the same linear map."""

    def _filters(self):
        s = 1.0 / np.sqrt(2.0)
        lo = np.array([s, s], np.float32)       # dec_lo reversed
        hi = np.array([s, -s], np.float32)      # dec_hi reversed
        # filter[k][i, j]: rows = H taps, cols = W taps
        return np.stack([
            np.outer(lo, lo),
            np.outer(hi, lo),  # high along H
            np.outer(lo, hi),  # high along W
            np.outer(hi, hi),
        ])

    def test_dwt_matches_grouped_conv(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
        ours = np.asarray(haar_dwt(jnp.asarray(x)))  # (B, 4, 4, C, 4)
        f = self._filters()  # (4, 2, 2)
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
        w = torch.from_numpy(np.tile(f[:, None], (3, 1, 1, 1)))  # (12, 1, 2, 2)
        y = torch.nn.functional.conv2d(xt, w, stride=2, groups=3)  # (B, 12, 4, 4)
        y = y.reshape(2, 3, 4, 4, 4).permute(0, 3, 4, 1, 2).numpy()  # (B, h, w, C, 4)
        np.testing.assert_allclose(ours, y, atol=1e-6)

    def test_idwt_matches_conv_transpose(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        sub = rng.normal(size=(1, 4, 4, 2, 4)).astype(np.float32)
        ours = np.asarray(haar_idwt(jnp.asarray(sub)))  # (1, 8, 8, 2)
        # rec filters: pywt rec_lo/hi reversed then flipped == dec filters
        f = self._filters()
        st = torch.from_numpy(np.ascontiguousarray(sub.transpose(0, 3, 4, 1, 2))).reshape(1, 8, 4, 4)
        w = torch.from_numpy(np.tile(f[:, None], (2, 1, 1, 1)))
        y = torch.nn.functional.conv_transpose2d(st, w.reshape(8, 1, 2, 2), stride=2, groups=2)
        np.testing.assert_allclose(ours, y.permute(0, 2, 3, 1).numpy(), atol=1e-6)


class TestFloat2IntBoundary:
    def test_matches_numpy_uint16_truncation(self):
        from adnm_tpu.metrics.evaluator import _batch_stats

        # grid including the exact k/90 bin edges in float32
        ks = np.arange(0, 91)
        vals = np.concatenate([
            (ks / 90.0).astype(np.float32),
            (ks / 90.0).astype(np.float32) - 1e-7,
            (ks / 90.0).astype(np.float32) + 1e-7,
        ])
        vals = np.clip(vals, 0, 1).astype(np.float32)
        side = int(np.ceil(np.sqrt(len(vals))))
        img = np.zeros((side * side,), np.float32)
        img[: len(vals)] = vals
        img = img.reshape(1, 1, side, side)
        counts, *_ = _batch_stats(jnp.asarray(img), jnp.asarray(img), (20, 30, 35, 40), 90.0)
        counts = np.asarray(counts)
        # oracle: numpy uint16 truncation as the reference does
        pi = (np.clip(img, 0, 1) * 90).astype(np.uint16)
        for k, thr in enumerate((20, 30, 35, 40)):
            tp = int(np.sum(pi >= thr))
            assert counts[k, 0, 0, 0] == tp, (thr, counts[k, 0, 0, 0], tp)
