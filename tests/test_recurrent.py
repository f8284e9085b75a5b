"""ConvLSTM / TrajGRU encoder-forecaster tests (tiny sizes for CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adnm_tpu.models.conv_lstm import create_conv_lstm
from adnm_tpu.models.traj_gru import bilinear_warp, create_traj_gru


class TestWarp:
    def test_zero_flow_identity(self):
        img = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
        out = bilinear_warp(img, jnp.zeros((2, 8, 8, 2)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    def test_integer_shift(self):
        img = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 1))
        flow = jnp.ones((1, 8, 8, 2)) * jnp.array([1.0, 0.0])  # +1 in x
        out = bilinear_warp(img, flow)
        # out[y, x] = img[y, x+1]; last column out of range -> 0
        np.testing.assert_allclose(np.asarray(out[0, :, :-1, 0]), np.asarray(img[0, :, 1:, 0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[0, :, -1, 0]), 0.0, atol=1e-6)

    def test_matches_torch_grid_sample(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(2)
        img = rng.normal(size=(1, 8, 8, 2)).astype(np.float32)
        flow = rng.uniform(-2, 2, size=(1, 8, 8, 2)).astype(np.float32)
        ours = np.asarray(bilinear_warp(jnp.asarray(img), jnp.asarray(flow)))
        it = torch.from_numpy(img).permute(0, 3, 1, 2)
        h = w = 8
        xx = torch.arange(w).view(1, -1).repeat(h, 1)
        yy = torch.arange(h).view(-1, 1).repeat(1, w)
        grid = torch.stack([xx, yy]).unsqueeze(0).float()
        vgrid = grid + torch.from_numpy(flow).permute(0, 3, 1, 2)
        vgrid[:, 0] = 2.0 * vgrid[:, 0] / (w - 1) - 1.0
        vgrid[:, 1] = 2.0 * vgrid[:, 1] / (h - 1) - 1.0
        out_t = torch.nn.functional.grid_sample(it, vgrid.permute(0, 2, 3, 1), align_corners=True)
        np.testing.assert_allclose(ours, out_t.permute(0, 2, 3, 1).numpy(), atol=1e-5)


class TestEncoderForecaster:
    def test_conv_lstm_contract(self):
        model = create_conv_lstm(4)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 5, 1, 64, 64))
        y, _ = model.init_with_output(jax.random.PRNGKey(1), x, train=False)
        assert y.shape == (2, 4, 1, 64, 64)
        assert np.isfinite(np.asarray(y)).all()

    def test_traj_gru_contract(self):
        model = create_traj_gru(3)
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 5, 1, 64, 64))
        y, _ = model.init_with_output(jax.random.PRNGKey(1), x, train=False)
        assert y.shape == (1, 3, 1, 64, 64)
        assert np.isfinite(np.asarray(y)).all()
