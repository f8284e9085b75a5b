"""Shape-contract tests for LPTQPN / TransUnet / SwinUnet (+ registry
completeness). Sizes kept small for CPU compile time."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adnm_tpu.models import MODEL_NAMES, create_model


def _jit_init(model, x, train=False):
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    return jax.jit(model.init, static_argnames=("train",))(rngs, x, train=train)


class TestPixelShuffle:
    def test_roundtrip_and_torch_parity(self):
        torch = pytest.importorskip("torch")
        from adnm_tpu.models.lptqpn import pixel_shuffle, pixel_unshuffle

        x = np.random.default_rng(0).normal(size=(1, 4, 4, 8)).astype(np.float32)
        xj = jnp.asarray(x)
        up = pixel_shuffle(xj, 2)
        rt = pixel_unshuffle(up, 2)
        np.testing.assert_allclose(np.asarray(rt), x, atol=1e-6)
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        up_t = torch.nn.functional.pixel_shuffle(xt, 2)
        np.testing.assert_allclose(np.asarray(up), up_t.permute(0, 2, 3, 1).numpy(), atol=1e-6)


class TestLPTQPN:
    def test_shape_contract(self):
        from adnm_tpu.models.lptqpn import LPTQPN

        # slim: fewer blocks for CPU
        model = LPTQPN(inp_channels=5, out_channels=3, dim=8, num_blocks=(1, 1, 1, 1),
                       num_refinement_blocks=1)
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 5, 1, 32, 32))
        v = _jit_init(model, x)
        y = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
        assert y.shape == (1, 3, 1, 32, 32)
        assert np.isfinite(np.asarray(y)).all()


class TestSwinUnet:
    def test_shape_contract(self):
        from adnm_tpu.models.swin_unet import SwinUnet

        model = SwinUnet(num_classes=4, img_size=64)
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 5, 1, 64, 64))
        v = _jit_init(model, x)
        y = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
        assert y.shape == (1, 4, 1, 64, 64)
        assert np.isfinite(np.asarray(y)).all()

    def test_train_mode_uses_dropout_rng(self):
        from adnm_tpu.models.swin_unet import SwinUnet

        model = SwinUnet(num_classes=2, img_size=32)
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 5, 1, 32, 32))
        v = _jit_init(model, x, train=True)
        y = model.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(3)})
        assert np.isfinite(np.asarray(y)).all()


class TestTransUnet:
    def test_shape_contract(self):
        from adnm_tpu.models.trans_unet import TransUnet

        # slim ViT for CPU: 2 layers, keeps the ResNet hybrid + 3 skips
        model = TransUnet(n_classes=3, img_size=64, hidden=32, num_layers=2,
                          heads=4, mlp_dim=64, decoder_channels=(16, 16, 16, 8))
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 5, 1, 64, 64))
        v = _jit_init(model, x)
        y = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
        assert y.shape == (1, 3, 1, 64, 64)
        assert np.isfinite(np.asarray(y)).all()


def test_registry_names_complete():
    assert set(MODEL_NAMES) == {
        "ADNMUnet", "ConvLSTM", "TrajGRU", "LPTQPN", "TransUnet", "SmaATUnet", "SwinUnet",
    }
