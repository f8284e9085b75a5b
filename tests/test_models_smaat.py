"""SmaAt-UNet shape contract + trainer smoke test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adnm_tpu.models.smaat_unet import SmaAtUNet, upsample_bilinear_align_corners


class TestUpsample:
    def test_matches_torch_align_corners(self):
        torch = pytest.importorskip("torch")
        x = np.random.default_rng(0).normal(size=(1, 5, 7, 3)).astype(np.float32)
        y = np.asarray(upsample_bilinear_align_corners(jnp.asarray(x), 2))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        yt = torch.nn.functional.interpolate(xt, scale_factor=2, mode="bilinear", align_corners=True)
        np.testing.assert_allclose(y, yt.permute(0, 2, 3, 1).numpy(), atol=1e-5)


class TestSmaAt:
    def test_shape_contract(self):
        model = SmaAtUNet(n_channels=5, n_classes=20)
        x = jnp.zeros((1, 5, 1, 64, 64))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        y = model.apply(variables, x, train=False)
        assert y.shape == (1, 20, 1, 64, 64)

    def test_train_updates_batch_stats(self):
        model = SmaAtUNet(n_channels=5, n_classes=4)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 5, 1, 32, 32))
        variables = model.init(jax.random.PRNGKey(0), x, train=True)
        y, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
        assert y.shape == (2, 4, 1, 32, 32)
        before = jax.tree.leaves(variables["batch_stats"])
        after = jax.tree.leaves(mut["batch_stats"])
        assert any(not np.allclose(b, a) for b, a in zip(before, after))


class TestTrainerEndToEnd:
    def test_one_epoch_smaat(self, tmp_path):
        from adnm_tpu.data import BatchLoader, ShanghaiDataset
        from adnm_tpu.models import create_model
        from adnm_tpu.train import Trainer, get_preset

        model = create_model("SmaATUnet", 5, 4, 6)
        preset = get_preset("SmaATUnet", 5, 4, 6, "Shanghai")
        trainer = Trainer(model, preset, 5, 4, img_size=32)
        ds = ShanghaiDataset(None, img_size=32, split="train", synthetic_len=8, seq_len=9)
        loader = BatchLoader(ds, batch_size=2)
        logs = trainer.fit(loader, loader, None, epochs=2, ckpt_path=str(tmp_path / "ck"))
        assert len(logs) == 2
        assert np.isfinite(logs[0].train_loss)
        # loss should change across epochs (model is learning/updating)
        assert logs[0].train_loss != logs[1].train_loss
        # checkpoint round-trip
        trainer.load(str(tmp_path / "ck"))
