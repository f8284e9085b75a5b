"""Training dynamics, not just single steps (reference protocol:
train.py:113-206): overfitting a fixed synthetic batch must drive the
loss down >= 10x, and for the flagship preset the adaptive gradient
clipping (train.py:78-94,122-130) must actually engage early
(grad norms above the warmup threshold, i.e. clip_ratio > 0)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adnm_tpu.data.shanghai import _synthetic_clip
from adnm_tpu.train import Trainer, get_preset

TINY = dict(
    embed_dim=(8, 8, 8, 8, 8, 8), refine_dim=(8, 8, 8, 8), wt_levels=(1, 1, 1),
    headdim=2, refine_headdim=(2, 2, 2, 2), depth=(1, 1, 1), refine_depth=(1, 1, 1, 1),
)


def _batch(b: int, frames: int, size: int) -> jnp.ndarray:
    rng = np.random.default_rng(0)
    clips = np.stack([_synthetic_clip(rng, frames, size) for _ in range(b)])
    return jnp.asarray(clips[:, :, None])  # (B, T, 1, S, S)


def _run_steps(trainer, batch, steps, lr, clip):
    losses, gnorms = [], []
    lr_j, clip_j = jnp.float32(lr), jnp.float32(clip)
    for _ in range(steps):
        trainer.state, loss, gn = trainer._train_step(trainer.state, batch, lr_j, clip_j)
        losses.append(loss)
        gnorms.append(gn)
    return np.asarray(jax.device_get(losses)), np.asarray(jax.device_get(gnorms))


def test_adnm_overfit_and_adaptive_clip_engages():
    from adnm_tpu.models.adnm_unet import ADNMUNet

    model = ADNMUNet(channels=5, out_channels=2, kernel=(3, 3, 3), **TINY)
    preset = get_preset("ADNMUnet", 5, 2, 6, "Shanghai")
    trainer = Trainer(model, preset, input_frames=5, output_frames=2, img_size=32)
    batch = _batch(2, 7, 32)
    # warmup-epoch constant threshold from the reference's clip schedule
    clip0 = preset.clip_schedule.threshold(1, 0.0)
    losses, gnorms = _run_steps(trainer, batch, steps=200, lr=1e-3, clip=clip0)
    assert np.isfinite(losses).all()
    assert losses[-5:].mean() < losses[0] / 10, (float(losses[0]), float(losses[-5:].mean()))
    # the adaptive clip must actually bite during early training
    assert (gnorms[:50] > clip0).any(), (float(gnorms[:50].max()), clip0)


def test_remat_forward_matches_baseline():
    """Trainer(remat_forward=True) (jax.checkpoint around the training
    forward) must be a pure memory/compute tradeoff: identical loss and
    gradient norm to the unremat'd step."""
    from adnm_tpu.models.adnm_unet import ADNMUNet

    model = ADNMUNet(channels=5, out_channels=2, kernel=(3, 3, 3), **TINY)
    preset = get_preset("ADNMUnet", 5, 2, 6, "Shanghai")
    batch = _batch(2, 7, 32)
    t0 = Trainer(model, preset, input_frames=5, output_frames=2, img_size=32)
    t1 = Trainer(model, preset, input_frames=5, output_frames=2, img_size=32,
                 remat_forward=True)
    l0, g0 = _run_steps(t0, batch, steps=3, lr=1e-3, clip=0.0)
    l1, g1 = _run_steps(t1, batch, steps=3, lr=1e-3, clip=0.0)
    np.testing.assert_allclose(l1, l0, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(g1, g0, rtol=1e-5, atol=1e-6)


def test_sgd_baseline_overfits():
    from adnm_tpu.models.smaat_unet import SmaAtUNet

    model = SmaAtUNet(n_channels=5, n_classes=2)
    preset = get_preset("SmaATUnet", 5, 2, 6, "Shanghai")  # SGD + RAINlOSS
    trainer = Trainer(model, preset, input_frames=5, output_frames=2, img_size=32)
    batch = _batch(2, 7, 32)
    losses, _ = _run_steps(trainer, batch, steps=120, lr=preset.base_lr, clip=0.0)
    assert np.isfinite(losses).all()
    assert losses[-5:].mean() < losses[0] / 10, (float(losses[0]), float(losses[-5:].mean()))
