"""Per-model training presets (reference: train_untils.py:22-130 +
train.py:78-94).

Each preset bundles the optimizer family, base LR, loss, LR schedule
(computed host-side per epoch, like the reference's per-epoch
scheduler.step()), early-stop / save-epoch / grad-clip policy, and the
ADNMUnet adaptive clip constants.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax.numpy as jnp
import optax

from adnm_tpu.losses import get_loss


@dataclasses.dataclass
class ClipSchedule:
    """Adaptive gradient-clip schedule (reference: train.py:78-94,122-130)."""

    warmup_epoch: int
    save_epoch: int
    norm_ratio: float
    norm_max: float
    norm_initial: float
    grad_epoch_excursion: int

    def threshold(self, epoch: int, prev_avg_grad_norm: float) -> float:
        if epoch <= self.warmup_epoch + 1:
            return self.norm_max
        if epoch <= self.save_epoch - self.warmup_epoch + self.grad_epoch_excursion:
            alpha = self.norm_initial + (1 - self.norm_initial) * (epoch - self.warmup_epoch) / (
                self.save_epoch - self.warmup_epoch + self.grad_epoch_excursion
            )
            return alpha * self.norm_ratio * prev_avg_grad_norm
        return self.norm_ratio * prev_avg_grad_norm


@dataclasses.dataclass
class TrainPreset:
    opt_family: str  # "adamw" | "adam" | "sgd"
    base_lr: float
    loss_fn: Callable
    lr_at_epoch: Optional[Callable[[int, int], float]]  # (epoch_1idx, total_epochs) -> lr; None => poly decay in loop
    if_early_stop: bool
    early_stop: Optional[int]
    norm_clip: bool
    save_epoch_gated: bool  # reference's `save_epoch` flag
    epochs: int
    clip_schedule: Optional[ClipSchedule] = None
    save_epoch: int = 0  # epoch gate value for ADNMUnet
    weight_decay: float = 0.0
    momentum: float = 0.0
    adam_eps: float = 1e-8

    def make_optimizer(self, pad_to: int = 1) -> optax.GradientTransformation:
        """Optimizer with injected LR (the loop sets it per epoch).

        Wrapped in optax.flatten: the update runs on ONE raveled vector
        instead of ~1800 leaves — on TPU the per-leaf op overhead
        dominated the step (measured 17ms of a 21ms ADNM train step).

        ``pad_to > 1`` pads the raveled vector to that multiple so the
        moment buffers split evenly across a ZeRO-1 'data' shard
        (Trainer(shard_opt_state=True) passes the DP degree). Padded
        entries carry zero gradient, so they never produce an update."""
        if self.opt_family == "adamw":
            inner = optax.inject_hyperparams(optax.adamw)(
                learning_rate=self.base_lr, b1=0.9, b2=0.999,
                eps=self.adam_eps, weight_decay=self.weight_decay,
            )
        elif self.opt_family == "adam":
            inner = optax.inject_hyperparams(optax.adam)(learning_rate=self.base_lr)
        elif self.opt_family == "sgd":
            inner = optax.inject_hyperparams(_sgd_torch)(
                learning_rate=self.base_lr, momentum=self.momentum, weight_decay=self.weight_decay
            )
        else:
            raise ValueError(self.opt_family)
        if pad_to > 1:
            return _flatten_padded(inner, pad_to)
        return optax.flatten(inner)


def _flatten_padded(inner: optax.GradientTransformation, multiple: int) -> optax.GradientTransformation:
    """optax.flatten with the raveled vector zero-padded to a multiple of
    ``multiple``: the moment buffers then shard evenly over a DP axis
    (ZeRO-1). Same state structure as optax.flatten (the loop's set_lr
    still finds .hyperparams); padded lanes see zero gradients, zero
    params, and therefore zero updates for AdamW/Adam/SGD alike."""
    from jax.flatten_util import ravel_pytree

    def _flat_pad(tree):
        flat, unravel = ravel_pytree(tree)
        pad = (-flat.size) % multiple
        return jnp.pad(flat, (0, pad)), flat.size, unravel

    def init(params):
        flat, _, _ = _flat_pad(params)
        return inner.init(flat)

    def update(updates, state, params=None):
        flat_u, n, unravel = _flat_pad(updates)
        flat_p = None
        if params is not None:
            flat_p, _, _ = _flat_pad(params)
        new_u, new_state = inner.update(flat_u, state, flat_p)
        return unravel(new_u[:n]), new_state

    return optax.GradientTransformation(init, update)


def _sgd_torch(learning_rate, momentum=0.0, weight_decay=0.0):
    """torch-semantics SGD: wd added to grad, momentum buffer m = mu*m + g,
    update = -lr * m (optax's trace matches torch's for nesterov=False)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(learning_rate),
    )


def _cosine(base_lr: float, eta_min: float, t_max: int):
    def lr(t: int) -> float:
        return eta_min + (base_lr - eta_min) * (1 + math.cos(math.pi * t / t_max)) / 2
    return lr


def _multistep(base_lr: float, milestones, gamma: float):
    def lr(t: int) -> float:
        k = sum(1 for m in milestones if t >= m)
        return base_lr * (gamma ** k)
    return lr


def get_preset(model_name: str, input_frames: int, output_frames: int, frame_interval: int, dataset: str) -> TrainPreset:
    thresholds = (0.1, 0.3, 0.5, 0.7, 0.8) if dataset == "LAPS" else (20, 30, 35, 40)

    if model_name == "ADNMUnet":
        base_lr, eta_min, warmup_epoch = 1e-3, 5e-7, 3
        cos = _cosine(base_lr, eta_min, 50)

        def lr_at_epoch(epoch: int, total: int) -> float:
            # torch LinearLR(start_factor=0.01, total_iters=3) then
            # SequentialLR switch to CosineAnnealingLR(T=50) at epoch 3.
            # (train_untils.py:44-46); epoch is 1-indexed; scheduler.step()
            # runs after the epoch, so epoch e trains with schedule state e-1.
            t = epoch - 1
            if t < warmup_epoch:
                return base_lr * (0.01 + (1.0 - 0.01) * t / warmup_epoch)
            return cos(t - warmup_epoch)

        instance_norm = frame_interval < 120 / input_frames
        clip = (
            ClipSchedule(3, 34, 1.75, 0.025, 0.175, 1)
            if instance_norm
            else ClipSchedule(3, 20, 3.0, 0.035, 0.065, 0)
        )
        return TrainPreset(
            opt_family="adamw", base_lr=base_lr,
            loss_fn=get_loss("en_rainfall", omega_t=0.57, alpha=0.25, gamma=0.0),
            lr_at_epoch=lr_at_epoch, if_early_stop=True,
            early_stop=3 if instance_norm else 5,
            norm_clip=True, save_epoch_gated=True, epochs=40,
            clip_schedule=clip, save_epoch=clip.save_epoch,
            weight_decay=1e-2, adam_eps=1e-9,
        )

    if model_name in ("ConvLSTM", "TrajGRU"):
        ms = _multistep(1e-4, (15000, 30000), 0.1)
        return TrainPreset(
            opt_family="adam", base_lr=1e-4,
            loss_fn=get_loss("weighted_mse_mae", thresholds=thresholds),
            lr_at_epoch=lambda e, total: ms(e - 1),
            if_early_stop=False, early_stop=None, norm_clip=False,
            save_epoch_gated=False, epochs=60,
        )

    if model_name == "LPTQPN":
        cos = _cosine(1e-3, 1e-9, 30)
        return TrainPreset(
            opt_family="adamw", base_lr=1e-3, loss_fn=get_loss("rain"),
            lr_at_epoch=lambda e, total: cos(e - 1),
            if_early_stop=True, early_stop=10, norm_clip=False,
            save_epoch_gated=False, epochs=60, weight_decay=1e-2,
        )

    if model_name in ("TransUnet", "SmaATUnet", "SwinUnet"):
        return TrainPreset(
            opt_family="sgd", base_lr=1e-2, loss_fn=get_loss("rain"),
            lr_at_epoch=None,  # poly decay handled in the loop (train.py:188-191)
            if_early_stop=(model_name == "SmaATUnet"),
            early_stop=30 if model_name == "SmaATUnet" else None,
            norm_clip=False, save_epoch_gated=False, epochs=60,
            momentum=0.9, weight_decay=1e-4,
        )

    raise ValueError(f"unknown model {model_name!r}")
