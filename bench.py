"""Benchmark: ADNM-UNet nowcast frames/sec/chip (train + rollout).

Protocol mirrors the reference's flagship training config (train.py:23,
59-66; train_untils.py:29-55): batch 4, 5 input -> 20 predicted frames at
256x256, AdamW + enRainfallLoss, adaptive-clip train step. We time the
full jitted train step (fwd + bwd + update) and the inference rollout,
and report predicted frames per second per chip:

    frames/sec = batch * 20 / step_time

The combined metric charges each benchmark "round" with one train step
and one rollout step (train + rollout), matching the driver metric
"nowcast frames/sec/chip (train + rollout)" (BASELINE.json).

vs_baseline: the reference publishes no numbers (BASELINE.md). The
denominator is the driver's north-star target of an A100 PyTorch run,
estimated at A100_EST_FRAMES_PER_SEC below; >= 3.0 means the >=3x target
is met against that estimate.
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_EST_FRAMES_PER_SEC = 100.0  # estimated reference torch A100 train+rollout throughput

BATCH = 4
IMG = 256
T_IN, T_OUT = 5, 20


def main():
    import os

    import jax
    import jax.numpy as jnp

    try:
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from adnm_tpu.models import create_model
    from adnm_tpu.train import Trainer, get_preset

    model = create_model("ADNMUnet", T_IN, T_OUT, 6)
    preset = get_preset("ADNMUnet", T_IN, T_OUT, 6, "Shanghai")
    trainer = Trainer(model, preset, T_IN, T_OUT, img_size=IMG, compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.uniform(0, 1, (BATCH, T_IN + T_OUT, 1, IMG, IMG)).astype(np.float32))
    lr = jnp.float32(1e-3)
    clip = jnp.float32(0.025)

    # warmup/compile
    trainer.state, loss, gn = trainer._train_step(trainer.state, batch, lr, clip)
    jax.block_until_ready(loss)
    _, out = trainer._eval_step(trainer.state, batch)
    jax.block_until_ready(out)

    # best-of-trials to reject host/dispatch interference noise
    n_iter, n_trials = 20, 3

    def time_train():
        t0 = time.perf_counter()
        for _ in range(n_iter):
            trainer.state, loss, gn = trainer._train_step(trainer.state, batch, lr, clip)
        jax.block_until_ready(loss)
        return (time.perf_counter() - t0) / n_iter

    def time_rollout():
        t0 = time.perf_counter()
        for _ in range(n_iter):
            _, out = trainer._eval_step(trainer.state, batch)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n_iter

    train_step_s = min(time_train() for _ in range(n_trials))
    rollout_step_s = min(time_rollout() for _ in range(n_trials))

    frames = BATCH * T_OUT
    combined = (2 * frames) / (train_step_s + rollout_step_s)  # one train + one rollout round
    result = {
        "metric": "nowcast frames/sec/chip (train + rollout)",
        "value": round(combined, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(combined / A100_EST_FRAMES_PER_SEC, 3),
        "detail": {
            "train_step_s": round(train_step_s, 4),
            "rollout_step_s": round(rollout_step_s, 4),
            "train_frames_per_s": round(frames / train_step_s, 2),
            "rollout_frames_per_s": round(frames / rollout_step_s, 2),
            "batch": BATCH,
            "img": IMG,
            "dtype": "bfloat16 compute, fp32 params",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
