"""Shanghai radar HDF5 pipeline (reference: datasets/Shanghai.py).

Reference behavior replicated:
  * shanghai.h5 'train' group holds 25-frame uint8 clips (25, 565, 784),
    range 0..70; per item: /255, resize to img_size (default 256), shape
    (25, 1, S, S) float32 (Shanghai.py:52-59).
  * The 'train' group is split 0.7 / 0.15 / 0.15 into train/val/test
    (Shanghai.py:131-136); the h5 'test' group is unused except for
    lengths.
  * PIXEL_SCALE = 90 (Shanghai.py:22).

TPU-native changes: clips are decoded + resized host-side with
numpy/jax (bilinear, antialiased — matching torchvision Resize
defaults), batches are delivered as a single contiguous array ready for
device_put/sharding; an optional in-memory cache mirrors the reference's
eager materialization (Shanghai.py:126) without re-reading h5 per epoch.
A synthetic mode generates structured random radar fields for tests and
benchmarking when shanghai.h5 is absent.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import numpy as np

PIXEL_SCALE = 90.0


def _resize_bilinear_antialias(frames: np.ndarray, size: int) -> np.ndarray:
    """(T, H, W) float -> (T, size, size), matching torchvision
    transforms.Resize (bilinear, antialias=True on tensors)."""
    import jax
    import jax.numpy as jnp

    out = jax.image.resize(
        jnp.asarray(frames), (frames.shape[0], size, size), method="bilinear", antialias=True
    )
    return np.asarray(out)


def _synthetic_clip(rng: np.random.Generator, frames: int, size: int) -> np.ndarray:
    """Structured moving-blob radar-like field in [0, 1], (frames, S, S)."""
    n_blobs = rng.integers(2, 5)
    ys = rng.uniform(0, size, n_blobs)
    xs = rng.uniform(0, size, n_blobs)
    vy = rng.uniform(-2, 2, n_blobs)
    vx = rng.uniform(-2, 2, n_blobs)
    amp = rng.uniform(0.3, 0.85, n_blobs)
    sig = rng.uniform(size / 16, size / 6, n_blobs)
    yy, xx = np.mgrid[0:size, 0:size]
    clip = np.zeros((frames, size, size), np.float32)
    for t in range(frames):
        f = np.zeros((size, size), np.float32)
        for i in range(n_blobs):
            cy = (ys[i] + vy[i] * t) % size
            cx = (xs[i] + vx[i] * t) % size
            f += amp[i] * np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig[i] ** 2)))
        clip[t] = np.clip(f, 0, 1)
    return clip


class ShanghaiDataset:
    """Index-addressable clip store with the reference's split semantics."""

    def __init__(
        self,
        data_path: Optional[str],
        img_size: int = 256,
        split: str = "train",
        cache: bool = True,
        synthetic_len: int = 64,
        seq_len: int = 25,
    ):
        assert split in ("train", "val", "test")
        self.img_size = img_size
        self.split = split
        self.seq_len = seq_len
        self.cache = cache
        self._cached: dict[int, np.ndarray] = {}
        self.synthetic = data_path is None or not os.path.exists(data_path or "")
        if self.synthetic:
            base = {"train": 0, "val": 10_000, "test": 20_000}[split]
            n = {"train": int(synthetic_len * 0.7), "val": int(synthetic_len * 0.15), "test": int(synthetic_len * 0.15)}[split]
            self._indices = list(range(base, base + max(n, 1)))
            self.data_path = None
        else:
            import h5py

            self.data_path = data_path
            with h5py.File(data_path, "r") as f:
                total = int(f["train"]["all_len"][()])
            train_end = math.floor(total * 0.7)
            val_end = math.floor(total * 0.85)
            self._indices = {
                "train": list(range(0, train_end)),
                "val": list(range(train_end, val_end)),
                "test": list(range(val_end, total)),
            }[split]
            self._h5 = None

    def __len__(self) -> int:
        return len(self._indices)

    def _load(self, raw_index: int) -> np.ndarray:
        if self.synthetic:
            rng = np.random.default_rng(raw_index)
            return _synthetic_clip(rng, self.seq_len, self.img_size)
        import h5py

        if self._h5 is None:
            self._h5 = h5py.File(self.data_path, "r")
        imgs = self._h5["train"][str(raw_index)][()]  # (25, 565, 784) uint8
        from adnm_tpu.data.native import decode_resize_clip

        native = decode_resize_clip(imgs, self.img_size)
        if native is not None:
            return native
        frames = imgs.astype(np.float32) / 255.0
        return _resize_bilinear_antialias(frames, self.img_size)

    def __getitem__(self, index: int) -> np.ndarray:
        """Returns (seq_len, img_size, img_size) float32 in [0, 1]."""
        raw = self._indices[index]
        if self.cache and raw in self._cached:
            return self._cached[raw]
        clip = self._load(raw)
        if self.cache:
            self._cached[raw] = clip
        return clip


def make_datasets(
    data_path: Optional[str], img_size: int = 256, synthetic_len: int = 64, cache: bool = True
) -> Tuple[ShanghaiDataset, ShanghaiDataset, ShanghaiDataset]:
    return tuple(
        ShanghaiDataset(data_path, img_size, s, cache=cache, synthetic_len=synthetic_len)
        for s in ("train", "val", "test")
    )
