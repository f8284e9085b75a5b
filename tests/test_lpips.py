"""LPIPS JAX port wiring test: with shared random weights, the feature
extractor and distance must match a torch implementation of the same
architecture (weights themselves ship separately, see scripts/export_lpips.py)."""

import numpy as np
import pytest

import jax.numpy as jnp


def _random_params(rng):
    cfg = [(64, 11, 3), (192, 5, 64), (384, 3, 192), (256, 3, 384), (256, 3, 256)]
    arrays = {}
    for i, (cout, k, cin) in enumerate(cfg):
        arrays[f"conv{i}_w"] = rng.normal(0, 0.05, (cout, cin, k, k)).astype(np.float32)
        arrays[f"conv{i}_b"] = rng.normal(0, 0.01, (cout,)).astype(np.float32)
        arrays[f"lin{i}_w"] = rng.uniform(0, 0.1, (1, cout, 1, 1)).astype(np.float32)
    return arrays


def test_lpips_matches_torch_reference(tmp_path):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from adnm_tpu.metrics.lpips_jax import LpipsAlex, _SCALE, _SHIFT

    rng = np.random.default_rng(0)
    arrays = _random_params(rng)
    np.savez(tmp_path / "w.npz", **arrays)
    model = LpipsAlex(str(tmp_path / "w.npz"))

    B, H, W = 2, 64, 64
    a = rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32)
    b = rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32)

    def torch_lpips(x, y):
        def feats(v):
            v = (v * 2 - 1 - torch.tensor(_SHIFT).view(1, 3, 1, 1)) / torch.tensor(_SCALE).view(1, 3, 1, 1)
            out = []
            strides = [4, 1, 1, 1, 1]
            pads = [2, 2, 1, 1, 1]
            for i in range(5):
                w = torch.from_numpy(arrays[f"conv{i}_w"])
                bb = torch.from_numpy(arrays[f"conv{i}_b"])
                v = F.relu(F.conv2d(v, w, bb, stride=strides[i], padding=pads[i]))
                out.append(v)
                if i in (0, 1):
                    v = F.max_pool2d(v, 3, 2)
            return out

        fx, fy = feats(torch.from_numpy(x)), feats(torch.from_numpy(y))
        total = torch.zeros(x.shape[0])
        for i, (u, v) in enumerate(zip(fx, fy)):
            un = u / (u.norm(dim=1, keepdim=True) + 1e-10)
            vn = v / (v.norm(dim=1, keepdim=True) + 1e-10)
            d = (un - vn) ** 2
            lin = torch.from_numpy(arrays[f"lin{i}_w"]).view(1, -1, 1, 1)
            total = total + (d * lin).sum(dim=1).mean(dim=(1, 2))
        return total.numpy()

    # our API takes grayscale (B, T, H, W); feed the gray channel and
    # compare against torch on the replicated-RGB input
    gray_a = a[:, 0]
    gray_b = b[:, 0]
    ours = np.asarray(model(jnp.asarray(gray_a[:, None]), jnp.asarray(gray_b[:, None])))[:, 0]
    a3 = np.repeat(gray_a[:, None], 3, axis=1)
    b3 = np.repeat(gray_b[:, None], 3, axis=1)
    expect = torch_lpips(a3, b3)  # [0,1] inputs; feats() applies the 2x-1 scaling
    np.testing.assert_allclose(ours, expect, rtol=1e-3, atol=1e-4)
