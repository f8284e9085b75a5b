"""Validates scripts/export_lpips.py end to end against a mocked
``lpips`` pip package (the real one needs downloaded weights; zero
egress here). The mock reproduces the package's module structure
(net.net AlexNet conv slices; lin0..4 NetLinLayer with .model[-1] a 1x1
conv) AND its forward math (scaling layer -> conv features -> unit
normalize -> squared diff -> 1x1 lin -> spatial average -> sum; lpips
package v0.1.4, as used at reference Shanghai_metrics.py:37-39,154-169).

The export script runs unmodified against the mock, the npz loads into
our JAX port, and distances must match the mock's torch forward — so
when the real package is available, running the same script yields a
weights file whose distances match real LPIPS.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

_ALEX_CFG = [
    (3, 64, 11, 4, 2),
    (64, 192, 5, 1, 2),
    (192, 384, 3, 1, 1),
    (384, 256, 3, 1, 1),
    (256, 256, 3, 1, 1),
]


class _MockLPIPS(nn.Module):
    """Structure + forward of lpips.LPIPS(net='alex'), random weights."""

    def __init__(self, net="alex", verbose=False):
        super().__init__()
        assert net == "alex"
        torch.manual_seed(0)
        convs = []
        for cin, cout, k, s, p in _ALEX_CFG:
            convs.append(nn.Conv2d(cin, cout, k, stride=s, padding=p))
        self.net = nn.Sequential(*convs)  # .modules() exposes the Conv2d list
        chans = [64, 192, 384, 256, 256]
        for i, c in enumerate(chans):
            lin = nn.Module()
            lin.model = nn.Sequential(nn.Dropout(), nn.Conv2d(c, 1, 1, bias=False))
            with torch.no_grad():
                lin.model[1].weight.abs_()  # real lpips lins are nonnegative
            setattr(self, f"lin{i}", lin)

    def _feats(self, x):
        x = (x - _SHIFT) / _SCALE
        feats = []
        for i, conv in enumerate(self.net):
            x = F.relu(conv(x))
            feats.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, 3, 2)
        return feats

    def forward(self, a, b):
        fa, fb = self._feats(a), self._feats(b)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / (xa.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            nb = xb / (xb.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (na - nb).pow(2)
            lin = getattr(self, f"lin{i}").model[1]
            total = total + lin(d).mean(dim=(2, 3), keepdim=True)
        return total


def test_export_script_roundtrip(tmp_path, monkeypatch):
    mock_pkg = types.ModuleType("lpips")
    mock_pkg.LPIPS = _MockLPIPS
    monkeypatch.setitem(sys.modules, "lpips", mock_pkg)

    sys.path.insert(0, "scripts")
    import export_lpips

    out = str(tmp_path / "lpips_alex.npz")
    export_lpips.main(out)

    from adnm_tpu.metrics.lpips_jax import LpipsAlex

    ours = LpipsAlex(out)
    rng = np.random.default_rng(0)
    pred = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    true = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)

    got = np.asarray(ours(pred, true))  # (B, T)

    mock = _MockLPIPS()
    with torch.no_grad():
        a = torch.from_numpy(pred.reshape(6, 1, 64, 64) * 2 - 1).repeat(1, 3, 1, 1)
        b = torch.from_numpy(true.reshape(6, 1, 64, 64) * 2 - 1).repeat(1, 3, 1, 1)
        want = mock(a, b).reshape(2, 3).numpy()

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert (got > 0).all()
