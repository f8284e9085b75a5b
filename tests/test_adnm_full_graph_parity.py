"""FULL-GRAPH cross-framework parity for the flagship ADNM-UNet.

The oracle is the REAL reference model (models/ADNMUNet.py:720-829
VisionMamba, with its complete Encoder/Decoder/Refiner assembly),
imported from /root/reference and executed on torch-CPU via
tests/ref_oracle.py. A randomly-initialized reference state_dict is
converted with the production importer (train/adnm_import.py) and the
two forwards are compared end to end — this covers Block/Attention
assembly semantics (ADNMUNet.py:51-238), the ADN-SSD mixer incl. the
even/odd interleave permutations (ADNssd.py:302-462), PatchEmbed /
WTLayer / Channel_Att_Bridge / EncoderToDecoder / OutProj
(model_untils.py), and WTConv2d (WTConv2d.py) as one composed graph.

Complements tests/test_adnssd_reference_parity.py (mixer-level,
hand-transcribed oracle): here nothing is transcribed — the reference
code itself runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adnm_tpu.models.adnm_unet import ADNMUNet
from adnm_tpu.train.adnm_import import convert_adnm_state_dict, export_adnm_state_dict

torch = pytest.importorskip("torch")

from ref_oracle import load_reference_module  # noqa: E402

IMG = 64
CH = 3
OUT = 2

CFG = dict(
    embed_dim=(8, 16, 16, 16, 32, 32),
    refine_dim=(8, 8, 8, 8),
    wt_levels=(2, 2, 1),
    headdim=4,
    refine_headdim=(4, 4, 4, 4),
    depth=(1, 1, 1),
    refine_depth=(1, 1, 1, 1),
)


def _build_pair(instance_norm: bool, kernel, seed: int):
    ref = load_reference_module("ADNMUNet")
    torch.manual_seed(seed)
    tmodel = ref.VisionMamba(
        img_size=IMG,
        depth=list(CFG["depth"]),
        refine_depth=list(CFG["refine_depth"]),
        refine_headdim=list(CFG["refine_headdim"]),
        refine_dim=list(CFG["refine_dim"]),
        embed_dim=list(CFG["embed_dim"]),
        headdim=CFG["headdim"],
        channels=CH,
        out_channels=OUT,
        norm_epsilon=1e-6,
        kernel=list(kernel),
        ratio=[2, 2, 2, 2, 2, 2],
        wt_levels=list(CFG["wt_levels"]),
        out_expand=2,
        InstanceNorm=instance_norm,
    )
    tmodel.eval()
    ours = ADNMUNet(
        channels=CH,
        out_channels=OUT,
        kernel=tuple(kernel),
        norm_epsilon=1e-6,
        instance_norm=instance_norm,
        **CFG,
    )
    return tmodel, ours


@pytest.mark.parametrize(
    "instance_norm,kernel", [(True, (3, 3, 3)), (False, (5, 3, 3))],
    ids=["instancenorm-k3", "groupnorm-k533"],
)
def test_full_graph_forward_parity(instance_norm, kernel):
    tmodel, ours = _build_pair(instance_norm, kernel, seed=0)

    # Production import path: real reference state_dict -> our params.
    params = convert_adnm_state_dict(
        tmodel.state_dict(), instance_norm=instance_norm, **CFG
    )

    rng = np.random.default_rng(1)
    x_np = rng.uniform(0.0, 1.0, (2, CH, 1, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(x_np)).numpy()

    out = np.asarray(
        jax.jit(lambda p, x: ours.apply({"params": p}, x, train=False))(
            params, jnp.asarray(x_np)
        )
    )
    assert out.shape == ref_out.shape == (2, OUT, 1, IMG, IMG)
    np.testing.assert_allclose(out, ref_out, atol=1e-3, rtol=1e-3)


def test_export_matches_real_reference_state_dict():
    """Every key the exporter emits must exist in a REAL reference
    state_dict with identical shape (validates the importer's
    reference-side names against the actual module tree, not our
    reading of the source)."""
    tmodel, ours = _build_pair(True, (3, 3, 3), seed=2)
    x = jnp.zeros((1, CH, 1, IMG, IMG))
    variables = jax.jit(ours.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False
    )
    sd = export_adnm_state_dict(jax.device_get(variables["params"]), **CFG)
    ref_sd = tmodel.state_dict()
    missing = [k for k in sd if k not in ref_sd]
    assert not missing, f"exporter emits unknown reference keys: {missing[:10]}"
    bad = [
        (k, tuple(np.asarray(sd[k]).shape), tuple(ref_sd[k].shape))
        for k in sd
        if tuple(np.asarray(sd[k]).shape) != tuple(ref_sd[k].shape)
    ]
    assert not bad, f"shape mismatches vs real reference: {bad[:10]}"
