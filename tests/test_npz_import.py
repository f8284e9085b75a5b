"""TransUnet .npz pretrained-backbone loader parity.

A synthetic google-ViT R50+ViT-B_16 checkpoint (correct key schema +
shapes, random values, 197-token posemb to exercise the cls-strip +
grid-resize path) is loaded two independent ways:

  1. the REAL reference ``VisionTransformer.load_from``
     (models/TransUnet.py:718-765, via tests/ref_oracle.py), then its
     state_dict converted with the production bijective converter;
  2. our ``train.npz_import.load_transunet_npz`` directly.

Every leaf the npz touches must agree exactly — this proves our loader
interprets the checkpoint identically to the reference.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adnm_tpu.models.trans_unet import TransUnet
from adnm_tpu.train.npz_import import _resize_posemb, load_transunet_npz
from adnm_tpu.train.torch_import import convert_transunet_state_dict

torch = pytest.importorskip("torch")


def make_synthetic_npz(rng, hidden=768, heads=12, mlp=3072, n_tok=197, root_in=3):
    w = {}

    def add(k, *shape):
        w[k] = rng.standard_normal(shape).astype(np.float32)

    add("embedding/kernel", 1, 1, 1024, hidden)
    add("embedding/bias", hidden)
    add("Transformer/encoder_norm/scale", hidden)
    add("Transformer/encoder_norm/bias", hidden)
    add("Transformer/posembed_input/pos_embedding", 1, n_tok, hidden)
    hd = hidden // heads
    for i in range(12):
        r = f"Transformer/encoderblock_{i}"
        for nm in ("query", "key", "value"):
            add(f"{r}/MultiHeadDotProductAttention_1/{nm}/kernel", hidden, heads, hd)
            add(f"{r}/MultiHeadDotProductAttention_1/{nm}/bias", heads, hd)
        add(f"{r}/MultiHeadDotProductAttention_1/out/kernel", heads, hd, hidden)
        add(f"{r}/MultiHeadDotProductAttention_1/out/bias", hidden)
        add(f"{r}/MlpBlock_3/Dense_0/kernel", hidden, mlp)
        add(f"{r}/MlpBlock_3/Dense_0/bias", mlp)
        add(f"{r}/MlpBlock_3/Dense_1/kernel", mlp, hidden)
        add(f"{r}/MlpBlock_3/Dense_1/bias", hidden)
        add(f"{r}/LayerNorm_0/scale", hidden)
        add(f"{r}/LayerNorm_0/bias", hidden)
        add(f"{r}/LayerNorm_2/scale", hidden)
        add(f"{r}/LayerNorm_2/bias", hidden)
    add("conv_root/kernel", 7, 7, root_in, 64)
    add("gn_root/scale", 64)
    add("gn_root/bias", 64)
    cfg = [(64, 64, 256), (256, 128, 512), (512, 256, 1024)]
    for bi, (cin, cmid, cout) in enumerate(cfg):
        for ui in range((3, 4, 9)[bi]):
            p = f"block{bi + 1}/unit{ui + 1}"
            uin = cin if ui == 0 else cout
            add(f"{p}/conv1/kernel", 1, 1, uin, cmid)
            add(f"{p}/conv2/kernel", 3, 3, cmid, cmid)
            add(f"{p}/conv3/kernel", 1, 1, cmid, cout)
            for g in ("gn1", "gn2"):
                add(f"{p}/{g}/scale", cmid)
                add(f"{p}/{g}/bias", cmid)
            add(f"{p}/gn3/scale", cout)
            add(f"{p}/gn3/bias", cout)
            if ui == 0:
                add(f"{p}/conv_proj/kernel", 1, 1, uin, cout)
                add(f"{p}/gn_proj/scale", cout)
                add(f"{p}/gn_proj/bias", cout)
    return w


def test_resize_posemb_paths():
    rng = np.random.default_rng(0)
    p = rng.standard_normal((1, 256, 8)).astype(np.float32)
    np.testing.assert_array_equal(_resize_posemb(p, 256), p)  # same size
    p197 = rng.standard_normal((1, 197, 8)).astype(np.float32)
    np.testing.assert_array_equal(_resize_posemb(p197, 196), p197[:, 1:])  # cls strip
    out = _resize_posemb(p197, 256)  # 14x14 -> 16x16 zoom
    assert out.shape == (1, 256, 8) and np.isfinite(out).all()


def test_adapt_in_channels():
    from adnm_tpu.train.npz_import import _adapt_in_channels

    rng = np.random.default_rng(1)
    k3 = rng.standard_normal((7, 7, 3, 64)).astype(np.float32)
    k5 = _adapt_in_channels(k3, 5)
    assert k5.shape == (7, 7, 5, 64)
    # timm convention: tiled channels, scaled by cin_old/cin_new
    np.testing.assert_allclose(k5[:, :, 0], k3[:, :, 0] * 3 / 5, rtol=1e-6)
    np.testing.assert_allclose(k5[:, :, 3], k3[:, :, 0] * 3 / 5, rtol=1e-6)
    np.testing.assert_array_equal(_adapt_in_channels(k3, 3), k3)


def test_npz_loader_matches_reference_load_from():
    from ref_oracle import load_reference_module

    ref = load_reference_module("TransUnet")
    rng = np.random.default_rng(0)
    # root_in=5: the reference's root conv is hard-coded to 5 channels
    # (TransUnet.py:131) and its load_from CRASHES on a real 3-channel
    # ImageNet kernel (see npz_import._adapt_in_channels docstring);
    # a 5-channel synthetic root lets the reference path complete so
    # every other leaf's interpretation can be compared.
    npz = make_synthetic_npz(rng, root_in=5)

    # Reference path: load_from into the module-level 20-frame model
    tmodel = ref.create_TransUnet(20)
    tmodel.load_from(npz)
    ref_params, _ = convert_transunet_state_dict(tmodel.state_dict())

    # Our path: loader applied to a zeros tree (shapes from eval_shape)
    model = TransUnet(n_classes=20, img_size=256)
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, 5, 1, 256, 256)),
            train=False,
        )
    )
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes["params"])
    loaded = load_transunet_npz(npz, zeros)

    flat_l = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_leaves_with_path(loaded)}
    flat_r = {jax.tree_util.keystr(p): np.asarray(v)
              for p, v in jax.tree_util.tree_leaves_with_path(ref_params)}
    touched = [k for k, v in flat_l.items() if np.any(v != 0)]
    assert len(touched) > 300, f"loader touched only {len(touched)} leaves"
    for k in touched:
        np.testing.assert_allclose(flat_l[k], flat_r[k], rtol=1e-6, atol=1e-6, err_msg=k)


def test_swinunet_pretrained_loader():
    """Upstream swin-tiny dict -> encoder loaded + mirrored onto the
    decoder (reference SwinUnet.py:1070-1105 'model' branch)."""
    from adnm_tpu.models.swin_unet import SwinUnet
    from adnm_tpu.train.npz_import import load_swinunet_pretrained
    from adnm_tpu.train.torch_import import export_swinunet_state_dict

    model = SwinUnet(num_classes=20)
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, 5, 1, 256, 256)),
            train=False,
        )
    )
    rng = np.random.default_rng(3)
    rand = jax.tree.map(lambda s: rng.standard_normal(s.shape).astype(np.float32), shapes["params"])
    full_sd = export_swinunet_state_dict(rand)
    # upstream checkpoint = encoder-side keys only, unwrapped, under 'model'
    upstream = {
        k[len("swin_unet."):]: v
        for k, v in full_sd.items()
        if k.startswith(("swin_unet.patch_embed", "swin_unet.layers.", "swin_unet.norm."))
    }
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes["params"])
    loaded = load_swinunet_pretrained({"model": upstream}, zeros)

    su = loaded["swin_unet"]
    src = rand["swin_unet"]
    # encoder loaded exactly
    np.testing.assert_array_equal(su["patch_embed_proj"]["kernel"], src["patch_embed_proj"]["kernel"])
    np.testing.assert_array_equal(su["layer0_blk0"]["attn"]["qkv"]["kernel"],
                                  src["layer0_blk0"]["attn"]["qkv"]["kernel"])
    np.testing.assert_array_equal(su["norm"]["scale"], src["norm"]["scale"])
    # decoder mirror: layers_up.3 gets layers.0's blocks (same dim level)
    np.testing.assert_array_equal(su["layer_up3_blk0"]["attn"]["qkv"]["kernel"],
                                  src["layer0_blk0"]["attn"]["qkv"]["kernel"])
    # untouched leaves (e.g. output head) stay zero
    assert not np.any(su["output"]["kernel"])
