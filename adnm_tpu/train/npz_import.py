"""ImageNet .npz pretrained-backbone loader for TransUnet.

Reference: models/TransUnet.py:718-765 (VisionTransformer.load_from)
loads the google vision_transformer R50+ViT-B_16 checkpoint (a .npz of
JAX arrays) into the torch model with HWIO->OIHW transposes and qkv
reshapes. Our model IS flax, so most tensors load natively (HWIO convs,
(in, out) dense kernels); only the posembed grid-resize logic and the
(hidden, heads, headdim) attention folding need care.

Loaded subtree (encoder only, exactly what the reference loads):
patch embedding, position embeddings (with cls-token strip and bilinear
grid resize, TransUnet.py:728-750), the 12 ViT blocks, the encoder norm,
and the ResNetV2 root + all pre-act bottleneck units. The DecoderCup and
segmentation head stay at their fresh init (same as the reference).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

def load_swinunet_pretrained(pretrained, params: dict, depths=(2, 2, 2, 2)) -> dict:
    """SwinUnet upstream-pretrained loader (reference:
    models/SwinUnet.py:1070-1105, the ``pretrained_dict['model']``
    branch): takes an upstream swin-tiny checkpoint dict, mirrors every
    encoder ``layers.{i}`` tensor onto decoder ``layers_up.{3-i}``,
    drops shape mismatches, and loads non-strict.

    ``pretrained``: the torch dict (either the raw upstream file with a
    'model' key, or already-unwrapped). Returns an updated copy of our
    params; prints a summary like the reference.
    """
    import jax

    from adnm_tpu.train.torch_import import _conv_w, _lin_w, _swinunet_name_map

    if "model" in pretrained:
        pretrained = pretrained["model"]
    sd = {}
    for k, v in pretrained.items():
        v = np.asarray(v.numpy() if hasattr(v, "numpy") else v)
        key = k if k.startswith("swin_unet.") else f"swin_unet.{k}"
        sd[key] = v
        # encoder -> decoder mirror (SwinUnet.py:1090-1095)
        if key.startswith("swin_unet.layers."):
            layer_num = 3 - int(key[len("swin_unet.layers.")])
            sd[f"swin_unet.layers_up.{layer_num}" + key[len("swin_unet.layers.0"):]] = v

    params = jax.tree.map(np.asarray, params)
    name_map = _swinunet_name_map(depths)
    loaded, skipped = 0, 0
    for tname, (ours, kind) in name_map.items():
        if tname not in sd:
            continue
        t = sd[tname]
        if kind == "conv_w":
            t = _conv_w(t)
        elif kind == "lin_w":
            t = _lin_w(t)
        node = params
        parts = ours.split("/")
        for p in parts[:-1]:
            node = node[p]
        if node[parts[-1]].shape != t.shape:
            skipped += 1  # reference deletes shape-mismatched keys (:1098-1100)
            continue
        node[parts[-1]] = t.astype(np.float32)
        loaded += 1
    print(f"load_swinunet_pretrained: loaded {loaded} tensors, "
          f"skipped {skipped} shape mismatches")
    return params


_Q = "MultiHeadDotProductAttention_1/query"
_K = "MultiHeadDotProductAttention_1/key"
_V = "MultiHeadDotProductAttention_1/value"
_OUT = "MultiHeadDotProductAttention_1/out"
_FC0 = "MlpBlock_3/Dense_0"
_FC1 = "MlpBlock_3/Dense_1"
_ATT_NORM = "LayerNorm_0"
_MLP_NORM = "LayerNorm_2"


def _resize_posemb(posemb: np.ndarray, n_tok_new: int) -> np.ndarray:
    """Reference: TransUnet.py:728-750 — strip the cls token if present,
    then bilinear-zoom the square grid (scipy ndimage order=1)."""
    posemb = np.asarray(posemb, np.float32)
    n_tok = posemb.shape[1]
    if n_tok == n_tok_new:
        return posemb
    if n_tok - 1 == n_tok_new:
        return posemb[:, 1:]
    grid = posemb[0, 1:] if int(np.sqrt(n_tok)) ** 2 != n_tok else posemb[0]
    gs_old = int(np.sqrt(grid.shape[0]))
    gs_new = int(np.sqrt(n_tok_new))
    assert gs_old * gs_old == grid.shape[0] and gs_new * gs_new == n_tok_new
    from scipy import ndimage

    grid = grid.reshape(gs_old, gs_old, -1)
    zoom = (gs_new / gs_old, gs_new / gs_old, 1)
    grid = ndimage.zoom(grid, zoom, order=1)
    return grid.reshape(1, n_tok_new, -1).astype(np.float32)


def _adapt_in_channels(kernel: np.ndarray, cin_new: int) -> np.ndarray:
    """Adapt an HWIO conv kernel to a different input-channel count by
    tiling and rescaling (the timm in_chans convention: sum of responses
    is preserved in expectation).

    Conscious fix vs the reference: its ResNetV2 root conv takes the 5
    input FRAMES as channels (TransUnet.py:131, StdConv2d(5, ...)), so
    its own load_from crashes copying the 3-channel ImageNet kernel
    (TransUnet.py:757) — npz loading is unusable there for the
    nowcasting config. Here the RGB kernel is inflated to C_in instead.
    """
    cin_old = kernel.shape[2]
    if cin_old == cin_new:
        return kernel
    reps = int(np.ceil(cin_new / cin_old))
    tiled = np.concatenate([kernel] * reps, axis=2)[:, :, :cin_new]
    return (tiled * (cin_old / float(cin_new))).astype(kernel.dtype)


def load_transunet_npz(
    weights: Mapping[str, np.ndarray],
    params: dict,
    block_units=(3, 4, 9),
    num_layers: int = 12,
) -> dict:
    """Return a copy of ``params`` (our TransUnet tree) with the encoder
    overwritten from a google-ViT ``.npz`` mapping (R50+ViT-B_16 layout).

    Raises KeyError on missing checkpoint entries and ValueError on
    shape mismatches (strict, like the reference's .copy_ calls).
    """
    import jax

    params = jax.tree.map(np.asarray, params)
    hidden = int(np.asarray(weights["embedding/kernel"]).shape[-1])

    def put(path, value, reshape=None):
        node = params
        for p in path.split("/")[:-1]:
            node = node[p]
        leaf = path.split("/")[-1]
        value = np.asarray(value, np.float32)
        if reshape is not None:
            value = value.reshape(reshape)
        if node[leaf].shape != value.shape:
            raise ValueError(f"{path}: ours {node[leaf].shape} vs npz {value.shape}")
        node[leaf] = value

    # patch embedding + encoder norm (TransUnet.py:722-726)
    put("patch_embeddings/kernel", weights["embedding/kernel"])
    put("patch_embeddings/bias", weights["embedding/bias"])
    put("encoder_norm/scale", weights["Transformer/encoder_norm/scale"])
    put("encoder_norm/bias", weights["Transformer/encoder_norm/bias"])

    # position embeddings with grid resize (TransUnet.py:728-750)
    n_tok_new = int(params["position_embeddings"].shape[1])
    put(
        "position_embeddings",
        _resize_posemb(np.asarray(weights["Transformer/posembed_input/pos_embedding"]), n_tok_new),
    )

    # ViT blocks (TransUnet.py:512-542)
    for i in range(num_layers):
        root = f"Transformer/encoderblock_{i}"
        blk = f"block_{i}"
        for ours, theirs in (("query", _Q), ("key", _K), ("value", _V)):
            put(f"{blk}/{ours}/kernel", weights[f"{root}/{theirs}/kernel"], (hidden, hidden))
            put(f"{blk}/{ours}/bias", weights[f"{root}/{theirs}/bias"], (hidden,))
        put(f"{blk}/out/kernel", weights[f"{root}/{_OUT}/kernel"], (hidden, hidden))
        put(f"{blk}/out/bias", weights[f"{root}/{_OUT}/bias"], (hidden,))
        put(f"{blk}/fc1/kernel", weights[f"{root}/{_FC0}/kernel"])
        put(f"{blk}/fc1/bias", weights[f"{root}/{_FC0}/bias"])
        put(f"{blk}/fc2/kernel", weights[f"{root}/{_FC1}/kernel"])
        put(f"{blk}/fc2/bias", weights[f"{root}/{_FC1}/bias"])
        put(f"{blk}/attention_norm/scale", weights[f"{root}/{_ATT_NORM}/scale"])
        put(f"{blk}/attention_norm/bias", weights[f"{root}/{_ATT_NORM}/bias"])
        put(f"{blk}/ffn_norm/scale", weights[f"{root}/{_MLP_NORM}/scale"])
        put(f"{blk}/ffn_norm/bias", weights[f"{root}/{_MLP_NORM}/bias"])

    # ResNetV2 hybrid backbone (TransUnet.py:86-120,755-765)
    root = np.asarray(weights["conv_root/kernel"], np.float32)
    cin_new = int(params["hybrid_model"]["root_conv"]["kernel"].shape[2])
    put("hybrid_model/root_conv/kernel", _adapt_in_channels(root, cin_new))
    put("hybrid_model/root_gn/weight", weights["gn_root/scale"], (-1,))
    put("hybrid_model/root_gn/bias", weights["gn_root/bias"], (-1,))
    for bi, n_units in enumerate(block_units):
        for ui in range(n_units):
            src = f"block{bi + 1}/unit{ui + 1}"
            dst = f"hybrid_model/block{bi + 1}_unit{ui + 1}"
            for c in ("conv1", "conv2", "conv3"):
                put(f"{dst}/{c}/kernel", weights[f"{src}/{c}/kernel"])
            for g in ("gn1", "gn2", "gn3"):
                put(f"{dst}/{g}/weight", weights[f"{src}/{g}/scale"], (-1,))
                put(f"{dst}/{g}/bias", weights[f"{src}/{g}/bias"], (-1,))
            if f"{src}/conv_proj/kernel" in weights:
                put(f"{dst}/downsample/kernel", weights[f"{src}/conv_proj/kernel"])
                put(f"{dst}/gn_proj/weight", weights[f"{src}/gn_proj/scale"], (-1,))
                put(f"{dst}/gn_proj/bias", weights[f"{src}/gn_proj/bias"], (-1,))
    return params
