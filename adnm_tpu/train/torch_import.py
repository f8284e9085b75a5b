"""Torch state_dict importers: load reference-format checkpoints.

The reference saves torch ``state_dict``s (train.py:174); users migrating
bring ``{model}_best.pth`` files. These converters map them onto our
NHWC flax param trees. Conventions:

  * torch conv weight (O, I, kh, kw) -> HWIO (kh, kw, I, O); grouped /
    depthwise convs keep the same group ordering under
    feature_group_count, so the pure transpose is exact;
  * torch Linear (out, in) -> (in, out);
  * BatchNorm weight/bias -> params, running_mean/var -> batch_stats.

``convert_smaat_state_dict`` covers SmaAt-UNet (reference module names
from models/SmaAt_UNet.py:302-334); the mapping is bijective, so
``export_smaat_state_dict`` produces a reference-layout dict from our
params (used by the cross-framework parity test).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv_w(t: np.ndarray) -> np.ndarray:
    return np.transpose(t, (2, 3, 1, 0))


def _conv_w_inv(k: np.ndarray) -> np.ndarray:
    return np.transpose(k, (3, 2, 0, 1))


def _lin_w(t: np.ndarray) -> np.ndarray:
    return np.transpose(t, (1, 0))


def _smaat_name_map() -> Dict[str, Tuple[str, str]]:
    """torch name -> (our dotted path, kind) with kind in
    {conv_w, bias, lin_w, bn_w, bn_b, bn_mean, bn_var}."""
    m: Dict[str, Tuple[str, str]] = {}

    def double_conv(torch_prefix, ours_prefix):
        for t_i, o_conv, o_bn in ((0, "conv1", "bn1"), (3, "conv2", "bn2")):
            m[f"{torch_prefix}.{t_i}.depthwise.weight"] = (f"{ours_prefix}/{o_conv}/depthwise/kernel", "conv_w")
            m[f"{torch_prefix}.{t_i}.depthwise.bias"] = (f"{ours_prefix}/{o_conv}/depthwise/bias", "bias")
            m[f"{torch_prefix}.{t_i}.pointwise.weight"] = (f"{ours_prefix}/{o_conv}/pointwise/kernel", "conv_w")
            m[f"{torch_prefix}.{t_i}.pointwise.bias"] = (f"{ours_prefix}/{o_conv}/pointwise/bias", "bias")
            bn_i = t_i + 1
            m[f"{torch_prefix}.{bn_i}.weight"] = (f"{ours_prefix}/{o_bn}/weight", "bn_w")
            m[f"{torch_prefix}.{bn_i}.bias"] = (f"{ours_prefix}/{o_bn}/bias", "bn_b")
            m[f"{torch_prefix}.{bn_i}.running_mean"] = (f"{ours_prefix}/{o_bn}/mean", "bn_mean")
            m[f"{torch_prefix}.{bn_i}.running_var"] = (f"{ours_prefix}/{o_bn}/var", "bn_var")

    def cbam(torch_prefix, ours_prefix):
        m[f"{torch_prefix}.channel_att.MLP.1.weight"] = (f"{ours_prefix}/channel_att/fc1/kernel", "lin_w")
        m[f"{torch_prefix}.channel_att.MLP.1.bias"] = (f"{ours_prefix}/channel_att/fc1/bias", "bias")
        m[f"{torch_prefix}.channel_att.MLP.3.weight"] = (f"{ours_prefix}/channel_att/fc2/kernel", "lin_w")
        m[f"{torch_prefix}.channel_att.MLP.3.bias"] = (f"{ours_prefix}/channel_att/fc2/bias", "bias")
        m[f"{torch_prefix}.spatial_att.conv.weight"] = (f"{ours_prefix}/spatial_att/conv/kernel", "conv_w")
        m[f"{torch_prefix}.spatial_att.bn.weight"] = (f"{ours_prefix}/spatial_att/bn/weight", "bn_w")
        m[f"{torch_prefix}.spatial_att.bn.bias"] = (f"{ours_prefix}/spatial_att/bn/bias", "bn_b")
        m[f"{torch_prefix}.spatial_att.bn.running_mean"] = (f"{ours_prefix}/spatial_att/bn/mean", "bn_mean")
        m[f"{torch_prefix}.spatial_att.bn.running_var"] = (f"{ours_prefix}/spatial_att/bn/var", "bn_var")

    double_conv("inc.double_conv", "inc")
    for i in range(1, 6):
        cbam(f"cbam{i}", f"cbam{i}")
    for i in range(1, 5):
        double_conv(f"down{i}.maxpool_conv.1.double_conv", f"down{i}")
        double_conv(f"up{i}.conv.double_conv", f"up{i}")
    m["outc.conv.weight"] = ("outc/kernel", "conv_w")
    m["outc.conv.bias"] = ("outc/bias", "bias")
    return m


def _set(tree: dict, dotted: str, value):
    parts = dotted.split("/")
    for p in parts[:-1]:
        tree = tree.setdefault(p, {})
    tree[parts[-1]] = value


def convert_smaat_state_dict(state_dict) -> Tuple[dict, dict]:
    """torch state_dict (tensors or ndarrays) -> (params, batch_stats)."""
    params: dict = {}
    stats: dict = {}
    name_map = _smaat_name_map()
    for tname, (ours, kind) in name_map.items():
        if tname not in state_dict:
            # DataParallel prefix tolerance (reference wraps in nn.DataParallel)
            tname2 = "module." + tname
            if tname2 not in state_dict:
                raise KeyError(f"missing key in state_dict: {tname}")
            tname = tname2
        t = np.asarray(state_dict[tname].numpy() if hasattr(state_dict[tname], "numpy") else state_dict[tname])
        if kind == "conv_w":
            _set(params, ours, _conv_w(t))
        elif kind == "lin_w":
            _set(params, ours, _lin_w(t))
        elif kind in ("bias", "bn_w", "bn_b"):
            _set(params, ours, t)
        elif kind in ("bn_mean", "bn_var"):
            _set(stats, ours, t)
    return params, stats


def _deconv_w(t: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (in, out, kh, kw) -> our HWIO (kh, kw, in, out)."""
    return np.transpose(t, (2, 3, 0, 1))


def _convlstm_name_map() -> Dict[str, Tuple[str, str]]:
    """ConvLSTM EF mapping (reference names from models/ConvLSTM.py:
    Encoder/Forecaster setattr naming :107-151 + specs :211-247)."""
    m: Dict[str, Tuple[str, str]] = {}
    # encoder conv stages
    m["encoder.stage1.conv1_leaky_1.weight"] = ("e1_conv/kernel", "conv_w")
    m["encoder.stage1.conv1_leaky_1.bias"] = ("e1_conv/bias", "bias")
    m["encoder.stage2.conv2_leaky_1.weight"] = ("e2_conv/kernel", "conv_w")
    m["encoder.stage2.conv2_leaky_1.bias"] = ("e2_conv/bias", "bias")
    m["encoder.stage3.conv3_leaky_1.weight"] = ("e3_conv/kernel", "conv_w")
    m["encoder.stage3.conv3_leaky_1.bias"] = ("e3_conv/bias", "bias")
    # rnn cells (encoder rnn1..3, forecaster rnn3..1)
    for t_name, o_name in (
        ("encoder.rnn1", "e_rnn1"), ("encoder.rnn2", "e_rnn2"), ("encoder.rnn3", "e_rnn3"),
        ("forecaster.rnn3", "f_rnn3"), ("forecaster.rnn2", "f_rnn2"), ("forecaster.rnn1", "f_rnn1"),
    ):
        m[f"{t_name}._conv.weight"] = (f"{o_name}/cell/conv/kernel", "conv_w")
        m[f"{t_name}._conv.bias"] = (f"{o_name}/cell/conv/bias", "bias")
        for peep in ("Wci", "Wcf", "Wco"):
            m[f"{t_name}.{peep}"] = (f"{o_name}/cell/{peep}", "peephole")
    # forecaster deconvs + head
    m["forecaster.stage3.deconv1_leaky_1.weight"] = ("f_deconv1/kernel", "deconv_w")
    m["forecaster.stage3.deconv1_leaky_1.bias"] = ("f_deconv1/bias", "bias")
    m["forecaster.stage2.deconv2_leaky_1.weight"] = ("f_deconv2/kernel", "deconv_w")
    m["forecaster.stage2.deconv2_leaky_1.bias"] = ("f_deconv2/bias", "bias")
    m["forecaster.stage1.deconv3_leaky_1.weight"] = ("f_deconv3/kernel", "deconv_w")
    m["forecaster.stage1.deconv3_leaky_1.bias"] = ("f_deconv3/bias", "bias")
    m["forecaster.stage1.conv3_leaky_2.weight"] = ("f_conv2/kernel", "conv_w")
    m["forecaster.stage1.conv3_leaky_2.bias"] = ("f_conv2/bias", "bias")
    m["forecaster.stage1.conv3_3.weight"] = ("f_conv3/kernel", "conv_w")
    m["forecaster.stage1.conv3_3.bias"] = ("f_conv3/bias", "bias")
    return m


def convert_convlstm_state_dict(state_dict) -> dict:
    """torch ConvLSTM EF state_dict -> our params tree.

    The reference's peephole weights are frozen zeros on CUDA (absent
    from the state_dict, ConvLSTM.py:26-28) — missing peepholes load as
    zeros, which reproduces the reference function exactly."""
    params: dict = {}
    for tname, (ours, kind) in _convlstm_name_map().items():
        key = tname if tname in state_dict else "module." + tname
        if key not in state_dict:
            if kind == "peephole":
                continue  # zeros by init
            raise KeyError(f"missing key in state_dict: {tname}")
        t = np.asarray(state_dict[key].numpy() if hasattr(state_dict[key], "numpy") else state_dict[key])
        if kind == "conv_w":
            _set(params, ours, _conv_w(t))
        elif kind == "deconv_w":
            _set(params, ours, _deconv_w(t))
        elif kind == "peephole":
            _set(params, ours, t[0].transpose(1, 2, 0))  # (1,C,H,W) -> (H,W,C)
        else:
            _set(params, ours, t)
    return params


def export_convlstm_state_dict(params: dict) -> dict:
    def get(tree, dotted):
        for p in dotted.split("/"):
            tree = tree[p]
        return np.asarray(tree)

    out = {}
    for tname, (ours, kind) in _convlstm_name_map().items():
        v = get(params, ours)
        if kind == "conv_w":
            out[tname] = _conv_w_inv(v)
        elif kind == "deconv_w":
            out[tname] = np.transpose(v, (2, 3, 0, 1))
        elif kind == "peephole":
            out[tname] = np.transpose(v, (2, 0, 1))[None]
        else:
            out[tname] = v
    return out


def adnssd_mixer_permutations(d_model: int, headdim: int, ngroups: int = 2, d_state: int = 16, expand: int = 2):
    """Channel permutations relating our contiguous ADN-SSD layout to the
    reference's even/odd interleave (reference: models/ADNssd.py:329-386).

    Returns (xbc_perm, head_perm) with
      ours_xBC[j] == reference_xBC[xbc_perm[j]]
      ours_dt[h]  == reference_dt[head_perm[h]]   (same for A_log, D, dt_bias)
    Used by the mixer-level parity test and a future full-ADNM importer.
    """
    d_inner = expand * d_model
    gN = ngroups * d_state
    conv_dim = d_inner + 2 * gN
    half = conv_dim // 2
    qx = d_inner // 4
    qbc = gN // 2
    perm = np.zeros(conv_dim, np.int64)
    # path1 ("even"): ours[:half] = reference even channels
    perm[:half] = 2 * np.arange(half)
    # path2 quarters [x2a | x2b | bc2a | bc2b] == [x_oe | x_oo | bc_oe | bc_oo]
    base = half
    perm[base : base + qx] = 1 + 4 * np.arange(qx)                       # x_oe = odd[::2][:qx]
    perm[base + qx : base + 2 * qx] = 3 + 4 * np.arange(qx)              # x_oo = odd[1::2][:qx]
    perm[base + 2 * qx : base + 2 * qx + qbc] = 1 + 4 * (qx + np.arange(qbc))   # bc_oe
    perm[base + 2 * qx + qbc :] = 3 + 4 * (qx + np.arange(qbc))          # bc_oo
    nheads = d_inner // headdim
    hh = nheads // 2
    head_perm = np.concatenate([2 * np.arange(hh), 2 * np.arange(hh) + 1])
    return perm, head_perm


def _swinunet_name_map(depths=(2, 2, 2, 2)) -> Dict[str, Tuple[str, str]]:
    """SwinUnet mapping (reference names from models/SwinUnet.py:
    SwinTransformerSys :884-957 under the ``swin_unet`` wrapper attr;
    decoder blocks use encoder depths — the reference quirk)."""
    m: Dict[str, Tuple[str, str]] = {}
    nl = len(depths)

    def blk(tp, op):
        m[f"{tp}.norm1.weight"] = (f"{op}/norm1/scale", "bias")
        m[f"{tp}.norm1.bias"] = (f"{op}/norm1/bias", "bias")
        m[f"{tp}.attn.relative_position_bias_table"] = (f"{op}/attn/relative_position_bias_table", "bias")
        m[f"{tp}.attn.qkv.weight"] = (f"{op}/attn/qkv/kernel", "lin_w")
        m[f"{tp}.attn.qkv.bias"] = (f"{op}/attn/qkv/bias", "bias")
        m[f"{tp}.attn.proj.weight"] = (f"{op}/attn/proj/kernel", "lin_w")
        m[f"{tp}.attn.proj.bias"] = (f"{op}/attn/proj/bias", "bias")
        m[f"{tp}.norm2.weight"] = (f"{op}/norm2/scale", "bias")
        m[f"{tp}.norm2.bias"] = (f"{op}/norm2/bias", "bias")
        m[f"{tp}.mlp.fc1.weight"] = (f"{op}/fc1/kernel", "lin_w")
        m[f"{tp}.mlp.fc1.bias"] = (f"{op}/fc1/bias", "bias")
        m[f"{tp}.mlp.fc2.weight"] = (f"{op}/fc2/kernel", "lin_w")
        m[f"{tp}.mlp.fc2.bias"] = (f"{op}/fc2/bias", "bias")

    S = "swin_unet"
    m[f"{S}.patch_embed.proj.weight"] = (f"{S}/patch_embed_proj/kernel", "conv_w")
    m[f"{S}.patch_embed.proj.bias"] = (f"{S}/patch_embed_proj/bias", "bias")
    m[f"{S}.patch_embed.norm.weight"] = (f"{S}/patch_embed_norm/scale", "bias")
    m[f"{S}.patch_embed.norm.bias"] = (f"{S}/patch_embed_norm/bias", "bias")
    for l in range(nl):
        for i in range(depths[l]):
            blk(f"{S}.layers.{l}.blocks.{i}", f"{S}/layer{l}_blk{i}")
        if l < nl - 1:
            m[f"{S}.layers.{l}.downsample.reduction.weight"] = (f"{S}/merge{l}/reduction/kernel", "lin_w")
            m[f"{S}.layers.{l}.downsample.norm.weight"] = (f"{S}/merge{l}/norm/scale", "bias")
            m[f"{S}.layers.{l}.downsample.norm.bias"] = (f"{S}/merge{l}/norm/bias", "bias")
    # decoder
    m[f"{S}.layers_up.0.expand.weight"] = (f"{S}/up0/expand/kernel", "lin_w")
    m[f"{S}.layers_up.0.norm.weight"] = (f"{S}/up0/norm/scale", "bias")
    m[f"{S}.layers_up.0.norm.bias"] = (f"{S}/up0/norm/bias", "bias")
    for l in range(1, nl):
        inv = nl - 1 - l
        for i in range(depths[inv]):
            blk(f"{S}.layers_up.{l}.blocks.{i}", f"{S}/layer_up{l}_blk{i}")
        m[f"{S}.concat_back_dim.{l}.weight"] = (f"{S}/concat_back_dim{l}/kernel", "lin_w")
        m[f"{S}.concat_back_dim.{l}.bias"] = (f"{S}/concat_back_dim{l}/bias", "bias")
        if l < nl - 1:
            m[f"{S}.layers_up.{l}.upsample.expand.weight"] = (f"{S}/up{l}/expand/kernel", "lin_w")
            m[f"{S}.layers_up.{l}.upsample.norm.weight"] = (f"{S}/up{l}/norm/scale", "bias")
            m[f"{S}.layers_up.{l}.upsample.norm.bias"] = (f"{S}/up{l}/norm/bias", "bias")
    for nm, onm in (("norm", "norm"), ("norm_up", "norm_up")):
        m[f"{S}.{nm}.weight"] = (f"{S}/{onm}/scale", "bias")
        m[f"{S}.{nm}.bias"] = (f"{S}/{onm}/bias", "bias")
    m[f"{S}.up.expand.weight"] = (f"{S}/up_final/expand/kernel", "lin_w")
    m[f"{S}.up.norm.weight"] = (f"{S}/up_final/norm/scale", "bias")
    m[f"{S}.up.norm.bias"] = (f"{S}/up_final/norm/bias", "bias")
    m[f"{S}.output.weight"] = (f"{S}/output/kernel", "conv_w")
    return m


def convert_swinunet_state_dict(state_dict, depths=(2, 2, 2, 2)) -> dict:
    params: dict = {}
    for tname, (ours, kind) in _swinunet_name_map(depths).items():
        key = tname if tname in state_dict else "module." + tname
        if key not in state_dict:
            raise KeyError(f"missing key in state_dict: {tname}")
        t = np.asarray(state_dict[key].numpy() if hasattr(state_dict[key], "numpy") else state_dict[key])
        if kind == "conv_w":
            _set(params, ours, _conv_w(t))
        elif kind == "lin_w":
            _set(params, ours, _lin_w(t))
        else:
            _set(params, ours, t)
    return params


def export_swinunet_state_dict(params: dict, depths=(2, 2, 2, 2)) -> dict:
    def get(tree, dotted):
        for p in dotted.split("/"):
            tree = tree[p]
        return np.asarray(tree)

    out = {}
    for tname, (ours, kind) in _swinunet_name_map(depths).items():
        v = get(params, ours)
        if kind == "conv_w":
            out[tname] = _conv_w_inv(v)
        elif kind == "lin_w":
            out[tname] = np.transpose(v, (1, 0))
        else:
            out[tname] = v
    return out


def _transunet_name_map(block_units=(3, 4, 9), num_layers=12) -> Dict[str, Tuple[str, str]]:
    """TransUnet mapping (reference names from models/TransUnet.py:
    ResNetV2 :122-150, ViT Encoder :550-567, DecoderCup :649-676,
    SegmentationHead :641-646)."""
    m: Dict[str, Tuple[str, str]] = {}
    E = "transformer.embeddings"
    m[f"{E}.hybrid_model.root.conv.weight"] = ("hybrid_model/root_conv/kernel", "conv_w")
    m[f"{E}.hybrid_model.root.gn.weight"] = ("hybrid_model/root_gn/weight", "bias")
    m[f"{E}.hybrid_model.root.gn.bias"] = ("hybrid_model/root_gn/bias", "bias")
    for bi, units in enumerate(block_units):
        for ui in range(units):
            tp = f"{E}.hybrid_model.body.block{bi + 1}.unit{ui + 1}"
            op = f"hybrid_model/block{bi + 1}_unit{ui + 1}"
            for conv in ("conv1", "conv2", "conv3"):
                m[f"{tp}.{conv}.weight"] = (f"{op}/{conv}/kernel", "conv_w")
            for gn in ("gn1", "gn2", "gn3"):
                m[f"{tp}.{gn}.weight"] = (f"{op}/{gn}/weight", "bias")
                m[f"{tp}.{gn}.bias"] = (f"{op}/{gn}/bias", "bias")
            if ui == 0:  # projection shortcut (stride or width change)
                m[f"{tp}.downsample.weight"] = (f"{op}/downsample/kernel", "conv_w")
                m[f"{tp}.gn_proj.weight"] = (f"{op}/gn_proj/weight", "bias")
                m[f"{tp}.gn_proj.bias"] = (f"{op}/gn_proj/bias", "bias")
    m[f"{E}.patch_embeddings.weight"] = ("patch_embeddings/kernel", "conv_w")
    m[f"{E}.patch_embeddings.bias"] = ("patch_embeddings/bias", "bias")
    m[f"{E}.position_embeddings"] = ("position_embeddings", "bias")
    for i in range(num_layers):
        tp = f"transformer.encoder.layer.{i}"
        op = f"block_{i}"
        for nm in ("attention_norm", "ffn_norm"):
            m[f"{tp}.{nm}.weight"] = (f"{op}/{nm}/scale", "bias")
            m[f"{tp}.{nm}.bias"] = (f"{op}/{nm}/bias", "bias")
        for lin_t, lin_o in (("attn.query", "query"), ("attn.key", "key"),
                             ("attn.value", "value"), ("attn.out", "out"),
                             ("ffn.fc1", "fc1"), ("ffn.fc2", "fc2")):
            m[f"{tp}.{lin_t}.weight"] = (f"{op}/{lin_o}/kernel", "lin_w")
            m[f"{tp}.{lin_t}.bias"] = (f"{op}/{lin_o}/bias", "bias")
    m["transformer.encoder.encoder_norm.weight"] = ("encoder_norm/scale", "bias")
    m["transformer.encoder.encoder_norm.bias"] = ("encoder_norm/bias", "bias")
    # DecoderCup: Conv2dReLU is Sequential(conv, bn, relu)
    def conv2drelu(tp, op):
        m[f"{tp}.0.weight"] = (f"{op}/conv/kernel", "conv_w")
        m[f"{tp}.1.weight"] = (f"{op}/bn/weight", "bn_w")
        m[f"{tp}.1.bias"] = (f"{op}/bn/bias", "bn_b")
        m[f"{tp}.1.running_mean"] = (f"{op}/bn/mean", "bn_mean")
        m[f"{tp}.1.running_var"] = (f"{op}/bn/var", "bn_var")

    conv2drelu("decoder.conv_more", "conv_more")
    for i in range(4):
        conv2drelu(f"decoder.blocks.{i}.conv1", f"dec{i}_conv1")
        conv2drelu(f"decoder.blocks.{i}.conv2", f"dec{i}_conv2")
    m["segmentation_head.0.weight"] = ("segmentation_head/kernel", "conv_w")
    m["segmentation_head.0.bias"] = ("segmentation_head/bias", "bias")
    return m


def convert_transunet_state_dict(state_dict, block_units=(3, 4, 9), num_layers=12) -> Tuple[dict, dict]:
    params: dict = {}
    stats: dict = {}
    for tname, (ours, kind) in _transunet_name_map(block_units, num_layers).items():
        key = tname if tname in state_dict else "module." + tname
        if key not in state_dict:
            raise KeyError(f"missing key in state_dict: {tname}")
        t = np.asarray(state_dict[key].numpy() if hasattr(state_dict[key], "numpy") else state_dict[key])
        if kind == "conv_w":
            _set(params, ours, _conv_w(t))
        elif kind == "lin_w":
            _set(params, ours, _lin_w(t))
        elif kind in ("bn_mean", "bn_var"):
            _set(stats, ours, t)
        else:
            _set(params, ours, t)
    return params, stats


def export_transunet_state_dict(params: dict, batch_stats: dict, block_units=(3, 4, 9), num_layers=12) -> dict:
    def get(tree, dotted):
        for p in dotted.split("/"):
            tree = tree[p]
        return np.asarray(tree)

    out = {}
    for tname, (ours, kind) in _transunet_name_map(block_units, num_layers).items():
        if kind == "conv_w":
            out[tname] = _conv_w_inv(get(params, ours))
        elif kind == "lin_w":
            out[tname] = np.transpose(get(params, ours), (1, 0))
        elif kind in ("bn_mean", "bn_var"):
            out[tname] = get(batch_stats, ours)
        else:
            out[tname] = get(params, ours)
    return out


def _trajgru_name_map() -> Dict[str, Tuple[str, str]]:
    """TrajGRU EF mapping (reference names from models/TrajGRU.py:
    same Encoder/Forecaster scaffold as ConvLSTM + per-cell i2h/flow/ret
    convs, TrajGRU.py:110-145).

    The reference instantiates i2h/i2f_conv1 on every cell but the
    forecaster's first rnn never receives inputs, so those torch keys
    are unused there; our flax tree only materializes used params, so
    they are intentionally absent from the map for f_rnn3."""
    m: Dict[str, Tuple[str, str]] = {}
    m["encoder.stage1.conv1_leaky_1.weight"] = ("e1_conv/kernel", "conv_w")
    m["encoder.stage1.conv1_leaky_1.bias"] = ("e1_conv/bias", "bias")
    m["encoder.stage2.conv2_leaky_1.weight"] = ("e2_conv/kernel", "conv_w")
    m["encoder.stage2.conv2_leaky_1.bias"] = ("e2_conv/bias", "bias")
    m["encoder.stage3.conv3_leaky_1.weight"] = ("e3_conv/kernel", "conv_w")
    m["encoder.stage3.conv3_leaky_1.bias"] = ("e3_conv/bias", "bias")
    cells = [
        ("encoder.rnn1", "e_rnn1", True), ("encoder.rnn2", "e_rnn2", True),
        ("encoder.rnn3", "e_rnn3", True),
        ("forecaster.rnn3", "f_rnn3", False),  # rollout cell: no inputs
        ("forecaster.rnn2", "f_rnn2", True), ("forecaster.rnn1", "f_rnn1", True),
    ]
    for t_name, o_name, has_inputs in cells:
        if has_inputs:
            m[f"{t_name}.i2h.weight"] = (f"{o_name}/i2h/kernel", "conv_w")
            m[f"{t_name}.i2h.bias"] = (f"{o_name}/i2h/bias", "bias")
            m[f"{t_name}.i2f_conv1.weight"] = (f"{o_name}/cell/i2f_conv1/kernel", "conv_w")
            m[f"{t_name}.i2f_conv1.bias"] = (f"{o_name}/cell/i2f_conv1/bias", "bias")
        m[f"{t_name}.h2f_conv1.weight"] = (f"{o_name}/cell/h2f_conv1/kernel", "conv_w")
        m[f"{t_name}.h2f_conv1.bias"] = (f"{o_name}/cell/h2f_conv1/bias", "bias")
        m[f"{t_name}.flows_conv.weight"] = (f"{o_name}/cell/flows_conv/kernel", "conv_w")
        m[f"{t_name}.flows_conv.bias"] = (f"{o_name}/cell/flows_conv/bias", "bias")
        m[f"{t_name}.ret.weight"] = (f"{o_name}/cell/ret/kernel", "conv_w")
        m[f"{t_name}.ret.bias"] = (f"{o_name}/cell/ret/bias", "bias")
    m["forecaster.stage3.deconv1_leaky_1.weight"] = ("f_deconv1/kernel", "deconv_w")
    m["forecaster.stage3.deconv1_leaky_1.bias"] = ("f_deconv1/bias", "bias")
    m["forecaster.stage2.deconv2_leaky_1.weight"] = ("f_deconv2/kernel", "deconv_w")
    m["forecaster.stage2.deconv2_leaky_1.bias"] = ("f_deconv2/bias", "bias")
    m["forecaster.stage1.deconv3_leaky_1.weight"] = ("f_deconv3/kernel", "deconv_w")
    m["forecaster.stage1.deconv3_leaky_1.bias"] = ("f_deconv3/bias", "bias")
    m["forecaster.stage1.conv3_leaky_2.weight"] = ("f_conv2/kernel", "conv_w")
    m["forecaster.stage1.conv3_leaky_2.bias"] = ("f_conv2/bias", "bias")
    m["forecaster.stage1.conv3_3.weight"] = ("f_conv3/kernel", "conv_w")
    m["forecaster.stage1.conv3_3.bias"] = ("f_conv3/bias", "bias")
    return m


def convert_trajgru_state_dict(state_dict) -> dict:
    params: dict = {}
    for tname, (ours, kind) in _trajgru_name_map().items():
        key = tname if tname in state_dict else "module." + tname
        if key not in state_dict:
            raise KeyError(f"missing key in state_dict: {tname}")
        t = np.asarray(state_dict[key].numpy() if hasattr(state_dict[key], "numpy") else state_dict[key])
        if kind == "conv_w":
            _set(params, ours, _conv_w(t))
        elif kind == "deconv_w":
            _set(params, ours, _deconv_w(t))
        else:
            _set(params, ours, t)
    return params


def export_trajgru_state_dict(params: dict) -> dict:
    def get(tree, dotted):
        for p in dotted.split("/"):
            tree = tree[p]
        return np.asarray(tree)

    out = {}
    for tname, (ours, kind) in _trajgru_name_map().items():
        v = get(params, ours)
        if kind == "conv_w":
            out[tname] = _conv_w_inv(v)
        elif kind == "deconv_w":
            out[tname] = np.transpose(v, (2, 3, 0, 1))
        else:
            out[tname] = v
    return out


def _lptqpn_name_map(num_blocks=(4, 6, 6, 8), num_refinement_blocks=2) -> Dict[str, Tuple[str, str]]:
    """LPTQPN mapping (reference names from models/LPTQPN.py:205-262).

    torch decoder_levels[0/1/2] are our dec1/dec2/dec3; torch
    upsamples[0/1/2] are our up1/up2/up3 (forward indexes them from the
    end, LPTQPN.py:279-289)."""
    m: Dict[str, Tuple[str, str]] = {}

    def block(tp, op):
        m[f"{tp}.norm1.body.weight"] = (f"{op}/norm1/weight", "bias")
        m[f"{tp}.attn.temperature"] = (f"{op}/attn/temperature", "temp")
        m[f"{tp}.attn.qkv.weight"] = (f"{op}/attn/qkv/kernel", "conv_w")
        m[f"{tp}.attn.qkv_dwconv.weight"] = (f"{op}/attn/qkv_dwconv/kernel", "conv_w")
        m[f"{tp}.attn.project_out.weight"] = (f"{op}/attn/project_out/kernel", "conv_w")
        m[f"{tp}.norm2.body.weight"] = (f"{op}/norm2/weight", "bias")
        m[f"{tp}.ffn.project_in.weight"] = (f"{op}/ffn/project_in/kernel", "conv_w")
        m[f"{tp}.ffn.dwconv.weight"] = (f"{op}/ffn/dwconv/kernel", "conv_w")
        m[f"{tp}.ffn.project_out.weight"] = (f"{op}/ffn/project_out/kernel", "conv_w")

    m["patch_embed.proj.weight"] = ("patch_embed/kernel", "conv_w")
    for lvl in range(3):
        for j in range(num_blocks[lvl]):
            block(f"encoder_levels.{lvl}.{j}", f"enc{lvl + 1}_{j}")
            block(f"decoder_levels.{lvl}.{j}", f"dec{lvl + 1}_{j}")
        m[f"downsamples.{lvl}.body.0.weight"] = (f"down{lvl + 1}/kernel", "conv_w")
        m[f"upsamples.{lvl}.body.0.weight"] = (f"up{lvl + 1}/kernel", "conv_w")
    for j in range(num_blocks[3]):
        block(f"central.{j}", f"central_{j}")
    for j in range(num_refinement_blocks):
        block(f"refinement.{j}", f"refine_{j}")
    m["reduce_chan_level3.weight"] = ("reduce_chan_level3/kernel", "conv_w")
    m["reduce_chan_level2.weight"] = ("reduce_chan_level2/kernel", "conv_w")
    m["output.weight"] = ("output/kernel", "conv_w")
    m["last.0.weight"] = ("last_conv/kernel", "conv_w")
    m["last.0.bias"] = ("last_conv/bias", "bias")
    m["last.1.beta"] = ("last_swish/beta", "scalar")
    return m


def convert_lptqpn_state_dict(state_dict, num_blocks=(4, 6, 6, 8), num_refinement_blocks=2) -> dict:
    params: dict = {}
    for tname, (ours, kind) in _lptqpn_name_map(num_blocks, num_refinement_blocks).items():
        key = tname if tname in state_dict else "module." + tname
        if key not in state_dict:
            raise KeyError(f"missing key in state_dict: {tname}")
        t = np.asarray(state_dict[key].numpy() if hasattr(state_dict[key], "numpy") else state_dict[key])
        if kind == "conv_w":
            _set(params, ours, _conv_w(t))
        elif kind == "temp":
            _set(params, ours, t.reshape(-1))
        elif kind == "scalar":
            _set(params, ours, t.reshape(()))
        else:
            _set(params, ours, t)
    return params


def export_lptqpn_state_dict(params: dict, num_blocks=(4, 6, 6, 8), num_refinement_blocks=2) -> dict:
    def get(tree, dotted):
        for p in dotted.split("/"):
            tree = tree[p]
        return np.asarray(tree)

    out = {}
    for tname, (ours, kind) in _lptqpn_name_map(num_blocks, num_refinement_blocks).items():
        v = get(params, ours)
        if kind == "conv_w":
            out[tname] = _conv_w_inv(v)
        elif kind == "temp":
            out[tname] = v.reshape(-1, 1, 1)
        elif kind == "scalar":
            out[tname] = v.reshape(())
        else:
            out[tname] = v
    return out


def export_smaat_state_dict(params: dict, batch_stats: dict) -> dict:
    """Inverse of convert_smaat_state_dict (for round-trip tests)."""

    def get(tree, dotted):
        for p in dotted.split("/"):
            tree = tree[p]
        return np.asarray(tree)

    out = {}
    for tname, (ours, kind) in _smaat_name_map().items():
        if kind == "conv_w":
            out[tname] = _conv_w_inv(get(params, ours))
        elif kind == "lin_w":
            out[tname] = np.transpose(get(params, ours), (1, 0))
        elif kind in ("bias", "bn_w", "bn_b"):
            out[tname] = get(params, ours)
        else:
            out[tname] = get(batch_stats, ours)
    return out
