"""TransUnet cross-framework parity: functional torch execution of
exported weights (StdConv weight standardization, pre-act bottlenecks,
ViT, DecoderCup) vs our NHWC model, plus converter round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from adnm_tpu.models.trans_unet import TransUnet  # noqa: E402
from adnm_tpu.train.torch_import import (  # noqa: E402
    convert_transunet_state_dict,
    export_transunet_state_dict,
)


def _t(sd, name):
    return torch.from_numpy(np.ascontiguousarray(sd[name]))


def torch_transunet_forward(sd, x_np, cfg):
    hidden, num_layers, heads, mlp_dim, dec_ch, n_skip = cfg

    def stdconv(v, p, stride=1, pad=0):
        w = _t(sd, f"{p}.weight")
        var, mean = torch.var_mean(w, dim=[1, 2, 3], keepdim=True, unbiased=False)
        w = (w - mean) / torch.sqrt(var + 1e-5)
        return F.conv2d(v, w, None, stride=stride, padding=pad)

    def gn(v, p, groups=32, eps=1e-6):
        return F.group_norm(v, groups, _t(sd, f"{p}.weight"), _t(sd, f"{p}.bias"), eps=eps)

    def bottleneck(v, p, stride, has_proj):
        if has_proj:
            res = gn(stdconv(v, f"{p}.downsample", stride=stride), f"{p}.gn_proj",
                     groups=_t(sd, f"{p}.gn_proj.weight").shape[0], eps=1e-5)
        else:
            res = v
        y = F.relu(gn(stdconv(v, f"{p}.conv1"), f"{p}.gn1"))
        y = F.relu(gn(stdconv(y, f"{p}.conv2", stride=stride, pad=1), f"{p}.gn2"))
        y = gn(stdconv(y, f"{p}.conv3"), f"{p}.gn3")
        return F.relu(res + y)

    x = torch.from_numpy(x_np)
    in_size = x.shape[2]
    E = "transformer.embeddings"
    v = F.relu(gn(stdconv(x, f"{E}.hybrid_model.root.conv", stride=2, pad=3), f"{E}.hybrid_model.root.gn"))
    features = [v]
    v = F.max_pool2d(v, 3, 2)
    block_units = (3, 4, 9)
    for bi, units in enumerate(block_units):
        for ui in range(units):
            p = f"{E}.hybrid_model.body.block{bi + 1}.unit{ui + 1}"
            v = bottleneck(v, p, stride=2 if (ui == 0 and bi > 0) else 1, has_proj=(ui == 0))
        if bi < 2:
            right = in_size // 4 // (bi + 1)
            if v.shape[2] != right:
                pad = right - v.shape[2]
                feat = F.pad(v, (0, pad, 0, pad))
            else:
                feat = v
            features.append(feat)
    skips = features[::-1]

    y = F.conv2d(v, _t(sd, f"{E}.patch_embeddings.weight"), _t(sd, f"{E}.patch_embeddings.bias"))
    b, c, gh, gw = y.shape
    y = y.flatten(2).transpose(1, 2) + _t(sd, f"{E}.position_embeddings")

    def ln(v, p):
        return F.layer_norm(v, (hidden,), _t(sd, f"{p}.weight"), _t(sd, f"{p}.bias"), eps=1e-6)

    hd = hidden // heads
    for i in range(num_layers):
        p = f"transformer.encoder.layer.{i}"
        h0 = y
        z = ln(y, f"{p}.attention_norm")
        q = F.linear(z, _t(sd, f"{p}.attn.query.weight"), _t(sd, f"{p}.attn.query.bias"))
        k = F.linear(z, _t(sd, f"{p}.attn.key.weight"), _t(sd, f"{p}.attn.key.bias"))
        vv = F.linear(z, _t(sd, f"{p}.attn.value.weight"), _t(sd, f"{p}.attn.value.bias"))

        def sh(t):
            return t.view(b, -1, heads, hd).permute(0, 2, 1, 3)

        att = torch.softmax(sh(q) @ sh(k).transpose(-1, -2) / (hd ** 0.5), dim=-1)
        o = (att @ sh(vv)).permute(0, 2, 1, 3).reshape(b, -1, hidden)
        y = h0 + F.linear(o, _t(sd, f"{p}.attn.out.weight"), _t(sd, f"{p}.attn.out.bias"))
        h0 = y
        z = ln(y, f"{p}.ffn_norm")
        z = F.gelu(F.linear(z, _t(sd, f"{p}.ffn.fc1.weight"), _t(sd, f"{p}.ffn.fc1.bias")))
        y = h0 + F.linear(z, _t(sd, f"{p}.ffn.fc2.weight"), _t(sd, f"{p}.ffn.fc2.bias"))
    y = ln(y, "transformer.encoder.encoder_norm")

    def conv2drelu(v, p):
        v = F.conv2d(v, _t(sd, f"{p}.0.weight"), None, padding=1)
        v = F.batch_norm(v, _t(sd, f"{p}.1.running_mean"), _t(sd, f"{p}.1.running_var"),
                         _t(sd, f"{p}.1.weight"), _t(sd, f"{p}.1.bias"), training=False, eps=1e-5)
        return F.relu(v)

    y = y.permute(0, 2, 1).reshape(b, hidden, gh, gw)
    y = conv2drelu(y, "decoder.conv_more")
    for i in range(4):
        y = F.interpolate(y, scale_factor=2, mode="bilinear", align_corners=True)
        if i < n_skip:
            y = torch.cat([y, skips[i]], dim=1)
        y = conv2drelu(y, f"decoder.blocks.{i}.conv1")
        y = conv2drelu(y, f"decoder.blocks.{i}.conv2")
    return F.conv2d(y, _t(sd, "segmentation_head.0.weight"), _t(sd, "segmentation_head.0.bias"), padding=1).numpy()


class TestTransUnetCrossFramework:
    def test_forward_parity_and_roundtrip(self):
        hidden, layers, heads, mlp = 32, 2, 4, 64
        model = TransUnet(n_classes=3, img_size=64, hidden=hidden, num_layers=layers,
                          heads=heads, mlp_dim=mlp, decoder_channels=(16, 16, 16, 8))
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 5, 1, 64, 64))
        rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
        variables = jax.jit(model.init, static_argnames=("train",))(rngs, x, train=False)
        params = jax.device_get(variables["params"])
        stats = jax.device_get(variables["batch_stats"])
        sd = export_transunet_state_dict(params, stats, num_layers=layers)
        with torch.no_grad():
            y_torch = torch_transunet_forward(
                sd, np.asarray(x[:, :, 0]), (hidden, layers, heads, mlp, (16, 16, 16, 8), 3)
            )
        y_ours = np.asarray(model.apply(variables, x, train=False))[:, :, 0]
        np.testing.assert_allclose(y_ours, y_torch, rtol=2e-3, atol=5e-4)

        p2, s2 = convert_transunet_state_dict(sd, num_layers=layers)
        for a, b2 in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))
        for a, b2 in zip(jax.tree.leaves(stats), jax.tree.leaves(s2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))
