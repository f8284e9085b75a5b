"""SwinUnet cross-framework parity: functional torch execution of
exported weights (shifted-window attention, relative position bias,
patch merge/expand) vs our model, plus converter round-trip."""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from adnm_tpu.models.swin_unet import (  # noqa: E402
    SwinUnet,
    _relative_position_index,
    _shift_attn_mask,
)
from adnm_tpu.train.torch_import import (  # noqa: E402
    convert_swinunet_state_dict,
    export_swinunet_state_dict,
)


def _t(sd, name):
    return torch.from_numpy(np.ascontiguousarray(sd[name]))


def torch_swin_forward(sd, x_np, img_size, num_classes, embed_dim=96,
                       depths=(2, 2, 2, 2), num_heads=(3, 6, 12, 24), window=8):
    S = "swin_unet"
    pr = img_size // 4
    nl = len(depths)

    def ln(v, p):
        return F.layer_norm(v, (v.shape[-1],), _t(sd, f"{p}.weight"), _t(sd, f"{p}.bias"), eps=1e-5)

    def win_part(v, ws):
        b, h, w, c = v.shape
        v = v.view(b, h // ws, ws, w // ws, ws, c)
        return v.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)

    def win_rev(wins, ws, h, w):
        b = wins.shape[0] // ((h // ws) * (w // ws))
        v = wins.view(b, h // ws, w // ws, ws, ws, -1)
        return v.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)

    def block(v, p, res, heads):
        h, w = res
        ws, shift_base = window, window // 2
        blk_idx = int(p.rsplit(".", 1)[1])
        shift = 0 if blk_idx % 2 == 0 else shift_base
        if min(h, w) <= ws:
            shift = 0
            ws_eff = min(h, w)
        else:
            ws_eff = ws
        b, l, c = v.shape
        shortcut = v
        z = ln(v, f"{p}.norm1").view(b, h, w, c)
        if shift > 0:
            z = torch.roll(z, (-shift, -shift), dims=(1, 2))
            mask = torch.from_numpy(_shift_attn_mask(h, w, ws_eff, shift))
        else:
            mask = None
        zw = win_part(z, ws_eff)
        b_, n, _ = zw.shape
        hd = c // heads
        qkv = F.linear(zw, _t(sd, f"{p}.attn.qkv.weight"), _t(sd, f"{p}.attn.qkv.bias"))
        qkv = qkv.reshape(b_, n, 3, heads, hd).permute(2, 0, 3, 1, 4)
        q, k, vv = qkv[0], qkv[1], qkv[2]
        att = (q * hd ** -0.5) @ k.transpose(-2, -1)
        table = _t(sd, f"{p}.attn.relative_position_bias_table")
        idx = torch.from_numpy(_relative_position_index(ws_eff)).reshape(-1)
        bias = table[idx].reshape(n, n, heads).permute(2, 0, 1)
        att = att + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            att = att.view(b_ // nw, nw, heads, n, n) + mask.unsqueeze(1).unsqueeze(0)
            att = att.view(-1, heads, n, n)
        att = torch.softmax(att, dim=-1)
        o = (att @ vv).transpose(1, 2).reshape(b_, n, c)
        o = F.linear(o, _t(sd, f"{p}.attn.proj.weight"), _t(sd, f"{p}.attn.proj.bias"))
        o = win_rev(o, ws_eff, h, w)
        if shift > 0:
            o = torch.roll(o, (shift, shift), dims=(1, 2))
        v = shortcut + o.reshape(b, l, c)
        z = ln(v, f"{p}.norm2")
        z = F.gelu(F.linear(z, _t(sd, f"{p}.mlp.fc1.weight"), _t(sd, f"{p}.mlp.fc1.bias")))
        z = F.linear(z, _t(sd, f"{p}.mlp.fc2.weight"), _t(sd, f"{p}.mlp.fc2.bias"))
        return v + z

    x = torch.from_numpy(x_np)
    v = F.conv2d(x, _t(sd, f"{S}.patch_embed.proj.weight"), _t(sd, f"{S}.patch_embed.proj.bias"), stride=4)
    b = v.shape[0]
    v = v.flatten(2).transpose(1, 2)
    v = ln(v, f"{S}.patch_embed.norm")

    skips = []
    for l in range(nl):
        res = (pr // (2 ** l), pr // (2 ** l))
        skips.append(v)
        for i in range(depths[l]):
            v = block(v, f"{S}.layers.{l}.blocks.{i}", res, num_heads[l])
        if l < nl - 1:
            h, w = res
            c = v.shape[-1]
            z = v.view(b, h, w, c)
            z = torch.cat([z[:, 0::2, 0::2], z[:, 1::2, 0::2], z[:, 0::2, 1::2], z[:, 1::2, 1::2]], -1)
            z = z.view(b, -1, 4 * c)
            z = ln(z, f"{S}.layers.{l}.downsample.norm")
            v = F.linear(z, _t(sd, f"{S}.layers.{l}.downsample.reduction.weight"))
    v = ln(v, f"{S}.norm")

    def patch_expand(v, p, res):
        h, w = res
        v = F.linear(v, _t(sd, f"{p}.expand.weight"))
        b, l, c = v.shape
        v = v.view(b, h, w, 2, 2, c // 4).permute(0, 1, 3, 2, 4, 5).reshape(b, -1, c // 4)
        return ln(v, f"{p}.norm")

    for l in range(nl):
        inv = nl - 1 - l
        res = (pr // (2 ** inv), pr // (2 ** inv))
        if l == 0:
            v = patch_expand(v, f"{S}.layers_up.0", res)
        else:
            v = torch.cat([v, skips[3 - l]], -1)
            v = F.linear(v, _t(sd, f"{S}.concat_back_dim.{l}.weight"), _t(sd, f"{S}.concat_back_dim.{l}.bias"))
            for i in range(depths[inv]):
                v = block(v, f"{S}.layers_up.{l}.blocks.{i}", res, num_heads[inv])
            if l < nl - 1:
                v = patch_expand(v, f"{S}.layers_up.{l}.upsample", res)
    v = ln(v, f"{S}.norm_up")

    v = F.linear(v, _t(sd, f"{S}.up.expand.weight"))
    b, l, c = v.shape
    v = v.view(b, pr, pr, 4, 4, c // 16).permute(0, 1, 3, 2, 4, 5).reshape(b, 4 * pr, 4 * pr, embed_dim)
    v = ln(v, f"{S}.up.norm")
    v = v.permute(0, 3, 1, 2)
    return F.conv2d(v, _t(sd, f"{S}.output.weight")).numpy()


class TestSwinUnetCrossFramework:
    def test_forward_parity_and_roundtrip(self):
        model = SwinUnet(num_classes=3, img_size=64)
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 5, 1, 64, 64))
        rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
        variables = jax.jit(model.init, static_argnames=("train",))(rngs, x, train=False)
        params = jax.device_get(variables["params"])
        sd = export_swinunet_state_dict(params)
        with torch.no_grad():
            y_torch = torch_swin_forward(sd, np.asarray(x[:, :, 0]), 64, 3)
        y_ours = np.asarray(model.apply(variables, x, train=False))[:, :, 0]
        np.testing.assert_allclose(y_ours, y_torch, rtol=2e-3, atol=5e-4)

        p2 = convert_swinunet_state_dict(sd)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
