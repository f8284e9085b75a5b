"""Cross-framework parity: SmaAt-UNet forward in eval mode must match a
torch functional execution of the same weights (exported via the
bijective converter), and torch->jax conversion must round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adnm_tpu.models.smaat_unet import SmaAtUNet
from adnm_tpu.train.torch_import import convert_smaat_state_dict, export_smaat_state_dict

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _t(sd, name):
    return torch.from_numpy(np.ascontiguousarray(sd[name]))


def torch_smaat_forward(sd, x_np, n_classes):
    """Functional torch execution of the SmaAt-UNet graph (eval mode),
    using reference module names; an independent oracle for our wiring."""

    def ds_conv(v, p):
        w = _t(sd, f"{p}.depthwise.weight")
        v = F.conv2d(v, w, _t(sd, f"{p}.depthwise.bias"), padding=1, groups=v.shape[1])
        return F.conv2d(v, _t(sd, f"{p}.pointwise.weight"), _t(sd, f"{p}.pointwise.bias"))

    def bn(v, p):
        return F.batch_norm(
            v, _t(sd, f"{p}.running_mean"), _t(sd, f"{p}.running_var"),
            _t(sd, f"{p}.weight"), _t(sd, f"{p}.bias"), training=False, eps=1e-5,
        )

    def double(v, p):
        v = F.relu(bn(ds_conv(v, f"{p}.0"), f"{p}.1"))
        return F.relu(bn(ds_conv(v, f"{p}.3"), f"{p}.4"))

    def cbam(v, p):
        avg = v.mean(dim=(2, 3))
        mx = v.amax(dim=(2, 3))
        w1, b1 = _t(sd, f"{p}.channel_att.MLP.1.weight"), _t(sd, f"{p}.channel_att.MLP.1.bias")
        w2, b2 = _t(sd, f"{p}.channel_att.MLP.3.weight"), _t(sd, f"{p}.channel_att.MLP.3.bias")
        gate = F.linear(F.relu(F.linear(avg, w1, b1)), w2, b2) + F.linear(
            F.relu(F.linear(mx, w1, b1)), w2, b2
        )
        v = v * torch.sigmoid(gate)[:, :, None, None]
        sp = torch.cat([v.mean(dim=1, keepdim=True), v.amax(dim=1, keepdim=True)], dim=1)
        sp = F.conv2d(sp, _t(sd, f"{p}.spatial_att.conv.weight"), None, padding=3)
        sp = bn(sp, f"{p}.spatial_att.bn")
        return v * torch.sigmoid(sp)

    x = torch.from_numpy(x_np)
    x1 = double(x, "inc.double_conv")
    x1a = cbam(x1, "cbam1")
    x2 = double(F.max_pool2d(x1, 2), "down1.maxpool_conv.1.double_conv")
    x2a = cbam(x2, "cbam2")
    x3 = double(F.max_pool2d(x2, 2), "down2.maxpool_conv.1.double_conv")
    x3a = cbam(x3, "cbam3")
    x4 = double(F.max_pool2d(x3, 2), "down3.maxpool_conv.1.double_conv")
    x4a = cbam(x4, "cbam4")
    x5 = double(F.max_pool2d(x4, 2), "down4.maxpool_conv.1.double_conv")
    x5a = cbam(x5, "cbam5")

    def up(v, skip, p):
        v = F.interpolate(v, scale_factor=2, mode="bilinear", align_corners=True)
        return double(torch.cat([skip, v], dim=1), f"{p}.conv.double_conv")

    y = up(x5a, x4a, "up1")
    y = up(y, x3a, "up2")
    y = up(y, x2a, "up3")
    y = up(y, x1a, "up4")
    return F.conv2d(y, _t(sd, "outc.conv.weight"), _t(sd, "outc.conv.bias")).numpy()


def torch_convlstm_forward(sd, x_np, t_out):
    """Functional torch execution of the ConvLSTM encoder-forecaster
    (reference graph, ConvLSTM.py:100-197) — oracle for our lax.scan
    wiring and deconv mapping. x_np: (B, T_in, 1, H, W)."""

    def leaky(v):
        return F.leaky_relu(v, 0.2)

    def cell_roll(p, xs, state, steps, in_ch, h, w, nf, batch):
        wconv = _t(sd, f"{p}._conv.weight")
        bconv = _t(sd, f"{p}._conv.bias")
        peep = {}
        for nm in ("Wci", "Wcf", "Wco"):
            key = f"{p}.{nm}"
            peep[nm] = _t(sd, key) if key in sd else torch.zeros(1, nf, h, w)
        if state is None:
            hh = torch.zeros(batch, nf, h, w)
            cc = torch.zeros(batch, nf, h, w)
        else:
            hh, cc = state
        outs = []
        for t in range(steps):
            x = xs[t] if xs is not None else torch.zeros(batch, in_ch, h, w)
            gates = F.conv2d(torch.cat([x, hh], dim=1), wconv, bconv, padding=1)
            i, f, tmp_c, o = torch.chunk(gates, 4, dim=1)
            i = torch.sigmoid(i + peep["Wci"] * cc)
            f = torch.sigmoid(f + peep["Wcf"] * cc)
            cc = f * cc + i * torch.tanh(tmp_c)
            o = torch.sigmoid(o + peep["Wco"] * cc)
            hh = o * torch.tanh(cc)
            outs.append(hh)
        return torch.stack(outs), (hh, cc)

    x = torch.from_numpy(x_np)
    b, t_in = x.shape[0], x.shape[1]
    H = x.shape[3]
    seq = x[:, :, 0].unsqueeze(2).permute(1, 0, 2, 3, 4)  # (T, B, 1, H, W)

    def apply_seq(fn, v):
        t, bb = v.shape[0], v.shape[1]
        out = fn(v.reshape(t * bb, *v.shape[2:]))
        return out.reshape(t, bb, *out.shape[1:])

    s1, s2, s3 = H // 4, H // 16, H // 32
    e1 = apply_seq(lambda v: leaky(F.conv2d(v, _t(sd, "encoder.stage1.conv1_leaky_1.weight"), _t(sd, "encoder.stage1.conv1_leaky_1.bias"), stride=4, padding=1)), seq)
    o1, st1 = cell_roll("encoder.rnn1", e1, None, t_in, 8, s1, s1, 64, b)
    e2 = apply_seq(lambda v: leaky(F.conv2d(v, _t(sd, "encoder.stage2.conv2_leaky_1.weight"), _t(sd, "encoder.stage2.conv2_leaky_1.bias"), stride=4, padding=1)), o1)
    o2, st2 = cell_roll("encoder.rnn2", e2, None, t_in, 192, s2, s2, 192, b)
    e3 = apply_seq(lambda v: leaky(F.conv2d(v, _t(sd, "encoder.stage3.conv3_leaky_1.weight"), _t(sd, "encoder.stage3.conv3_leaky_1.bias"), stride=2, padding=1)), o2)
    o3, st3 = cell_roll("encoder.rnn3", e3, None, t_in, 192, s3, s3, 192, b)

    f3, _ = cell_roll("forecaster.rnn3", None, st3, t_out, 192, s3, s3, 192, b)
    d1 = apply_seq(lambda v: leaky(F.conv_transpose2d(v, _t(sd, "forecaster.stage3.deconv1_leaky_1.weight"), _t(sd, "forecaster.stage3.deconv1_leaky_1.bias"), stride=2, padding=1)), f3)
    f2, _ = cell_roll("forecaster.rnn2", d1, st2, t_out, 192, s2, s2, 192, b)
    d2 = apply_seq(lambda v: leaky(F.conv_transpose2d(v, _t(sd, "forecaster.stage2.deconv2_leaky_1.weight"), _t(sd, "forecaster.stage2.deconv2_leaky_1.bias"), stride=4, padding=1)), f2)
    f1, _ = cell_roll("forecaster.rnn1", d2, st1, t_out, 64, s1, s1, 64, b)

    def head(v):
        v = leaky(F.conv_transpose2d(v, _t(sd, "forecaster.stage1.deconv3_leaky_1.weight"), _t(sd, "forecaster.stage1.deconv3_leaky_1.bias"), stride=4, padding=1))
        v = leaky(F.conv2d(v, _t(sd, "forecaster.stage1.conv3_leaky_2.weight"), _t(sd, "forecaster.stage1.conv3_leaky_2.bias"), padding=1))
        return F.conv2d(v, _t(sd, "forecaster.stage1.conv3_3.weight"), _t(sd, "forecaster.stage1.conv3_3.bias"))

    out = apply_seq(head, f1)  # (T_out, B, 1, H, W)
    return out.permute(1, 0, 2, 3, 4).numpy()


class TestConvLSTMCrossFramework:
    def test_forward_parity_and_roundtrip(self):
        from adnm_tpu.models.conv_lstm import create_conv_lstm
        from adnm_tpu.train.torch_import import (
            convert_convlstm_state_dict,
            export_convlstm_state_dict,
        )

        model = create_conv_lstm(3)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 5, 1, 64, 64))
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(1), x, train=False
        )
        params = jax.device_get(variables["params"])
        sd = export_convlstm_state_dict(params)
        with torch.no_grad():
            y_torch = torch_convlstm_forward(sd, np.asarray(x), 3)
        y_ours = np.asarray(model.apply(variables, x, train=False))
        np.testing.assert_allclose(y_ours, y_torch, rtol=1e-3, atol=2e-4)

        p2 = convert_convlstm_state_dict(sd)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def torch_trajgru_forward(sd, x_np, t_out):
    """Functional torch execution of the TrajGRU encoder-forecaster
    (reference graph, TrajGRU.py:150-343) incl. the grid_sample warp."""

    def leaky(v):
        return F.leaky_relu(v, 0.2)

    def wrap(inp, flow):
        B, C, H, W = inp.shape
        xx = torch.arange(W).view(1, -1).repeat(H, 1)
        yy = torch.arange(H).view(-1, 1).repeat(1, W)
        grid = torch.stack([xx, yy]).unsqueeze(0).float().repeat(B, 1, 1, 1)
        vgrid = grid + flow
        vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(W - 1, 1) - 1.0
        vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(H - 1, 1) - 1.0
        return F.grid_sample(inp, vgrid.permute(0, 2, 3, 1), align_corners=True)

    def cell_roll(p, xs, state, steps, nf, L, h, w, batch):
        if state is None:
            state = torch.zeros(batch, nf, h, w)
        i2h_seq = None
        if xs is not None:
            t, bb = xs.shape[0], xs.shape[1]
            i2h_seq = F.conv2d(
                xs.reshape(t * bb, *xs.shape[2:]),
                _t(sd, f"{p}.i2h.weight"), _t(sd, f"{p}.i2h.bias"), padding=1,
            ).reshape(t, bb, -1, h, w)
        hh = state
        outs = []
        for i in range(steps):
            f = F.conv2d(hh, _t(sd, f"{p}.h2f_conv1.weight"), _t(sd, f"{p}.h2f_conv1.bias"), padding=2)
            if xs is not None:
                f = f + F.conv2d(xs[i], _t(sd, f"{p}.i2f_conv1.weight"), _t(sd, f"{p}.i2f_conv1.bias"), padding=2)
            flows = F.conv2d(leaky(f), _t(sd, f"{p}.flows_conv.weight"), _t(sd, f"{p}.flows_conv.bias"), padding=2)
            warped = torch.cat([wrap(hh, -fl) for fl in torch.split(flows, 2, dim=1)], dim=1)
            h2h = F.conv2d(warped, _t(sd, f"{p}.ret.weight"), _t(sd, f"{p}.ret.bias"))
            hr, hu, hm = torch.split(h2h, nf, dim=1)
            if i2h_seq is not None:
                ir, iu, im = torch.split(i2h_seq[i], nf, dim=1)
                r = torch.sigmoid(ir + hr)
                u = torch.sigmoid(iu + hu)
                mem = leaky(im + r * hm)
            else:
                r = torch.sigmoid(hr)
                u = torch.sigmoid(hu)
                mem = leaky(r * hm)
            hh = u * hh + (1 - u) * mem
            outs.append(hh)
        return torch.stack(outs), hh

    x = torch.from_numpy(np.ascontiguousarray(x_np))
    b, t_in, H = x.shape[0], x.shape[1], x.shape[3]
    seq = x[:, :, 0].unsqueeze(2).permute(1, 0, 2, 3, 4)

    def apply_seq(fn, v):
        t, bb = v.shape[0], v.shape[1]
        out = fn(v.reshape(t * bb, *v.shape[2:]))
        return out.reshape(t, bb, *out.shape[1:])

    s1, s2, s3 = H // 4, H // 16, H // 32
    e1 = apply_seq(lambda v: leaky(F.conv2d(v, _t(sd, "encoder.stage1.conv1_leaky_1.weight"), _t(sd, "encoder.stage1.conv1_leaky_1.bias"), stride=4, padding=1)), seq)
    o1, st1 = cell_roll("encoder.rnn1", e1, None, t_in, 64, 13, s1, s1, b)
    e2 = apply_seq(lambda v: leaky(F.conv2d(v, _t(sd, "encoder.stage2.conv2_leaky_1.weight"), _t(sd, "encoder.stage2.conv2_leaky_1.bias"), stride=4, padding=1)), o1)
    o2, st2 = cell_roll("encoder.rnn2", e2, None, t_in, 192, 13, s2, s2, b)
    e3 = apply_seq(lambda v: leaky(F.conv2d(v, _t(sd, "encoder.stage3.conv3_leaky_1.weight"), _t(sd, "encoder.stage3.conv3_leaky_1.bias"), stride=2, padding=1)), o2)
    o3, st3 = cell_roll("encoder.rnn3", e3, None, t_in, 192, 9, s3, s3, b)

    f3, _ = cell_roll("forecaster.rnn3", None, st3, t_out, 192, 13, s3, s3, b)
    d1 = apply_seq(lambda v: leaky(F.conv_transpose2d(v, _t(sd, "forecaster.stage3.deconv1_leaky_1.weight"), _t(sd, "forecaster.stage3.deconv1_leaky_1.bias"), stride=2, padding=1)), f3)
    f2, _ = cell_roll("forecaster.rnn2", d1, st2, t_out, 192, 13, s2, s2, b)
    d2 = apply_seq(lambda v: leaky(F.conv_transpose2d(v, _t(sd, "forecaster.stage2.deconv2_leaky_1.weight"), _t(sd, "forecaster.stage2.deconv2_leaky_1.bias"), stride=4, padding=1)), f2)
    f1, _ = cell_roll("forecaster.rnn1", d2, st1, t_out, 64, 9, s1, s1, b)

    def head(v):
        v = leaky(F.conv_transpose2d(v, _t(sd, "forecaster.stage1.deconv3_leaky_1.weight"), _t(sd, "forecaster.stage1.deconv3_leaky_1.bias"), stride=4, padding=1))
        v = leaky(F.conv2d(v, _t(sd, "forecaster.stage1.conv3_leaky_2.weight"), _t(sd, "forecaster.stage1.conv3_leaky_2.bias"), padding=1))
        return F.conv2d(v, _t(sd, "forecaster.stage1.conv3_3.weight"), _t(sd, "forecaster.stage1.conv3_3.bias"))

    out = apply_seq(head, f1)
    return out.permute(1, 0, 2, 3, 4).numpy()


class TestTrajGRUCrossFramework:
    def test_forward_parity_and_roundtrip(self):
        from adnm_tpu.models.traj_gru import create_traj_gru
        from adnm_tpu.train.torch_import import (
            convert_trajgru_state_dict,
            export_trajgru_state_dict,
        )

        model = create_traj_gru(3)
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 5, 1, 64, 64))
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(1), x, train=False
        )
        params = jax.device_get(variables["params"])
        sd = export_trajgru_state_dict(params)
        with torch.no_grad():
            y_torch = torch_trajgru_forward(sd, np.asarray(x), 3)
        y_ours = np.asarray(model.apply(variables, x, train=False))
        np.testing.assert_allclose(y_ours, y_torch, rtol=2e-3, atol=5e-4)

        p2 = convert_trajgru_state_dict(sd)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def torch_lptqpn_forward(sd, x_np, dim, heads, num_blocks, n_refine, expansion=2.66):
    """Functional torch execution of LPTQPN (reference graph,
    LPTQPN.py:264-313) — oracle for pixel shuffle / sigmoid-LN /
    squared-attention wiring."""

    def to3d(v):
        b, c, h, w = v.shape
        return v.permute(0, 2, 3, 1).reshape(b, h * w, c), h, w

    def norm(v, p):
        f, h, w = to3d(v)
        mu = f.mean(-1, keepdim=True)
        var = f.var(-1, unbiased=False, keepdim=True)
        f = torch.sigmoid((f - mu) / torch.sqrt(var + 1e-5) * _t(sd, f"{p}.body.weight"))
        return f.reshape(v.shape[0], v.shape[2], v.shape[3], v.shape[1]).permute(0, 3, 1, 2)

    def attn(v, p, nh):
        b, c, h, w = v.shape
        qkv = F.conv2d(v, _t(sd, f"{p}.qkv.weight"))
        qkv = F.conv2d(qkv, _t(sd, f"{p}.qkv_dwconv.weight"), padding=1, groups=c * 3)
        q, k, vv = qkv.chunk(3, dim=1)

        def heads_(t):
            return t.reshape(b, nh, c // nh, h * w)

        q, k, vv = heads_(q), heads_(k), heads_(vv)
        q = F.normalize(q, dim=-1)
        k = F.normalize(k, dim=-1)
        a = torch.sigmoid((q @ k.transpose(-2, -1)) * _t(sd, f"{p}.temperature"))
        out = (a @ vv).reshape(b, c, h, w)
        return F.conv2d(out, _t(sd, f"{p}.project_out.weight"))

    def ffn(v, p):
        hidden = int(v.shape[1] * expansion)
        v = F.conv2d(v, _t(sd, f"{p}.project_in.weight"))
        v = F.conv2d(v, _t(sd, f"{p}.dwconv.weight"), padding=1, groups=hidden * 2)
        x1, x2 = v.chunk(2, dim=1)
        return F.conv2d(F.gelu(x1) * torch.sigmoid(x2), _t(sd, f"{p}.project_out.weight"))

    def block(v, p, nh):
        v = v + attn(norm(v, f"{p}.norm1"), f"{p}.attn", nh)
        return v + ffn(norm(v, f"{p}.norm2"), f"{p}.ffn")

    def blocks(v, p, n, nh):
        for j in range(n):
            v = block(v, f"{p}.{j}", nh)
        return v

    def down(v, p):
        v = F.conv2d(v, _t(sd, f"{p}.body.0.weight"), padding=1)
        return F.pixel_unshuffle(v, 2)

    def up(v, p):
        v = F.conv2d(v, _t(sd, f"{p}.body.0.weight"), padding=1)
        return F.pixel_shuffle(v, 2)

    inp = torch.from_numpy(x_np)  # (B, T, H, W)
    e1 = F.conv2d(inp, _t(sd, "patch_embed.proj.weight"), padding=1)
    e1 = blocks(e1, "encoder_levels.0", num_blocks[0], heads[0])
    e2 = blocks(down(e1, "downsamples.0"), "encoder_levels.1", num_blocks[1], heads[1])
    e3 = blocks(down(e2, "downsamples.1"), "encoder_levels.2", num_blocks[2], heads[2])
    central = blocks(down(e3, "downsamples.2"), "central", num_blocks[3], heads[3])

    d3 = torch.cat([up(central, "upsamples.2"), e3], dim=1)
    d3 = F.conv2d(d3, _t(sd, "reduce_chan_level3.weight"))
    d3 = blocks(d3, "decoder_levels.2", num_blocks[2], heads[2])
    d2 = torch.cat([up(d3, "upsamples.1"), e2], dim=1)
    d2 = F.conv2d(d2, _t(sd, "reduce_chan_level2.weight"))
    d2 = blocks(d2, "decoder_levels.1", num_blocks[1], heads[1])
    d1 = torch.cat([up(d2, "upsamples.0"), e1], dim=1)
    d1 = blocks(d1, "decoder_levels.0", num_blocks[0], heads[0])
    d1 = blocks(d1, "refinement", n_refine, heads[0])
    out = F.conv2d(d1, _t(sd, "output.weight"), padding=1)
    out = out + inp[:, -1].unsqueeze(1)
    out = F.conv2d(out, _t(sd, "last.0.weight"), _t(sd, "last.0.bias"), padding=1)
    return (out * torch.sigmoid(_t(sd, "last.1.beta") * out)).numpy()


class TestLPTQPNCrossFramework:
    def test_forward_parity_and_roundtrip(self):
        from adnm_tpu.models.lptqpn import LPTQPN
        from adnm_tpu.train.torch_import import (
            convert_lptqpn_state_dict,
            export_lptqpn_state_dict,
        )

        nb, nr, heads = (1, 1, 1, 1), 1, (1, 2, 4, 8)
        model = LPTQPN(inp_channels=5, out_channels=3, dim=8, num_blocks=nb,
                       num_refinement_blocks=nr, heads=heads)
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 5, 1, 32, 32))
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(1), x, train=False
        )
        params = jax.device_get(variables["params"])
        sd = export_lptqpn_state_dict(params, nb, nr)
        with torch.no_grad():
            y_torch = torch_lptqpn_forward(sd, np.asarray(x[:, :, 0]), 8, heads, nb, nr)
        y_ours = np.asarray(model.apply(variables, x, train=False))[:, :, 0]
        np.testing.assert_allclose(y_ours, y_torch, rtol=1e-3, atol=3e-4)

        p2 = convert_lptqpn_state_dict(sd, nb, nr)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSmaAtCrossFramework:
    def test_forward_parity_and_roundtrip(self):
        model = SmaAtUNet(n_channels=5, n_classes=3)
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 5, 1, 32, 32))
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(1), x, train=False
        )
        params = jax.device_get(variables["params"])
        stats = jax.device_get(variables["batch_stats"])

        sd = export_smaat_state_dict(params, stats)
        with torch.no_grad():
            y_torch = torch_smaat_forward(sd, np.asarray(x[:, :, 0]), 3)
        y_ours = np.asarray(model.apply(variables, x, train=False))[:, :, 0]
        np.testing.assert_allclose(y_ours, y_torch, rtol=1e-3, atol=2e-4)

        # round-trip: torch dict -> our trees, exactly the originals
        p2, s2 = convert_smaat_state_dict(sd)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(stats), jax.tree.leaves(s2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
