"""Unit tests for core primitives (norms, convs, wavelet)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adnm_tpu.core import layers as L
from adnm_tpu.core import wavelet as W


def rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


class TestNorms:
    def test_biasfree_layernorm(self):
        x = rand(0, 2, 7, 16)
        m = L.BiasFreeLayerNorm(dim=16)
        y, _ = m.init_with_output(jax.random.PRNGKey(1), x)
        xn = np.asarray(x)
        mu = xn.mean(-1, keepdims=True)
        var = xn.var(-1, keepdims=True)
        expect = (xn - mu) / np.sqrt(var + 1e-5)
        np.testing.assert_allclose(np.asarray(y), expect, atol=1e-5)

    def test_rmsnorm(self):
        x = rand(2, 3, 16)
        y, _ = L.RMSNorm(dim=16).init_with_output(jax.random.PRNGKey(1), x)
        xn = np.asarray(x)
        expect = xn / np.sqrt((xn**2).mean(-1, keepdims=True) + 1e-6)
        np.testing.assert_allclose(np.asarray(y), expect, atol=1e-5)

    def test_instance_norm(self):
        x = rand(3, 2, 8, 8, 4)
        y, _ = L.InstanceNorm().init_with_output(jax.random.PRNGKey(1), x)
        yn = np.asarray(y)
        # per (sample, channel) zero mean / unit var over spatial dims
        np.testing.assert_allclose(yn.mean(axis=(1, 2)), 0.0, atol=1e-5)
        np.testing.assert_allclose(yn.var(axis=(1, 2)), 1.0, atol=1e-3)

    def test_group_norm_matches_torch(self):
        torch = pytest.importorskip("torch")
        x = rand(4, 2, 6, 6, 8)
        y, _ = L.GroupNorm(groups=4, dim=8).init_with_output(jax.random.PRNGKey(1), x)
        xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
        yt = torch.nn.functional.group_norm(xt, 4, torch.ones(8), torch.zeros(8), eps=1e-5)
        np.testing.assert_allclose(np.asarray(y), yt.permute(0, 2, 3, 1).numpy(), atol=1e-5)


class TestConvs:
    def test_conv_matches_torch(self):
        torch = pytest.importorskip("torch")
        x = rand(5, 2, 9, 9, 6)
        m = L.Conv2d(features=8, kernel_size=3, stride=1, padding=1)
        params = m.init(jax.random.PRNGKey(2), x)
        y = m.apply(params, x)
        k = np.asarray(params["params"]["kernel"])  # HWIO
        b = np.asarray(params["params"]["bias"])
        xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
        wt = torch.from_numpy(k).permute(3, 2, 0, 1)  # OIHW
        yt = torch.nn.functional.conv2d(xt, wt, torch.from_numpy(b), padding=1)
        np.testing.assert_allclose(np.asarray(y), yt.permute(0, 2, 3, 1).numpy(), atol=1e-4)

    def test_grouped_conv_matches_torch(self):
        torch = pytest.importorskip("torch")
        x = rand(6, 2, 8, 8, 8)
        m = L.Conv2d(features=8, kernel_size=(1, 3), padding=(0, 1), groups=8)
        params = m.init(jax.random.PRNGKey(2), x)
        y = m.apply(params, x)
        k = np.asarray(params["params"]["kernel"])
        b = np.asarray(params["params"]["bias"])
        xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
        wt = torch.from_numpy(k).permute(3, 2, 0, 1)
        yt = torch.nn.functional.conv2d(xt, wt, torch.from_numpy(b), padding=(0, 1), groups=8)
        np.testing.assert_allclose(np.asarray(y), yt.permute(0, 2, 3, 1).numpy(), atol=1e-4)

    def test_grouped_conv_stride_and_multiplier_matches_torch(self):
        """The grouped path (layers.grouped_conv: native fwd, custom-vjp
        backward) across its full contract: stride 2, SAME padding, a
        channel multiplier (features = 2*cin, torch depthwise-multiplier),
        and a grouped (1 < groups < cin) case — all against torch."""
        torch = pytest.importorskip("torch")
        for groups, feats, stride, pad, tpad in (
            (8, 16, 2, 1, 1),            # depthwise, multiplier 2, stride 2
            (8, 8, 1, "same", 2),        # depthwise 5x5 SAME (the WTConv shape)
            (4, 8, 1, 1, 1),             # grouped I=2
        ):
            k = 5 if pad == "same" else 3
            x = rand(11, 2, 8, 8, 8)
            m = L.Conv2d(features=feats, kernel_size=k, stride=stride,
                         padding=pad, groups=groups)
            params = m.init(jax.random.PRNGKey(4), x)
            y = m.apply(params, x)
            kk = np.asarray(params["params"]["kernel"])
            b = np.asarray(params["params"]["bias"])
            xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
            wt = torch.from_numpy(kk).permute(3, 2, 0, 1)
            yt = torch.nn.functional.conv2d(
                xt, wt, torch.from_numpy(b), stride=stride, padding=tpad,
                groups=groups,
            )
            np.testing.assert_allclose(
                np.asarray(y), yt.permute(0, 2, 3, 1).numpy(), atol=1e-4,
                err_msg=f"groups={groups} feats={feats} stride={stride} pad={pad}",
            )

    def test_grouped_conv_custom_vjp_grads_match_tapsum(self):
        """layers.grouped_conv (native XLA fwd + input grad, tap-einsum
        weight grad — the r4 fast path) must match the all-tap-sum
        lowering (the r1-r3 formulation, kept as oracle) in value AND in
        both gradients, across stride / SAME / multiplier / grouped
        variants."""
        from adnm_tpu.core.layers import _grouped_conv_tapsum, grouped_conv

        rng = np.random.default_rng(7)
        for groups, cin, feats, stride, pad, k in (
            (8, 8, 8, (1, 1), ((1, 1), (1, 1)), 3),    # depthwise 3x3
            (8, 8, 8, (1, 1), "SAME", 5),              # depthwise 5x5 SAME (WTConv)
            (8, 8, 16, (2, 2), ((1, 1), (1, 1)), 3),   # multiplier 2, stride 2
            (4, 8, 8, (1, 1), ((0, 0), (1, 1)), (1, 3)),  # grouped I=2, 1x3
        ):
            kh, kw = (k, k) if isinstance(k, int) else k
            x = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, cin)).astype(np.float32))
            w = jnp.asarray(
                rng.uniform(-1, 1, (kh, kw, cin // groups, feats)).astype(np.float32))

            def loss_new(x, w):
                return jnp.sum(jnp.square(grouped_conv(x, w, stride, pad, groups)))

            def loss_ref(x, w):
                return jnp.sum(jnp.square(_grouped_conv_tapsum(x, w, stride, pad, groups)))

            msg = f"groups={groups} feats={feats} stride={stride} pad={pad} k={k}"
            y_new = grouped_conv(x, w, stride, pad, groups)
            y_ref = _grouped_conv_tapsum(x, w, stride, pad, groups)
            np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_ref),
                                       atol=1e-4, err_msg=msg)
            gx_new, gw_new = jax.jit(jax.grad(loss_new, argnums=(0, 1)))(x, w)
            gx_ref, gw_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(x, w)
            np.testing.assert_allclose(np.asarray(gx_new), np.asarray(gx_ref),
                                       atol=1e-3, err_msg="dx " + msg)
            np.testing.assert_allclose(np.asarray(gw_new), np.asarray(gw_ref),
                                       atol=1e-3, err_msg="dW " + msg)

    def test_conv_transpose_matches_torch(self):
        torch = pytest.importorskip("torch")
        # the UpSample config: kernel 3, stride 2, padding 1, output_padding 1
        x = rand(7, 2, 8, 8, 4)
        m = L.ConvTranspose2d(features=4, kernel_size=3, stride=2, padding=1, output_padding=1)
        params = m.init(jax.random.PRNGKey(3), x)
        y = m.apply(params, x)
        assert y.shape == (2, 16, 16, 4)
        k = np.asarray(params["params"]["kernel"])  # HWIO (I=cin, O=cout)
        b = np.asarray(params["params"]["bias"])
        xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
        # torch convT weight: (cin, cout, kh, kw)
        wt = torch.from_numpy(k).permute(2, 3, 0, 1)
        yt = torch.nn.functional.conv_transpose2d(
            xt, wt, torch.from_numpy(b), stride=2, padding=1, output_padding=1
        )
        np.testing.assert_allclose(np.asarray(y), yt.permute(0, 2, 3, 1).numpy(), atol=1e-4)

    def test_grouped_conv_transpose_matches_torch(self):
        """groups>1 transposed convs route through the tap-sum lowering
        (same XLA SPMD weight-grad defect as Conv2d, CLAUDE.md defect
        #3) — value parity vs torch across grouped/depthwise, stride,
        and output_padding."""
        torch = pytest.importorskip("torch")
        for seed, (cin, cout, groups, stride, padp, outp) in enumerate([
            (8, 8, 8, 2, 1, 1),   # depthwise, the UpSample shape
            (8, 4, 4, 2, 1, 1),   # grouped, cout != cin
            (6, 6, 3, 1, 0, 0),   # grouped, stride 1
            (4, 8, 2, 3, 1, 2),   # stride 3 + output_padding 2
        ]):
            x = rand(20 + seed, 2, 8, 8, cin)
            m = L.ConvTranspose2d(
                features=cout, kernel_size=3, stride=stride, padding=padp,
                output_padding=outp, groups=groups,
            )
            params = m.init(jax.random.PRNGKey(30 + seed), x)
            y = m.apply(params, x)
            k = np.asarray(params["params"]["kernel"])  # HW,I=cin//g,O=cout
            b = np.asarray(params["params"]["bias"])
            xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
            # torch convT weight: (cin, cout//groups, kh, kw); our HWIO
            # stores I=cin//groups, O=cout group-major -> regroup
            wt = torch.from_numpy(
                k.reshape(3, 3, cin // groups, groups, cout // groups)
            ).permute(3, 2, 4, 0, 1).reshape(cin, cout // groups, 3, 3)
            yt = torch.nn.functional.conv_transpose2d(
                xt, wt, torch.from_numpy(b), stride=stride, padding=padp,
                output_padding=outp, groups=groups,
            )
            np.testing.assert_allclose(
                np.asarray(y), yt.permute(0, 2, 3, 1).numpy(), atol=1e-4,
                err_msg=f"config {cin, cout, groups, stride, padp, outp}",
            )

    def test_deconv_layer_doubles_resolution(self):
        x = rand(8, 1, 8, 8, 4)
        m = L.DeConvLayer(features=4, ratio=2, kernel_size=(3, 3))
        y, _ = m.init_with_output(jax.random.PRNGKey(4), x)
        assert y.shape == (1, 16, 16, 4)

    def test_deconv_layer_ratio4(self):
        x = rand(9, 1, 4, 4, 4)
        m = L.DeConvLayer(features=4, ratio=4, kernel_size=(3, 3))
        y, _ = m.init_with_output(jax.random.PRNGKey(4), x)
        assert y.shape == (1, 16, 16, 4)


class TestWavelet:
    def test_haar_roundtrip(self):
        x = rand(10, 2, 16, 16, 3)
        y = W.haar_idwt(W.haar_dwt(x))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)

    def test_haar_energy(self):
        # orthonormal transform preserves energy
        x = rand(11, 1, 8, 8, 2)
        sub = W.haar_dwt(x)
        np.testing.assert_allclose(
            float(jnp.sum(x**2)), float(jnp.sum(sub**2)), rtol=1e-5
        )

    def test_haar_subband_order(self):
        # constant image -> only LL nonzero
        x = jnp.ones((1, 4, 4, 1))
        sub = W.haar_dwt(x)
        np.testing.assert_allclose(np.asarray(sub[..., 0]), 2.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sub[..., 1:]), 0.0, atol=1e-6)
        # vertical gradient (varies along H) -> HL band nonzero, LH zero
        g = jnp.broadcast_to(jnp.arange(4.0)[None, :, None, None], (1, 4, 4, 1))
        sub = W.haar_dwt(g)
        assert float(jnp.abs(sub[..., 1]).sum()) > 0.1  # H-high
        np.testing.assert_allclose(np.asarray(sub[..., 2]), 0.0, atol=1e-6)  # W-high

    def test_wtconv_shape_and_odd_sizes(self):
        x = rand(12, 2, 17, 17, 4)  # odd spatial dims exercise padding
        m = W.WTConv2d(channels=4, kernel_size=5, wt_levels=3)
        y, _ = m.init_with_output(jax.random.PRNGKey(5), x)
        assert y.shape == x.shape

    def test_wtconv_stride(self):
        x = rand(13, 1, 16, 16, 4)
        m = W.WTConv2d(channels=4, kernel_size=3, stride=2, wt_levels=2)
        y, _ = m.init_with_output(jax.random.PRNGKey(5), x)
        assert y.shape == (1, 8, 8, 4)

    def test_haar_cat_layout_matches_stacked(self):
        """haar_dwt_cat/idwt_cat (the TPU-layout form WTConv2d runs on,
        r5) are exactly haar_dwt/idwt up to the documented subband-major
        channel permutation."""
        x = rand(21, 2, 16, 16, 6)
        a = np.asarray(W.haar_dwt(x))  # (b, h2, w2, c, 4)
        b = np.asarray(W.haar_dwt_cat(x))  # (b, h2, w2, 4c)
        c = x.shape[-1]
        for s in range(4):
            np.testing.assert_allclose(
                b[..., s * c:(s + 1) * c], a[..., :, s], atol=1e-6
            )
        np.testing.assert_allclose(
            np.asarray(W.haar_idwt_cat(W.haar_dwt_cat(x))), np.asarray(x),
            atol=1e-5,
        )

    def test_wtconv_matches_stacked_layout_oracle(self):
        """WTConv2d's subband-major data layout + reference-order params
        (kernel permuted at trace time) produce EXACTLY the per-channel
        subband-block formulation the params are stored for — pinned by
        re-computing the module from the same param tree with the
        public (…, c, 4) haar_dwt."""
        c, k, levels = 6, 5, 2
        x = rand(22, 2, 16, 16, c)
        m = W.WTConv2d(channels=c, kernel_size=k, wt_levels=levels)
        v = m.init(jax.random.PRNGKey(7), x)
        y_new = np.asarray(m.apply(v, x))

        p = v["params"]
        lls, highs, shapes = [], [], []
        cur = x
        for lvl in range(levels):
            shapes.append(cur.shape)
            sub = W.haar_dwt(cur)  # (b, h2, w2, c, 4)
            cur = sub[..., 0]
            b, h2, w2, _, _ = sub.shape
            flat = sub.reshape(b, h2, w2, c * 4)  # per-channel blocks
            kern = p[f"wavelet_conv{lvl}"]["kernel"]
            flat = jax.lax.conv_general_dilated(
                flat, kern, (1, 1), "SAME", feature_group_count=c * 4,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) * p[f"wavelet_scale{lvl}"]
            sub = flat.reshape(b, h2, w2, c, 4)
            lls.append(sub[..., 0])
            highs.append(sub[..., 1:])
        next_ll = 0.0
        for lvl in range(levels - 1, -1, -1):
            sub = jnp.concatenate(
                [(lls[lvl] + next_ll)[..., None], highs[lvl]], axis=-1
            )
            next_ll = W.haar_idwt(sub)[:, : shapes[lvl][1], : shapes[lvl][2]]
        base = jax.lax.conv_general_dilated(
            x, p["base_conv"]["kernel"], (1, 1), "SAME",
            feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["base_conv"]["bias"]
        y_ref = np.asarray(base * p["base_scale"] + next_ll)
        np.testing.assert_allclose(y_new, y_ref, atol=2e-5, rtol=1e-5)


class TestBlocks:
    def test_feedforward(self):
        x = rand(14, 2, 8, 8, 16)
        m = L.FeedForward(dim=16)
        y, _ = m.init_with_output(jax.random.PRNGKey(6), x)
        assert y.shape == x.shape

    def test_mlp_convffd(self):
        x = rand(15, 2, 8, 8, 16)
        y, _ = L.ConvFFD(dim=16).init_with_output(jax.random.PRNGKey(7), x)
        assert y.shape == x.shape
        xs = x.reshape(2, 64, 16)
        y2, _ = L.Mlp(dim=16).init_with_output(jax.random.PRNGKey(8), xs)
        assert y2.shape == xs.shape
