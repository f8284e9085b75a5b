"""Tensor-level parity of the ADN-SSD mixer against the reference's
interleaved formulation (models/ADNssd.py:302-461), executed in
functional torch with our weights mapped through the explicit channel
permutations. This verifies the 'exact permutation equivalence' claim in
adnm_tpu/mixers/ssd_mixer.py for the default (linear-attention duality)
path, including the 9 depthwise convs and the even/odd head splits."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adnm_tpu.mixers.ssd_mixer import ADNSSDMixer
from adnm_tpu.train.torch_import import adnssd_mixer_permutations

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

D_MODEL, HEADDIM, NGROUPS, D_STATE, EXPAND = 8, 2, 2, 4, 2
D_INNER = EXPAND * D_MODEL
GN = NGROUPS * D_STATE
CONV_DIM = D_INNER + 2 * GN
NHEADS = D_INNER // HEADDIM


def _ref_weights(params):
    """Map our mixer params to the reference's interleaved layout."""
    xbc_perm, head_perm = adnssd_mixer_permutations(D_MODEL, HEADDIM, NGROUPS, D_STATE, EXPAND)
    w = {}
    in_k = np.asarray(params["in_proj"]["kernel"])  # (d_model, d_in_proj)
    z_cols = in_k[:, :D_INNER]
    xbc_cols = in_k[:, D_INNER : D_INNER + CONV_DIM]
    dt_cols = in_k[:, D_INNER + CONV_DIM :]
    ref_xbc = np.empty_like(xbc_cols)
    ref_xbc[:, xbc_perm] = xbc_cols  # ours[j] = ref[perm[j]]
    ref_dt = np.empty_like(dt_cols)
    ref_dt[:, head_perm] = dt_cols
    w["in_proj"] = np.concatenate([z_cols, ref_xbc, ref_dt], axis=1)

    for nm in ("dt_bias", "A_log", "D"):
        v = np.asarray(params[nm])
        ref = np.empty_like(v)
        ref[head_perm] = v
        w[nm] = ref

    def dw(name):
        k = np.asarray(params[name]["kernel"])  # (kh, kw, 1, C)
        return np.transpose(k, (3, 2, 0, 1))  # (C, 1, kh, kw)

    w["conv2d"] = dw("conv2d")
    w["conv2d_z"] = dw("conv2d_z")
    # ours name_a/_b order: conv_x1 = (3,1) then (1,3) == conv_31_x1, conv_13_x1
    w["conv_31_x1"], w["conv_13_x1"] = dw("conv_x1_a"), dw("conv_x1_b")
    w["conv_13_x2"], w["conv_31_x2"] = dw("conv_x2_a"), dw("conv_x2_b")
    w["conv_13_bc1"], w["conv_31_bc1"] = dw("conv_bc1_a"), dw("conv_bc1_b")
    w["conv_31_bc2"], w["conv_13_bc2"] = dw("conv_bc2_a"), dw("conv_bc2_b")

    w["norm_w"] = np.asarray(params["norm"]["scale"])
    w["norm_b"] = np.asarray(params["norm"]["bias"])
    w["alpha1"] = float(np.asarray(params["alpha1"]))
    w["out_proj"] = np.asarray(params["out_proj"]["kernel"])  # (2*d_inner, d_model)
    return w


def torch_reference_mixer(w, u_np, H, W):
    """The reference forward (ADNssd.py:302-461), duality path, in
    functional torch with even/odd index_select wiring."""
    u = torch.from_numpy(u_np)  # (B, L, d_model)
    B, L, _ = u.shape
    zxbcdt = u @ torch.from_numpy(w["in_proj"])
    z, xBC, dt = torch.split(zxbcdt, [D_INNER, CONV_DIM, NHEADS], dim=-1)
    dt = F.softplus(dt + torch.from_numpy(w["dt_bias"]))
    A = -torch.exp(torch.from_numpy(w["A_log"]))
    Dp = torch.from_numpy(w["D"])

    def to_img(v):
        return v.view(B, H, W, -1).permute(0, 3, 1, 2)

    def to_seq(v):
        return v.permute(0, 2, 3, 1).reshape(B, L, -1)

    even = to_img(xBC[..., 0::2])
    odd = to_img(xBC[..., 1::2])
    even = F.silu(F.conv2d(even, torch.from_numpy(w["conv2d"]), None, padding=1, groups=CONV_DIM // 2))
    oe, oo = odd[:, 0::2], odd[:, 1::2]
    x_oe, bc_oe = torch.split(oe, [D_INNER // 4, GN // 2], dim=1)
    x_oo, bc_oo = torch.split(oo, [D_INNER // 4, GN // 2], dim=1)

    def c(v, name, pad):
        groups = v.shape[1]
        return F.conv2d(v, torch.from_numpy(w[name]), None, padding=pad, groups=groups)

    x_oe = F.silu(c(c(x_oe, "conv_31_x1", (1, 0)), "conv_13_x1", (0, 1)))
    x_oo = F.silu(c(c(x_oo, "conv_13_x2", (0, 1)), "conv_31_x2", (1, 0)))
    bc_oe = F.silu(c(c(bc_oe, "conv_13_bc1", (0, 1)), "conv_31_bc1", (1, 0)))
    bc_oo = F.silu(c(c(bc_oo, "conv_31_bc2", (1, 0)), "conv_13_bc2", (0, 1)))

    xbc_oe = torch.cat([x_oe, bc_oe], dim=1)
    xbc_oo = torch.cat([x_oo, bc_oo], dim=1)
    odd_m = torch.empty(B, xbc_oe.shape[1] * 2, H, W)
    odd_m[:, 0::2] = xbc_oe
    odd_m[:, 1::2] = xbc_oo

    even_s = to_seq(even)
    odd_s = to_seq(odd_m)
    x_even, B_even, C_even = torch.split(even_s, [D_INNER // 2, GN // 2, GN // 2], dim=-1)
    x_odd, B_odd, C_odd = torch.split(odd_s, [D_INNER // 2, GN // 2, GN // 2], dim=-1)

    dt_even, dt_odd = dt[..., 0::2], dt[..., 1::2]
    A_even, A_odd = A[0::2], A[1::2]
    D_even, D_odd = Dp[0::2], Dp[1::2]

    z_img = F.silu(F.conv2d(to_img(z), torch.from_numpy(w["conv2d_z"]), None, padding=1, groups=D_INNER))
    z_seq = to_seq(z_img)

    def dual(x, dtp, Ap, Bm, Cm, Dv):
        hh = x.shape[-1] // HEADDIM
        V = x.view(B, L, hh, HEADDIM).permute(0, 2, 1, 3)
        dA = -(dtp.permute(0, 2, 1).unsqueeze(-1) * Ap.view(1, -1, 1, 1))
        Vs = V * dA
        K = Bm.view(B, 1, L, -1)
        KV = K.transpose(-2, -1) @ Vs
        Q = Cm.view(B, 1, L, -1)
        y = Q @ KV + V * Dv.view(1, -1, 1, 1)
        return y.permute(0, 2, 1, 3).reshape(B, L, -1)

    y1 = dual(x_even, dt_even, A_even, B_even, C_even, D_even)
    y2 = dual(x_odd, dt_odd, A_odd, B_odd, C_odd, D_odd)
    y = torch.empty(B, L, D_INNER)
    y[..., 0::2] = y1
    y[..., 1::2] = y2

    y = F.layer_norm(y, (D_INNER,), torch.from_numpy(w["norm_w"]), torch.from_numpy(w["norm_b"]), eps=1e-5)
    y = torch.cat([w["alpha1"] * y, w["alpha1"] * z_seq], dim=-1)
    return (y @ torch.from_numpy(w["out_proj"])).numpy()


class TestADNSSDReferenceParity:
    def test_mixer_matches_reference_formulation(self):
        mixer = ADNSSDMixer(d_model=D_MODEL, headdim=HEADDIM, ngroups=NGROUPS, d_state=D_STATE)
        H = W = 8
        u = jax.random.normal(jax.random.PRNGKey(0), (2, H, W, D_MODEL))
        variables = mixer.init(jax.random.PRNGKey(1), u)
        params = jax.device_get(variables["params"])
        w = _ref_weights(params)
        with torch.no_grad():
            y_ref = torch_reference_mixer(w, np.asarray(u.reshape(2, H * W, D_MODEL)), H, W)
        y_ours = np.asarray(mixer.apply(variables, u)).reshape(2, H * W, D_MODEL)
        np.testing.assert_allclose(y_ours, y_ref, rtol=1e-4, atol=1e-4)

    def test_channel_major_layout_matches_reference_formulation(self):
        """The (B, C, L) channel-major execution layout (r5 — what the
        refiner's 65k-token mixers actually run) against the SAME torch
        reference oracle and the token-minor path, same params: the
        layout change (tap-lowered depthwise convs, concat-instead-of-
        interleave head assembly + one output permutation, seq-minor
        duality) is math-identical."""
        H = W = 8
        u = jax.random.normal(jax.random.PRNGKey(0), (2, H, W, D_MODEL))
        tm = ADNSSDMixer(d_model=D_MODEL, headdim=HEADDIM, ngroups=NGROUPS,
                         d_state=D_STATE)
        cm = ADNSSDMixer(d_model=D_MODEL, headdim=HEADDIM, ngroups=NGROUPS,
                         d_state=D_STATE, seq_minor_min_l=1)  # force channel-major
        variables = tm.init(jax.random.PRNGKey(1), u)
        params = jax.device_get(variables["params"])
        w = _ref_weights(params)
        with torch.no_grad():
            y_ref = torch_reference_mixer(w, np.asarray(u.reshape(2, H * W, D_MODEL)), H, W)
        y_cm = np.asarray(cm.apply(variables, u)).reshape(2, H * W, D_MODEL)
        np.testing.assert_allclose(y_cm, y_ref, rtol=1e-4, atol=1e-4)
        y_tm = np.asarray(tm.apply(variables, u)).reshape(2, H * W, D_MODEL)
        np.testing.assert_allclose(y_cm, y_tm, rtol=1e-5, atol=1e-5)


class TestChannelMajorBlock:
    """r5: the refiner's Blocks run END-TO-END channel-major (B, C, H, W)
    — norms over axis 1, the mixer without boundary transposes, FFN convs
    as channel einsums / fused shift-taps (models/adnm_unet.py Block
    layout="cl"). Same parameter tree, same math as the NHWC path."""

    def _mk(self, out_dim, layout):
        from adnm_tpu.models.adnm_unet import Block

        return Block(dim=8, out_dim=out_dim, headdim=4, num_layers=2,
                     layout=layout)

    @pytest.mark.parametrize("out_dim", [8, 4])
    def test_block_cl_matches_nhwc(self, out_dim):
        H = W = 8
        x = jax.random.normal(jax.random.PRNGKey(0), (2, H, W, 8))
        bn = self._mk(out_dim, "nhwc")
        bc = self._mk(out_dim, "cl")
        v = bn.init(jax.random.PRNGKey(1), x)
        vc = bc.init(jax.random.PRNGKey(1), jnp.moveaxis(x, -1, 1))
        # identical parameter trees (layout is a pure execution choice)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vc)
        for a, b in zip(jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(vc)):
            assert a.shape == b.shape
        y_n = bn.apply(v, x)
        y_c = jnp.moveaxis(bc.apply(v, jnp.moveaxis(x, -1, 1)), 1, -1)
        np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_n),
                                   rtol=1e-5, atol=1e-5)

    def test_refiner_channel_major_wiring(self):
        """At L >= 16384 the Refiner switches to the channel-major Blocks
        (one transpose in/out); output must equal the same-params
        token-minor composition of its own Blocks + OutProj."""
        from adnm_tpu.core.blocks import OutProj
        from adnm_tpu.models.adnm_unet import Block, Refiner

        H = W = 128  # L = 16384: exactly the channel-major threshold
        B = 1
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, 8)) * 0.1
        res = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W))
        ref = Refiner((8, 8, 8, 8), (1, 1, 1, 1), (4, 4, 4, 4), 2,
                      (3, 2, 1), remat=False)
        v = ref.init(jax.random.PRNGKey(2), x, res)
        y_cl = ref.apply(v, x, res)
        p = v["params"]
        x2 = x
        for i in range(4):
            x2 = Block(dim=8, out_dim=8, headdim=4, num_layers=1,
                       norm_epsilon=1e-5).apply(
                {"params": p[f"refiner{i + 1}"]}, x2)
        y_ref = OutProj(2, 8, 2, True).apply({"params": p["out_proj"]}, x2, res)
        np.testing.assert_allclose(np.asarray(y_cl), np.asarray(y_ref),
                                   rtol=2e-4, atol=2e-4)
