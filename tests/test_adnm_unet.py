"""ADNM-UNet assembly tests (small spatial size for CPU speed)."""

import jax
import jax.numpy as jnp
import numpy as np

from adnm_tpu.models.adnm_unet import (
    ADNMUNet,
    apply_reference_init,
    create_adnm_unet,
    schedule_headdim,
)


def test_headdim_schedule():
    assert schedule_headdim(32) == 4
    assert schedule_headdim(128) == 8
    assert schedule_headdim(512) == 16
    assert schedule_headdim(768) == 24
    assert schedule_headdim(1024) == 32


def test_flagship_param_count():
    # structural pin: full-width flagship (5 -> 20 frames) has 72,566,228
    # params (changes legitimately only with the architecture)
    model = create_adnm_unet(5, 20, 6)
    x = jnp.zeros((1, 5, 1, 64, 64))
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes["params"]))
    assert n == 72_566_228, n


def test_factory_configs():
    m = create_adnm_unet(5, 20, 6)
    assert m.refine_dim == (32, 32, 32, 32)
    assert m.instance_norm is True and m.kernel == (5, 5, 5)
    m2 = create_adnm_unet(5, 3, 60)
    assert m2.refine_dim == (32, 32, 16, 16)
    assert m2.instance_norm is False and m2.kernel == (5, 3, 3)


def _jit_init(model, x):
    return jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(1), x, train=False
    )


def test_forward_shape_small():
    # full 6-level pyramid at 64x64 (bottleneck 2x2), slim dims for CPU
    # (the full-width model is exercised on TPU by bench.py / graft entry)
    model = ADNMUNet(
        channels=5, out_channels=7, kernel=(3, 3, 3), wt_levels=(1, 1, 1),
        embed_dim=(8, 8, 16, 16, 16, 16), refine_dim=(8, 8, 8, 8),
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 5, 1, 64, 64))
    variables = _jit_init(model, x)
    y = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert y.shape == (1, 7, 1, 64, 64)
    assert np.isfinite(np.asarray(y)).all()


def test_attn_type_mla_wired():
    """attn_type="mla" swaps the AttentionBlock mixer for DeepSeek-V2
    MLA (present-but-unwired in the reference, models/MLA.py:108-307;
    wired here behind a flag): forward shape + finiteness, MLA params
    actually present, and a different mixer than standard."""
    kw = dict(
        channels=3, out_channels=4, kernel=(3, 3, 3), wt_levels=(1, 1, 1),
        embed_dim=(8, 8, 8, 8, 8, 8), refine_dim=(8, 8, 8, 8),
    )
    model = ADNMUNet(attn_type="mla", **kw)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 3, 1, 32, 32))
    variables = _jit_init(model, x)
    enc_attn = variables["params"]["encoder"]["attn"]["attn_layer"]
    assert "q_down_proj" in enc_attn and "kv_up_proj" in enc_attn
    y = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert y.shape == (1, 4, 1, 32, 32)
    assert np.isfinite(np.asarray(y)).all()

    import pytest

    with pytest.raises(ValueError, match="attn_type"):
        bad = ADNMUNet(attn_type="nope", **kw)
        _jit_init(bad, x)


def test_refiner_remat_numerics_identity():
    """refiner_remat only changes WHERE the backward gets the refiner
    activations (recompute vs stored) — outputs and gradients must be
    identical. Measured on v5e: remat=False is ~14% faster per train
    step at batch <= 8, remat=True (default) fits batch 12 (bench.py)."""
    kw = dict(
        channels=3, out_channels=4, kernel=(3, 3, 3), wt_levels=(1, 1, 1),
        embed_dim=(8, 8, 8, 8, 8, 8), refine_dim=(8, 8, 8, 8),
    )
    m_on = ADNMUNet(refiner_remat=True, **kw)
    m_off = ADNMUNet(refiner_remat=False, **kw)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 1, 32, 32))
    variables = _jit_init(m_on, x)

    def loss(model, v):
        return jnp.sum(model.apply(v, x, train=False) ** 2)

    l_on, g_on = jax.value_and_grad(lambda v: loss(m_on, v))(variables)
    l_off, g_off = jax.value_and_grad(lambda v: loss(m_off, v))(variables)
    np.testing.assert_allclose(float(l_on), float(l_off), rtol=0, atol=0)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8),
        g_on, g_off,
    )


def test_reference_init_transform():
    model = ADNMUNet(channels=2, out_channels=2, embed_dim=(8, 8, 8, 8, 8, 8),
                     refine_dim=(8, 8, 8, 8), kernel=(3, 3, 3), wt_levels=(1, 1, 1))
    x = jnp.zeros((1, 2, 1, 64, 64))
    variables = _jit_init(model, x)
    params = apply_reference_init(variables["params"], jax.random.PRNGKey(2))
    # same tree structure, out_proj kernels rescaled small
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    dense_k = [l for p, l in flat if getattr(p[-1], "key", "") == "kernel" and l.ndim == 2]
    assert dense_k, "expected dense kernels"
    # trunc-normal kernels should have std close to 0.02
    big = max(dense_k, key=lambda l: l.size)
    assert 0.01 < float(jnp.std(big)) < 0.03
    y = jax.jit(lambda p, x: model.apply({"params": p}, x, train=False))(params, x)
    assert np.isfinite(np.asarray(y)).all()
