"""ADNM-UNet importer: the name map must cover our ENTIRE param tree and
round-trip exactly (ours -> reference-layout torch dict -> ours),
including the mixer channel/head permutations."""

import jax
import jax.numpy as jnp
import numpy as np

from adnm_tpu.models.adnm_unet import ADNMUNet
from adnm_tpu.train.adnm_import import convert_adnm_state_dict, export_adnm_state_dict

CFG = dict(
    embed_dim=(8, 8, 8, 8, 8, 8),
    refine_dim=(8, 8, 8, 8),
    wt_levels=(1, 1, 1),
    headdim=2,
    refine_headdim=(2, 2, 2, 2),
    depth=(1, 1, 1),
    refine_depth=(1, 1, 1, 1),
)


def test_adnm_roundtrip_full_coverage():
    model = ADNMUNet(
        channels=3, out_channels=2, kernel=(3, 3, 3),
        embed_dim=CFG["embed_dim"], refine_dim=CFG["refine_dim"],
        wt_levels=CFG["wt_levels"], headdim=CFG["headdim"],
        refine_headdim=CFG["refine_headdim"], depth=CFG["depth"],
        refine_depth=CFG["refine_depth"],
    )
    x = jnp.zeros((1, 3, 1, 64, 64))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False
    )
    params = jax.device_get(variables["params"])

    sd = export_adnm_state_dict(params, **CFG)
    p2 = convert_adnm_state_dict(sd, **CFG)

    ours = {jax.tree_util.keystr(p): np.asarray(v)
            for p, v in jax.tree_util.tree_leaves_with_path(params)}
    back = {jax.tree_util.keystr(p): np.asarray(v)
            for p, v in jax.tree_util.tree_leaves_with_path(p2)}
    missing = sorted(set(ours) - set(back))
    extra = sorted(set(back) - set(ours))
    assert not missing, f"map does not cover {len(missing)} leaves, e.g. {missing[:8]}"
    assert not extra, f"map produced {len(extra)} unknown leaves, e.g. {extra[:8]}"
    for k in ours:
        np.testing.assert_array_equal(ours[k], back[k], err_msg=k)
