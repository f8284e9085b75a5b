"""Multi-device tests on the virtual 8-CPU mesh: DP training step and
sequence-sharded SSD dual."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adnm_tpu.ops.ssd import linear_attn_dual
from adnm_tpu.parallel import make_mesh
from adnm_tpu.parallel.seq_shard import sharded_linear_attn_dual

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the virtual 8-device mesh"
)


class TestSeqSharding:
    def test_matches_unsharded(self):
        mesh = make_mesh(8, axes=("data", "seq"), shape=(2, 4))
        ks = jax.random.split(jax.random.PRNGKey(0), 5)
        b, l, h, p, n = 2, 64, 4, 4, 8
        x = jax.random.normal(ks[0], (b, l, h, p))
        dt = jax.nn.softplus(jax.random.normal(ks[1], (b, l, h)))
        A = -jnp.exp(jax.random.uniform(ks[2], (h,)))
        B = jax.random.normal(ks[3], (b, l, n))
        C = jax.random.normal(ks[4], (b, l, n))
        D = jnp.ones((h,))
        y_ref = linear_attn_dual(x, dt, A, B, C, D)
        y_sh = sharded_linear_attn_dual(mesh, x, dt, A, B, C, D)
        np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref), rtol=1e-5, atol=1e-5)

    def test_seq_only_mesh(self):
        mesh = make_mesh(8, axes=("seq",))
        ks = jax.random.split(jax.random.PRNGKey(1), 5)
        b, l, h, p, n = 1, 32, 2, 4, 8
        x = jax.random.normal(ks[0], (b, l, h, p))
        dt = jax.nn.softplus(jax.random.normal(ks[1], (b, l, h)))
        A = -jnp.exp(jax.random.uniform(ks[2], (h,)))
        B = jax.random.normal(ks[3], (b, l, n))
        C = jax.random.normal(ks[4], (b, l, n))
        D = jnp.ones((h,))
        y_ref = linear_attn_dual(x, dt, A, B, C, D)
        y_sh = sharded_linear_attn_dual(mesh, x, dt, A, B, C, D, batch_axis=None)
        np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref), rtol=1e-5, atol=1e-5)


class TestDataParallelTrainer:
    def test_dp_step_runs_and_replicates(self):
        from adnm_tpu.models import create_model
        from adnm_tpu.train import Trainer, get_preset

        mesh = make_mesh(8, axes=("data",))
        model = create_model("SmaATUnet", 5, 2, 6)
        preset = get_preset("SmaATUnet", 5, 2, 6, "Shanghai")
        trainer = Trainer(model, preset, 5, 2, img_size=32, mesh=mesh)
        batch = np.random.default_rng(0).uniform(0, 1, (8, 7, 1, 32, 32)).astype(np.float32)
        stats = trainer.train_epoch([batch], lr=1e-2, clip_norm=0.0)
        assert np.isfinite(stats["loss"])
        # params stay replicated across the mesh
        leaf = jax.tree.leaves(trainer.state.params)[0]
        assert leaf.sharding.is_fully_replicated
