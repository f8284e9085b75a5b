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


class TestModelSeqSharding:
    """The Refiner's in-model sequence sharding (parallel.mesh.maybe_shard
    annotations under a ('data','seq') mesh) must produce the SAME output
    as the unsharded forward, and a full DP+seq train step must run."""

    CFG = dict(
        embed_dim=(8, 8, 8, 8, 8, 8), refine_dim=(8, 8, 8, 8),
        wt_levels=(1, 1, 1), headdim=2, refine_headdim=(2, 2, 2, 2),
        depth=(1, 1, 1), refine_depth=(1, 1, 1, 1),
    )

    def test_forward_matches_unsharded(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from adnm_tpu.models.adnm_unet import ADNMUNet

        m = ADNMUNet(channels=3, out_channels=2, kernel=(3, 3, 3), **self.CFG)
        x = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (8, 3, 1, 32, 32)).astype(np.float32)
        )
        v = jax.jit(m.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), x, train=False
        )
        fwd = jax.jit(lambda p, x: m.apply({"params": p}, x, train=False))
        y_ref = np.asarray(fwd(v["params"], x))
        mesh = make_mesh(8, axes=("data", "seq"), shape=(4, 2))
        with jax.sharding.set_mesh(mesh):
            xs = jax.device_put(x, NamedSharding(mesh, P("data")))
            ps = jax.device_put(v["params"], NamedSharding(mesh, P()))
            y_sh = np.asarray(fwd(ps, xs))
        assert not np.isnan(y_sh).any()
        np.testing.assert_allclose(y_sh, y_ref, rtol=1e-4, atol=1e-5)

    def test_dp_seq_train_step(self):
        from adnm_tpu.models.adnm_unet import ADNMUNet
        from adnm_tpu.train import Trainer, get_preset

        mesh = make_mesh(8, axes=("data", "seq"), shape=(4, 2))
        # tiny dims: the full-dims DP+seq step is exercised by the driver's
        # dryrun_multichip; here we only verify Trainer wiring + mesh ctx
        model = ADNMUNet(channels=5, out_channels=2, kernel=(3, 3, 3), **self.CFG)
        preset = get_preset("ADNMUnet", 5, 2, 6, "Shanghai")
        trainer = Trainer(model, preset, 5, 2, img_size=32, mesh=mesh)
        batch = np.random.default_rng(0).uniform(0, 1, (4, 7, 1, 32, 32)).astype(np.float32)
        stats = trainer.train_epoch([batch], lr=1e-3, clip_norm=0.025)
        assert np.isfinite(stats["loss"])
        leaf = jax.tree.leaves(trainer.state.params)[0]
        assert leaf.sharding.is_fully_replicated
