"""Multi-device tests on the virtual 8-CPU mesh: DP training step and
sequence-sharded SSD dual (the in-model GSPMD path — the shard_map
duplicate, parallel/seq_shard.py, was removed in r4: the model's
maybe_shard annotations are the one shipped mechanism, tested below at
op level and at mixer level in TestSeqMinorUnderMesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adnm_tpu.ops.ssd import linear_attn_dual
from adnm_tpu.parallel import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the virtual 8-device mesh"
)


class TestSeqSharding:
    """The duality with L sharded over 'seq' via GSPMD (constraint-in,
    constraint-out — exactly what parallel.mesh.maybe_shard does inside
    the mixers): output must equal the unsharded op."""

    def _data(self, key, b, l, h, p, n):
        ks = jax.random.split(jax.random.PRNGKey(key), 5)
        x = jax.random.normal(ks[0], (b, l, h, p))
        dt = jax.nn.softplus(jax.random.normal(ks[1], (b, l, h)))
        A = -jnp.exp(jax.random.uniform(ks[2], (h,)))
        B = jax.random.normal(ks[3], (b, l, n))
        C = jax.random.normal(ks[4], (b, l, n))
        D = jnp.ones((h,))
        return x, dt, A, B, C, D

    @staticmethod
    def _sharded_dual(mesh, x, dt, A, B, C, D, batch_axis="data"):
        from jax.sharding import NamedSharding, PartitionSpec as P

        bspec = batch_axis if (batch_axis and batch_axis in mesh.axis_names) else None

        @jax.jit
        def f(x, dt, A, B, C, D):
            con = jax.lax.with_sharding_constraint
            x = con(x, NamedSharding(mesh, P(bspec, "seq", None, None)))
            dt = con(dt, NamedSharding(mesh, P(bspec, "seq", None)))
            B = con(B, NamedSharding(mesh, P(bspec, "seq", None)))
            C = con(C, NamedSharding(mesh, P(bspec, "seq", None)))
            y = linear_attn_dual(x, dt, A, B, C, D)
            return con(y, NamedSharding(mesh, P(bspec, "seq", None, None)))

        with jax.sharding.set_mesh(mesh):
            return f(x, dt, A, B, C, D)

    def test_matches_unsharded(self):
        mesh = make_mesh(8, axes=("data", "seq"), shape=(2, 4))
        x, dt, A, B, C, D = self._data(0, 2, 64, 4, 4, 8)
        y_ref = linear_attn_dual(x, dt, A, B, C, D)
        y_sh = self._sharded_dual(mesh, x, dt, A, B, C, D)
        np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref), rtol=1e-5, atol=1e-5)

    def test_seq_only_mesh(self):
        mesh = make_mesh(8, axes=("seq",))
        x, dt, A, B, C, D = self._data(1, 1, 32, 2, 4, 8)
        y_ref = linear_attn_dual(x, dt, A, B, C, D)
        y_sh = self._sharded_dual(mesh, x, dt, A, B, C, D, batch_axis=None)
        np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref), rtol=1e-5, atol=1e-5)


class TestSeqMinorUnderMesh:
    """The seq-minor duality branch (ADNSSDMixer.seq_minor_min_l) is the
    DEFAULT execution path for the flagship refiner (L=65536) — this
    covers its in-branch maybe_shard annotations under real meshes,
    which the 32x32 sharding tests (L=1024 < 16384) never reach."""

    def _mixer_and_data(self):
        from adnm_tpu.mixers.ssd_mixer import ADNSSDMixer

        m = ADNSSDMixer(d_model=16, headdim=4, seq_minor_min_l=1)
        x = jnp.asarray(
            np.random.default_rng(7).normal(size=(4, 8, 8, 16)).astype(np.float32)
        )
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        loss = jax.jit(
            jax.value_and_grad(lambda p, x: jnp.sum(m.apply({"params": p}, x) ** 2))
        )
        return v["params"], x, loss

    def test_train_grads_match_on_data_seq_mesh(self):
        """Forward AND weight grads through the seq-minor branch on the
        training mesh must equal the meshless run (the 256^2 train step
        runs exactly this branch under --mesh data=N,seq=M)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        params, x, loss = self._mixer_and_data()
        l_ref, g_ref = loss(params, x)
        mesh = make_mesh(8, axes=("data", "seq"), shape=(4, 2))
        with jax.sharding.set_mesh(mesh):
            ps = jax.device_put(params, NamedSharding(mesh, P()))
            xs = jax.device_put(x, NamedSharding(mesh, P("data", "seq")))
            l_sh, g_sh = loss(ps, xs)
        np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            ),
            g_sh, g_ref,
        )

    def test_forward_matches_on_tp_mesh(self):
        """Inference-TP: the branch's ('data','model',None,'seq')
        annotations on a 3-axis mesh are a pure layout change."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        params, x, loss = self._mixer_and_data()
        l_ref, _ = loss(params, x)
        mesh = make_mesh(8, axes=("data", "seq", "model"), shape=(2, 2, 2))
        with jax.sharding.set_mesh(mesh):
            ps = jax.device_put(params, NamedSharding(mesh, P()))
            xs = jax.device_put(x, NamedSharding(mesh, P("data", "seq")))
            l_sh, _ = loss(ps, xs)
        np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-5)


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

    def test_tp_forward_matches_unsharded(self):
        """Head/hidden-channel tensor parallelism over 'model' (plus
        spatial 'seq' sharding of the pyramid) must be a pure layout
        change: same outputs as the single-device forward."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from adnm_tpu.models.adnm_unet import ADNMUNet

        m = ADNMUNet(channels=3, out_channels=2, kernel=(3, 3, 3), **self.CFG)
        x = jnp.asarray(
            np.random.default_rng(1).uniform(0, 1, (4, 3, 1, 32, 32)).astype(np.float32)
        )
        v = jax.jit(m.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), x, train=False
        )
        fwd = jax.jit(lambda p, x: m.apply({"params": p}, x, train=False))
        y_ref = np.asarray(fwd(v["params"], x))
        mesh = make_mesh(8, axes=("data", "seq", "model"), shape=(2, 2, 2))
        with jax.sharding.set_mesh(mesh):
            xs = jax.device_put(x, NamedSharding(mesh, P("data")))
            ps = jax.device_put(v["params"], NamedSharding(mesh, P()))
            y_sh = np.asarray(fwd(ps, xs))
        assert not np.isnan(y_sh).any()
        np.testing.assert_allclose(y_sh, y_ref, rtol=1e-4, atol=1e-5)

    def test_predict_matches_eval_epoch_under_tp(self):
        """cli/visualize + cli/predict serve through Trainer.predict();
        on a ('data','seq','model') inference-TP mesh it must produce
        the SAME arrays as the eval_epoch path (cli/validate) — i.e. no
        driver bypasses the mesh context (VERDICT r2 weak #6)."""
        from adnm_tpu.models.adnm_unet import ADNMUNet
        from adnm_tpu.train import Trainer, get_preset

        model = ADNMUNet(channels=5, out_channels=2, kernel=(3, 3, 3), **self.CFG)
        preset = get_preset("ADNMUnet", 5, 2, 6, "Shanghai")
        batch = np.random.default_rng(2).uniform(0, 1, (4, 7, 1, 32, 32)).astype(np.float32)

        t_ref = Trainer(model, preset, 5, 2, img_size=32)
        _, ref_preds = t_ref.predict(batch)
        ref_preds = np.asarray(ref_preds)

        mesh = make_mesh(8, axes=("data", "seq", "model"), shape=(2, 2, 2))
        t_tp = Trainer(model, preset, 5, 2, img_size=32, mesh=mesh)
        t_tp.state = t_tp.state.replace(params=jax.device_put(
            t_ref.state.params,
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
        ))
        loss_p, tp_preds = t_tp.predict(batch)
        tp_preds = np.asarray(tp_preds)
        loss_e, collected, _ = t_tp.eval_epoch([batch], collect=True)

        np.testing.assert_allclose(tp_preds, ref_preds, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(tp_preds[:, :, 0], collected, rtol=1e-6, atol=0)
        np.testing.assert_allclose(float(loss_p), loss_e, rtol=1e-5, atol=1e-6)

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


class TestZero1:
    """ZeRO-1 (Trainer(shard_opt_state=True)): optimizer moments sharded
    over 'data' must produce the SAME step as the replicated baseline,
    and must actually stay sharded across steps."""

    def _make(self, mesh=None, **kw):
        from adnm_tpu.models import create_model
        from adnm_tpu.train import Trainer, get_preset

        model = create_model("SmaATUnet", 5, 2, 6)
        preset = get_preset("SmaATUnet", 5, 2, 6, "Shanghai")
        return Trainer(model, preset, 5, 2, img_size=32, mesh=mesh, **kw)

    def test_matches_replicated_and_stays_sharded(self):
        mesh = make_mesh(8, axes=("data",))
        batch = np.random.default_rng(0).uniform(0, 1, (8, 7, 1, 32, 32)).astype(np.float32)

        t_rep = self._make(mesh=mesh)
        t_z1 = self._make(mesh=mesh, shard_opt_state=True)

        # the big raveled moment vectors start sharded over 'data'
        big = [
            leaf for leaf in jax.tree.leaves(t_z1.state.opt_state)
            if getattr(leaf, "ndim", 0) == 1 and leaf.size >= 1024
        ]
        assert big, "expected raveled optimizer moment vectors"
        assert all(not leaf.sharding.is_fully_replicated for leaf in big)

        for _ in range(2):
            s_rep = t_rep.train_epoch([batch], lr=1e-2, clip_norm=0.0)
            s_z1 = t_z1.train_epoch([batch], lr=1e-2, clip_norm=0.0)
        np.testing.assert_allclose(s_z1["loss"], s_rep["loss"], rtol=1e-5, atol=1e-6)
        p_rep = jax.tree.leaves(t_rep.state.params)
        p_z1 = jax.tree.leaves(t_z1.state.params)
        for a, b in zip(p_rep, p_z1):
            # Identical in exact arithmetic (the padded-flatten optimizer
            # is verified bit-exact vs optax.flatten in isolation), but
            # pinning the moment shardings makes XLA partition the whole
            # step differently — grad all-reduce becomes reduce-scatter,
            # BatchNorm stat reductions reorder — so float32 drift
            # compounds over the two steps (observed ~2e-5 abs / 0.5%
            # rel on a few near-zero weights).
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-2, atol=1e-4)

        # moments are STILL sharded after donated steps (out_shardings pin)
        big_after = [
            leaf for leaf in jax.tree.leaves(t_z1.state.opt_state)
            if getattr(leaf, "ndim", 0) == 1 and leaf.size >= 1024
        ]
        assert all(not leaf.sharding.is_fully_replicated for leaf in big_after)


class TestZero1Checkpoint:
    """ZeRO-1 resume: saving gathers the 'data'-sharded moment vectors to
    host (checkpoint.save_state device_gets), and Trainer.load re-shards
    them via the pinned state shardings — a mid-run checkpoint must
    resume the exact optimization trajectory."""

    def test_save_restore_resumes_sharded(self, tmp_path):
        from adnm_tpu.models import create_model
        from adnm_tpu.train import Trainer, get_preset

        mesh = make_mesh(8, axes=("data",))
        model = create_model("SmaATUnet", 5, 2, 6)
        preset = get_preset("SmaATUnet", 5, 2, 6, "Shanghai")
        batch = np.random.default_rng(0).uniform(0, 1, (8, 7, 1, 32, 32)).astype(np.float32)

        from adnm_tpu.train import checkpoint as ckpt

        t1 = Trainer(model, preset, 5, 2, img_size=32, mesh=mesh, shard_opt_state=True)
        t1.train_epoch([batch], lr=1e-2, clip_norm=0.0)
        ckpt.save_state(str(tmp_path / "z1"), t1.state)
        expect = t1.train_epoch([batch], lr=1e-2, clip_norm=0.0)

        t2 = Trainer(model, preset, 5, 2, img_size=32, mesh=mesh, shard_opt_state=True)
        t2.load(str(tmp_path / "z1"))
        # moments come back SHARDED after restore
        big = [
            leaf for leaf in jax.tree.leaves(t2.state.opt_state)
            if getattr(leaf, "ndim", 0) == 1 and leaf.size >= 1024
        ]
        assert big and all(not leaf.sharding.is_fully_replicated for leaf in big)
        got = t2.train_epoch([batch], lr=1e-2, clip_norm=0.0)
        np.testing.assert_allclose(got["loss"], expect["loss"], rtol=1e-5, atol=1e-6)


class TestXlaGroupedConvGradDefect:
    """Pins XLA v0.9.0 SPMD defect #3: weight gradients of lax
    ``feature_group_count`` convs are scaled by the PRODUCT of the mesh
    axes the conv's operands are replicated over — on ANY multi-axis
    mesh, with no explicit reshard boundary needed (batch over 'data',
    everything else replicated over a spare 'model'/'seq' axis → exactly
    axis_size x; loss and activation cotangents stay correct, so
    training silently diverges). Dense convs are exact on <=2-axis
    meshes (TestXlaThreeAxisGradDefect).

    Engineering rule: Conv2d's groups>1 WEIGHT gradient never comes from
    XLA's autodiff of a feature_group_count conv — layers.grouped_conv
    (custom_vjp) uses the fast native kernels for the forward and the
    input gradient (activation cotangents are NOT affected by the
    defect) and computes dW as a per-tap einsum, a plain dot-general
    that is verified exact here under the same meshes. The all-tap-sum
    lowering (_grouped_conv_tapsum) is kept as the oracle.

    If a jax upgrade fixes the lax path, test_lax_grouped_conv_grads_scaled
    FAILS (ratio drops to 1.0): that is the signal to drop the custom
    vjp (keep it only if the tap dW still benches faster).
    """

    B, H, W, C = 8, 8, 8, 16

    def _grads(self, conv_fn, mesh=None):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (self.B, self.H, self.W, self.C)).astype(np.float32))
        w = jnp.asarray(rng.uniform(-1, 1, (3, 3, 1, self.C)).astype(np.float32))

        def loss(x, w):
            return jnp.sum(jnp.square(conv_fn(x, w)))

        if mesh is None:
            return jax.jit(jax.grad(loss, argnums=1))(x, w)
        from jax.sharding import NamedSharding, PartitionSpec as P

        with jax.sharding.set_mesh(mesh):
            xs = jax.device_put(x, NamedSharding(mesh, P("data")))
            return jax.jit(jax.grad(loss, argnums=1))(xs, w)

    @staticmethod
    def _lax_depthwise(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=x.shape[-1],
        )

    @staticmethod
    def _tapsum_depthwise(x, w):
        from adnm_tpu.core.layers import _grouped_conv_tapsum

        return _grouped_conv_tapsum(x, w, (1, 1), [(1, 1), (1, 1)], x.shape[-1])

    def _ratio(self, conv_fn, mesh):
        a = np.asarray(self._grads(conv_fn))
        b = np.asarray(self._grads(conv_fn, mesh))
        mask = np.abs(a) > 0.3 * np.max(np.abs(a))
        return float(np.median(b[mask] / a[mask]))

    def test_lax_grouped_conv_grads_scaled(self):
        r_dm = self._ratio(self._lax_depthwise, make_mesh(8, axes=("data", "model"), shape=(4, 2)))
        r_ds = self._ratio(self._lax_depthwise, make_mesh(8, axes=("data", "seq"), shape=(4, 2)))
        r_d4 = self._ratio(self._lax_depthwise, make_mesh(8, axes=("data", "model"), shape=(2, 4)))
        if max(abs(r_dm - 1), abs(r_ds - 1), abs(r_d4 - 1)) < 1e-4:
            pytest.fail(
                "XLA's grouped-conv weight-grad scaling appears FIXED in this "
                "jax version: consider dropping the groups>1 tap-sum gate in "
                "core/layers.py Conv2d (keep the formulation only if it still "
                "benches faster on TPU)."
            )
        np.testing.assert_allclose([r_dm, r_ds, r_d4], [2.0, 2.0, 4.0], rtol=1e-3)

    def test_tapsum_grads_exact_on_all_meshes(self):
        for axes, shape in (
            (("data",), (8,)),
            (("data", "model"), (4, 2)),
            (("data", "seq"), (4, 2)),
            (("data", "model"), (2, 4)),
        ):
            r = self._ratio(self._tapsum_depthwise, make_mesh(8, axes=axes, shape=shape))
            np.testing.assert_allclose(r, 1.0, rtol=1e-4, err_msg=f"{axes}{shape}")

    def test_conv2d_module_grads_exact_on_mesh(self):
        """End to end through the Conv2d module (the gate itself)."""
        from adnm_tpu.core.layers import Conv2d
        from jax.sharding import NamedSharding, PartitionSpec as P

        m = Conv2d(features=self.C, kernel_size=3, padding=1, groups=self.C)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(-1, 1, (self.B, self.H, self.W, self.C)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x)

        def loss(p, x):
            return jnp.sum(jnp.square(m.apply(p, x)))

        g_ref = jax.jit(jax.grad(loss))(params, x)
        mesh = make_mesh(8, axes=("data", "model"), shape=(4, 2))
        with jax.sharding.set_mesh(mesh):
            xs = jax.device_put(x, NamedSharding(mesh, P("data")))
            g_sh = jax.jit(jax.grad(loss))(params, xs)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sh)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6)

    def test_weight_grad_gate_mesh_detection(self):
        """mesh_needs_exact_weight_grad: True only on >=2 non-trivial
        axes (where the lax defect fires); single-axis meshes and no
        mesh take XLA's fully native grouped-conv VJP (r5: the tap dW
        loop dominated the single-chip backward for nothing)."""
        from adnm_tpu.core.layers import mesh_needs_exact_weight_grad

        assert not mesh_needs_exact_weight_grad()  # no mesh
        with jax.sharding.set_mesh(make_mesh(8, axes=("data",))):
            assert not mesh_needs_exact_weight_grad()
        with jax.sharding.set_mesh(
            make_mesh(8, axes=("data", "seq"), shape=(8, 1))
        ):  # trivial second axis: partitioner treats it as 1-axis
            assert not mesh_needs_exact_weight_grad()
        with jax.sharding.set_mesh(make_mesh(8, axes=("data", "seq"), shape=(4, 2))):
            assert mesh_needs_exact_weight_grad()
        with jax.sharding.set_mesh(
            make_mesh(8, axes=("data", "seq", "model"), shape=(2, 2, 2))
        ):
            assert mesh_needs_exact_weight_grad()

    def test_conv2d_native_weight_grad_exact_on_single_axis_mesh(self):
        """The gate's load-bearing claim: on a pure-DP ('data',) mesh the
        NATIVE lax grouped-conv weight grad (what Conv2d now uses there)
        matches the no-mesh gradient exactly — the defect needs >= 2
        non-trivial axes."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        r = self._ratio(self._lax_depthwise, make_mesh(8, axes=("data",)))
        np.testing.assert_allclose(r, 1.0, rtol=1e-4)


class TestXlaThreeAxisGradDefect:
    """Pins the XLA v0.9.0 SPMD weight-gradient defect that forces the
    assert_training_mesh guard (adnm_tpu/parallel/mesh.py).

    On a mesh with >=3 non-trivial axes, the weight gradient of an op
    adjacent to an activation reshard boundary is double-counted over
    the axes the operands are replicated on — here, exactly 2x with a
    size-2 third axis — while the loss and activation cotangents stay
    correct. The identical program on a 2-axis mesh is exact. Verified
    identical under both the Shardy and legacy GSPMD partitioners.

    If a jax upgrade fixes this, test_three_axis_mesh_doubles_weight_grad
    FAILS (the ratio drops to 1.0): that is the signal to delete this
    class, drop assert_training_mesh, and re-enable >=3-axis training
    meshes (TP x seq x DP)."""

    @staticmethod
    def _grad_ratios(mesh, act_axis="seq"):
        import math

        from jax.sharding import NamedSharding, PartitionSpec as P

        rng = np.random.default_rng(0)
        B, H, W, C = 4, 16, 16, 32
        x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, C)).astype(np.float32))
        w1 = jnp.asarray(rng.uniform(-1, 1, (C, C)).astype(np.float32) / math.sqrt(C))
        w2 = jnp.asarray(
            rng.uniform(-1, 1, (3, 3, C, C)).astype(np.float32) / (3 * math.sqrt(C))
        )

        def f(x, w1, w2):
            y = jnp.einsum("bhwc,cd->bhwd", x, w1)
            y = jax.lax.with_sharding_constraint(y, P("data", act_axis, None, None))
            y = jax.nn.gelu(y)
            z = jax.lax.conv_general_dilated(
                y, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            return jnp.sum(jnp.square(z))

        def fref(x, w1, w2):
            y = jax.nn.gelu(jnp.einsum("bhwc,cd->bhwd", x, w1))
            z = jax.lax.conv_general_dilated(
                y, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            return jnp.sum(jnp.square(z))

        g_ref = jax.jit(jax.grad(fref, argnums=(1, 2)))(x, w1, w2)
        gfn = jax.jit(jax.grad(f, argnums=(1, 2)))
        with jax.sharding.set_mesh(mesh):
            xs = jax.device_put(x, NamedSharding(mesh, P("data")))
            g_sh = gfn(xs, w1, w2)
        ratios = []
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sh)):
            a, b = np.asarray(a), np.asarray(b)
            mask = np.abs(a) > 0.3 * np.max(np.abs(a))
            ratios.append(float(np.median(b[mask] / a[mask])))
        return ratios  # (w1, w2)

    def test_two_axis_mesh_is_exact(self):
        r1, r2 = self._grad_ratios(make_mesh(8, axes=("data", "seq"), shape=(4, 2)))
        np.testing.assert_allclose([r1, r2], [1.0, 1.0], rtol=1e-4)

    def test_data_model_mesh_is_exact(self):
        """The OTHER 2-axis combination assert_training_mesh admits:
        gradients on a ('data','model') mesh with an activation reshard
        boundary must also be exact (the defect is specific to >=3
        non-trivial axes, not to any particular pair of names)."""
        r1, r2 = self._grad_ratios(
            make_mesh(8, axes=("data", "model"), shape=(4, 2)), act_axis="model"
        )
        np.testing.assert_allclose([r1, r2], [1.0, 1.0], rtol=1e-4)

    def test_data_model_zero1_training_matches(self):
        """A full train step on a ('data','model') mesh + ZeRO-1 must
        match the mesh-free baseline — the guard admits this
        combination, so its exactness needs evidence. The crisp defect
        signal is epoch 1 (identical initial params): the known XLA
        defect double-counts WEIGHT grads exactly axis_size-x, so
        avg_grad_norm would land ~2x, and the first-epoch loss (forward
        before any update) must agree to float noise. The gnorm check
        uses rtol 5e-3: BatchNorm's backward amplifies the partitioned
        forward's ~5e-6 reassociation drift ~200x through the UNet's BN
        chains (measured 1.2e-3 here; a single doubled depthwise kernel
        — the defect this guards, pre-fix — measured 6e-2, 50x the
        tolerance; per-leaf exactness is pinned separately by
        TestXlaGroupedConvGradDefect). Epoch 2's loss is checked
        loosely: that float32 drift compounds through the optimizer step
        (same effect the TestZero1 param check documents at rtol
        1e-2)."""
        from adnm_tpu.models import create_model
        from adnm_tpu.train import Trainer, get_preset

        model = create_model("SmaATUnet", 5, 2, 6)
        preset = get_preset("SmaATUnet", 5, 2, 6, "Shanghai")
        batch = np.random.default_rng(3).uniform(0, 1, (8, 7, 1, 32, 32)).astype(np.float32)

        t_ref = Trainer(model, preset, 5, 2, img_size=32)
        mesh = make_mesh(8, axes=("data", "model"), shape=(4, 2))
        t_dm = Trainer(model, preset, 5, 2, img_size=32, mesh=mesh,
                       shard_opt_state=True)
        s_ref1 = t_ref.train_epoch([batch], lr=1e-2, clip_norm=0.0)
        s_dm1 = t_dm.train_epoch([batch], lr=1e-2, clip_norm=0.0)
        np.testing.assert_allclose(s_dm1["loss"], s_ref1["loss"], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            s_dm1["avg_grad_norm"], s_ref1["avg_grad_norm"], rtol=5e-3
        )
        s_ref2 = t_ref.train_epoch([batch], lr=1e-2, clip_norm=0.0)
        s_dm2 = t_dm.train_epoch([batch], lr=1e-2, clip_norm=0.0)
        np.testing.assert_allclose(s_dm2["loss"], s_ref2["loss"], rtol=5e-3)
        np.testing.assert_allclose(
            s_dm2["avg_grad_norm"], s_ref2["avg_grad_norm"], rtol=2e-2
        )

    def test_three_axis_mesh_doubles_weight_grad(self):
        r1, r2 = self._grad_ratios(
            make_mesh(8, axes=("data", "seq", "model"), shape=(2, 2, 2))
        )
        assert abs(r1 - 1.0) < 1e-4, r1
        if abs(r2 - 1.0) < 1e-4:
            pytest.fail(
                "XLA's 3-axis-mesh weight-grad double-count appears FIXED in "
                "this jax version: delete TestXlaThreeAxisGradDefect, remove "
                "parallel.mesh.assert_training_mesh, and re-enable >=3-axis "
                "training meshes (see adnm_tpu/parallel/mesh.py)."
            )
        np.testing.assert_allclose(r2, 2.0, rtol=1e-3)

    def test_trainer_guards_three_axis_mesh(self):
        from adnm_tpu.models import create_model
        from adnm_tpu.train import Trainer, get_preset

        mesh = make_mesh(8, axes=("data", "seq", "model"), shape=(2, 2, 2))
        model = create_model("SmaATUnet", 5, 2, 6)
        preset = get_preset("SmaATUnet", 5, 2, 6, "Shanghai")
        trainer = Trainer(model, preset, 5, 2, img_size=32, mesh=mesh)
        batch = np.random.default_rng(0).uniform(0, 1, (8, 7, 1, 32, 32)).astype(np.float32)
        with pytest.raises(ValueError, match="3 non-trivial axes|>=3"):
            trainer.train_epoch([batch], lr=1e-2, clip_norm=0.0)
        # eval on the same mesh is allowed (forward is correct under TP)
        loss, _, _ = trainer.eval_epoch([batch])
        assert np.isfinite(loss)
