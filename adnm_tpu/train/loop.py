"""Training driver (reference: train.py:107-250).

One jitted, donated train step per batch; LR and the adaptive grad-clip
threshold are host-side scalars fed into the step (no retraces, matching
the reference's per-epoch Python schedules, train.py:122-130,186-191).

Distribution: with a Mesh, the batch axis is sharded over 'data' via
NamedSharding and params are replicated — XLA inserts the gradient
all-reduce and computes global BatchNorm statistics automatically (the
DataParallel + SyncBatchNorm equivalent, reference train.py:99-102).

Documented fix vs reference: the reference's val loop iterates
val_dataloader but re-evaluates the last *training* batch each time
(train.py:159-160); here validation actually consumes the val batches.
"""

from __future__ import annotations

import contextlib
import dataclasses
import functools
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from adnm_tpu.train import checkpoint as ckpt
from adnm_tpu.train.presets import TrainPreset


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    batch_stats: Any  # {} for models without BN
    step: Any = struct.field(default=None)  # int32 scalar; drives dropout rng


@dataclasses.dataclass
class EpochLog:
    epoch: int
    train_loss: float
    val_loss: float
    test_loss: float
    lr: float
    grad_norm_avg: float
    clip_threshold: float
    clip_ratio: float
    seconds: float


class Trainer:
    def __init__(
        self,
        model,
        preset: TrainPreset,
        input_frames: int,
        output_frames: int,
        img_size: int = 256,
        mesh: Optional[jax.sharding.Mesh] = None,
        seed: int = 0,
        compute_dtype: Any = jnp.float32,
        param_transform: Optional[Callable] = None,
        shard_opt_state: bool = False,
        remat_forward: bool = False,
        scan_steps: int = 1,
        accum_steps: int = 1,
    ):
        """``remat_forward=True`` wraps the training forward in
        ``jax.checkpoint``: the backward recomputes the whole forward
        instead of storing activations — numerics identical, activation
        memory ~O(1) in depth, at ~60% more step FLOPs. Measured on a
        16G v5e chip at the reference task shape (256^2): with the
        seq-minor duality layout, batch 12 fits WITHOUT remat (the
        bench headline), so leave it off there; it serves larger-HBM
        parts or larger spatial shapes where activations are the
        binding constraint (see bench.py and README "HBM ceiling").
        Skipped automatically for BatchNorm
        models (mutable batch_stats don't thread through
        jax.checkpoint).

        ``shard_opt_state=True`` (ZeRO-1) shards the optimizer moments
        over the mesh's 'data' axis instead of replicating them. The
        optimizer runs on ONE raveled vector (optax.flatten, see
        presets.make_optimizer), so the shard is a clean 1-D split; XLA
        derives the ZeRO dataflow automatically: moment update local,
        all-gather of the parameter update. Cuts per-chip optimizer
        memory (2 x n_params x 4B for AdamW) by the DP degree — a TPU
        capability beyond the reference's replicate-everything
        DataParallel (train.py:99-102).

        ``scan_steps=k`` (k>1) runs k train steps per device dispatch:
        the host stacks k loader batches into one (k, B, ...) array and
        a single jitted ``lax.scan`` applies k sequential steps on
        device. Same step math and order as k separate dispatches —
        values agree to float-rounding tolerance (XLA fuses the scan
        body slightly differently; tested) — but the host's per-step
        Python dispatch (~ms each) stops gating the device. Epoch-tail
        batches smaller than a full group run through the per-step
        path. Not supported under multi-host training.

        ``accum_steps=m`` (m>1) is gradient accumulation: the batch is
        split into m equal microbatches scanned sequentially inside the
        step, gradients averaged before ONE optimizer update —
        activation memory drops ~m-fold, enabling effective batch sizes
        past the HBM ceiling. Exact (not approximate) for all four
        reference losses, which are elementwise means: the average of
        equal-microbatch losses/grads equals the full-batch value
        (tested). For BatchNorm models the normalization statistics are
        per-microbatch (the standard grad-accum caveat, same as torch).
        Requires batch % accum_steps == 0."""
        self.model = model
        self.preset = preset
        self.input_frames = input_frames
        self.output_frames = output_frames
        self.img_size = img_size
        self.mesh = mesh
        self.compute_dtype = compute_dtype
        self.remat_forward = remat_forward
        self.scan_steps = int(scan_steps)
        self.accum_steps = int(accum_steps)
        if self.scan_steps < 1 or self.accum_steps < 1:
            raise ValueError("scan_steps and accum_steps must be >= 1")
        zero1 = (
            shard_opt_state
            and mesh is not None
            and mesh.shape.get("data", 1) > 1
        )
        # pad the raveled moment vector to the DP degree so it shards
        # evenly (XLA requires equal shard sizes)
        self.tx = preset.make_optimizer(pad_to=mesh.shape["data"] if zero1 else 1)

        sample = jnp.zeros((1, input_frames + output_frames, 1, img_size, img_size), jnp.float32)
        init_rngs = {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(seed + 7)}
        variables = jax.jit(model.init, static_argnames=("train",))(
            init_rngs, sample[:, :input_frames], train=True
        )
        params = variables["params"]
        if param_transform is not None:
            params = param_transform(params, jax.random.PRNGKey(seed + 1))
        batch_stats = variables.get("batch_stats", {})
        self._base_rng = jax.random.PRNGKey(seed + 13)
        self.state = TrainState(
            params=params, opt_state=self.tx.init(params),
            batch_stats=batch_stats, step=jnp.zeros((), jnp.int32),
        )

        self._state_shardings = None
        from adnm_tpu.parallel.multihost import is_multiprocess_mesh

        self._multiprocess = is_multiprocess_mesh(mesh)
        self._mh_synced: set = set()  # multi-host first-collective sync, per step kind
        if self.scan_steps > 1 and self._multiprocess:
            raise NotImplementedError(
                "scan_steps > 1 under multi-host training is not supported: "
                "the global-batch assembly and first-collective sync are "
                "per-batch (parallel/multihost.py); use scan_steps=1 — the "
                "per-host dispatch overhead already overlaps the cross-host "
                "collectives there"
            )
        if mesh is not None:
            self.batch_sharding = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("data")
            )
            rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
            shardings = jax.tree.map(lambda _: rep, self.state)
            if zero1:
                vec = jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec("data")
                )
                # only the big raveled moment vectors (padded by
                # make_optimizer to a multiple of the DP degree, so the
                # 1-D split is always even); scalars (counts, injected
                # hyperparams) stay replicated
                ndata = mesh.shape["data"]
                opt_sh = jax.tree.map(
                    lambda leaf: vec
                    if (
                        getattr(leaf, "ndim", 0) == 1
                        and leaf.size >= 1024
                        and leaf.size % ndata == 0
                    )
                    else rep,
                    self.state.opt_state,
                )
                shardings = shardings.replace(opt_state=opt_sh)
            if self._multiprocess:
                # Multi-host: device_put would broadcast replicated leaves
                # (a gloo collective with a 30s rendezvous window — fails
                # under cross-host compile skew) and rejects cross-process
                # SHARDED targets (ZeRO-1 moments) outright. Instead each
                # process materializes its own addressable shards from the
                # host value — no communication; init is deterministic and
                # identical on every host by construction (same seed).
                def _place(x, s):
                    x = np.asarray(jax.device_get(x))
                    return jax.make_array_from_callback(
                        x.shape, s, lambda idx, x=x: x[idx]
                    )

                self.state = jax.tree.map(_place, self.state, shardings)
            else:
                self.state = jax.device_put(self.state, shardings)
            self._state_shardings = shardings
        else:
            self.batch_sharding = None

        if self._state_shardings is not None and zero1:
            # pin the output layout so the sharded moments never silently
            # collapse to replicated between steps (donation then reuses
            # the same buffers)
            self._train_step = jax.jit(
                self._train_step_impl,
                donate_argnums=(0,),
                out_shardings=(self._state_shardings, None, None),
            )
        else:
            self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)

        self._stack_sharding = None
        self._train_scan = None
        if self.scan_steps > 1:
            if mesh is not None:
                self._stack_sharding = jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec(None, "data")
                )
            if self._state_shardings is not None and zero1:
                self._train_scan = jax.jit(
                    self._train_scan_impl,
                    donate_argnums=(0,),
                    out_shardings=(self._state_shardings, None, None),
                )
            else:
                self._train_scan = jax.jit(self._train_scan_impl, donate_argnums=(0,))

    # ---- jitted impls -------------------------------------------------

    def _split_batch(self, batch):
        """(imgs, targets) from a (B, T_in+T_out, 1, S, S) batch.

        Accepts two wire formats: float (already in [0, 1], the
        reference's host-side /255, datasets/Shanghai.py:52-59) and
        uint8 (values round(x * 255) — 4x fewer host->HBM bytes; the
        /255 runs on device, fused into the first cast). uint8 is
        bit-faithful to the reference's own storage format (the h5
        clips are uint8 0..70) up to the post-resize requantization
        (<= 1/510 per pixel, see data/loader.py transfer_dtype).
        """
        t = self.input_frames
        if jnp.issubdtype(batch.dtype, jnp.integer):
            imgs = batch[:, :t].astype(self.compute_dtype) * self.compute_dtype(1.0 / 255.0)
            targets = batch[:, t:].astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        else:
            imgs = batch[:, :t].astype(self.compute_dtype)
            targets = batch[:, t:]
        return imgs, targets

    def _apply(self, params, batch_stats, imgs, train, rngs=None):
        variables = {"params": params}
        kwargs = {"rngs": rngs} if (train and rngs is not None) else {}
        if batch_stats:
            variables["batch_stats"] = batch_stats
            if train:
                out, mut = self.model.apply(
                    variables, imgs, train=True, mutable=["batch_stats"], **kwargs
                )
                return out, mut["batch_stats"]
            return self.model.apply(variables, imgs, train=False), batch_stats
        return self.model.apply(variables, imgs, train=train, **kwargs), batch_stats

    def _grads_impl(self, state: TrainState, batch):
        """(loss, grads, new_batch_stats) for one batch — the
        accumulation-aware gradient path, split out of
        ``_train_step_impl`` so exactness of ``accum_steps`` can be
        verified at the GRADIENT level: the flagship AdamW preset uses
        eps=1e-9, so early updates are ~lr*sign(g) and any
        rounding-level difference in a near-zero gradient flips a
        param by 2*lr — post-update params are the wrong place to
        assert grad-accumulation exactness."""
        imgs, targets = self._split_batch(batch)
        step_rng = jax.random.fold_in(self._base_rng, state.step)

        def loss_fn(params, batch_stats, imgs, targets, rngs):
            if self.remat_forward and not batch_stats:
                out = jax.checkpoint(
                    lambda p, im: self._apply(p, batch_stats, im, True, rngs)[0]
                )(params, imgs)
                new_bs = batch_stats
            else:
                out, new_bs = self._apply(params, batch_stats, imgs, True, rngs)
            loss = self.preset.loss_fn(out.astype(jnp.float32), targets)
            return loss, new_bs

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if self.accum_steps == 1:
            (loss, new_bs), grads = grad_fn(
                state.params, state.batch_stats, imgs, targets, {"dropout": step_rng}
            )
        else:
            # Gradient accumulation: m equal microbatches scanned
            # sequentially, grads/losses AVERAGED — exact for all four
            # reference losses (each is an elementwise mean over the
            # batch, losses/rainfall.py), approximate only in BatchNorm
            # statistics (per-microbatch, the standard caveat).
            m = self.accum_steps
            b = imgs.shape[0]
            if b % m:
                raise ValueError(f"batch {b} not divisible by accum_steps {m}")
            imgs_m = imgs.reshape(m, b // m, *imgs.shape[1:])
            tgts_m = targets.reshape(m, b // m, *targets.shape[1:])

            def body(carry, mb):
                gsum, lsum, bs, i = carry
                rngs = {"dropout": jax.random.fold_in(step_rng, i)}
                (l, bs), g = grad_fn(state.params, bs, mb[0], mb[1], rngs)
                gsum = jax.tree.map(lambda a, x: a + x, gsum, g)
                return (gsum, lsum + l, bs, i + 1), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            init = (zeros, jnp.zeros((), jnp.float32), state.batch_stats,
                    jnp.zeros((), jnp.int32))
            (gsum, lsum, new_bs, _), _ = jax.lax.scan(body, init, (imgs_m, tgts_m))
            grads = jax.tree.map(lambda g: g / m, gsum)
            loss = lsum / m
        return loss, grads, new_bs

    def _train_step_impl(self, state: TrainState, batch, lr, clip_norm):
        loss, grads, new_bs = self._grads_impl(state, batch)
        gnorm = optax_global_norm(grads)
        if self.preset.norm_clip:
            scale = jnp.minimum(1.0, clip_norm / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        opt_state = set_lr(state.opt_state, lr)
        updates, opt_state = self.tx.update(grads, opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return TrainState(params, opt_state, new_bs, state.step + 1), loss, gnorm

    def _train_scan_impl(self, state: TrainState, batches, lr, clip_norm):
        """k sequential train steps in ONE dispatch (``batches``:
        (k, B, T, 1, S, S)). Same math and order as k separate
        ``_train_step`` calls (to float-rounding tolerance — XLA fuses
        the scan body on its own) — lax.scan just keeps the device fed
        when per-step host dispatch would otherwise gate it."""

        def body(st, batch):
            st, loss, gnorm = self._train_step_impl(st, batch, lr, clip_norm)
            return st, (loss, gnorm)

        state, (losses, gnorms) = jax.lax.scan(body, state, batches)
        return state, losses, gnorms

    def _eval_step_impl(self, state: TrainState, batch):
        imgs, targets = self._split_batch(batch)
        out, _ = self._apply(state.params, state.batch_stats, imgs, False)
        out = out.astype(jnp.float32)
        loss = self.preset.loss_fn(out, targets)
        return loss, out

    # ---- host-side loop ----------------------------------------------

    def _put(self, batch: np.ndarray, identical_across_hosts: bool = False) -> jax.Array:
        if self.batch_sharding is not None:
            if self._multiprocess:
                # Multi-host: this host's batch is its rows of ONE global
                # batch (global B = local B x process_count); XLA emits
                # the cross-host grad all-reduce from the same 'data'
                # sharding (see parallel/multihost.py).
                n_data = self.mesh.shape.get("data", 1)
                if (batch.shape[0] * jax.process_count()) % n_data == 0:
                    return jax.make_array_from_process_local_data(
                        self.batch_sharding, np.asarray(batch)
                    )
                if not identical_across_hosts:
                    # A replicated fallback here would be SPLIT-BRAIN:
                    # XLA treats replicated values as identical across
                    # hosts, so per-host row-sharded data placed
                    # "replicated" trains disjoint models with NO grad
                    # all-reduce and corrupts distributed checkpoints.
                    raise ValueError(
                        f"multi-host batch: local {batch.shape[0]} x "
                        f"{jax.process_count()} hosts = "
                        f"{batch.shape[0] * jax.process_count()} rows must "
                        f"divide the 'data' axis ({n_data}); use a "
                        f"divisible per-host batch size"
                    )
                # Indivisible tail of a stream the caller asserts is
                # identical on every host (the UNsharded val/test loaders):
                # replicated global assembly is exactly right.
                rep = jax.sharding.NamedSharding(
                    self.mesh, jax.sharding.PartitionSpec()
                )
                return jax.make_array_from_process_local_data(
                    rep, np.asarray(batch)
                )
            if batch.shape[0] % self.mesh.shape.get("data", 1) == 0:
                return jax.device_put(batch, self.batch_sharding)
            # remainder batch (a drop_last=False val/test tail smaller
            # than the DP degree): place replicated — numerically
            # identical, just unsharded for this one odd shape (torch
            # DataParallel scatters uneven batches natively;
            # jax.device_put requires divisibility)
            rep = jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec())
            return jax.device_put(batch, rep)
        return jnp.asarray(batch)

    def _mesh_ctx(self):
        """Activate the mesh so PartitionSpec annotations inside the model
        (parallel.mesh.maybe_shard, e.g. the Refiner's sequence sharding)
        resolve against it."""
        if self.mesh is not None:
            return jax.sharding.set_mesh(self.mesh)
        return contextlib.nullcontext()

    def train_epoch(self, loader, lr: float, clip_norm: float) -> Dict[str, float]:
        from adnm_tpu.data.loader import device_prefetch
        from adnm_tpu.parallel.mesh import assert_training_mesh

        # Training-only guard: >=3-axis meshes miscompute weight grads in
        # this XLA version (eval/inference on them is fine and tested).
        assert_training_mesh(self.mesh)

        losses = []
        gnorms = []
        lr_j = jnp.float32(lr)
        clip_j = jnp.float32(clip_norm)

        if self.scan_steps > 1:
            k = self.scan_steps

            def grouped(it):
                buf = []
                for b in it:
                    b = np.asarray(b)
                    if buf and b.shape != buf[0].shape:
                        # odd-shaped batch (drop_last=False tail): flush
                        # the group and run the stragglers per-step
                        yield from buf
                        buf = []
                    buf.append(b)
                    if len(buf) == k:
                        yield np.stack(buf)
                        buf = []
                yield from buf

            def put(x):
                if x.ndim == 6:  # a (k, B, ...) group
                    if self._stack_sharding is not None:
                        return jax.device_put(x, self._stack_sharding)
                    return jnp.asarray(x)
                return self._put(x)

            stream = device_prefetch(grouped(loader), put)
        else:
            stream = device_prefetch(loader, self._put)

        with self._mesh_ctx():
            for batch in stream:
                if self._multiprocess and "train" not in self._mh_synced:
                    # Cross-host rendezvous windows (gloo: 30s) are far
                    # shorter than compile/startup skew between hosts, so
                    # compile the step BEFORE the first collective executes
                    # and meet at a long-timeout host barrier (coordination
                    # service). The jit call below then re-traces cheaply
                    # and loads the just-persisted XLA executable. Done once
                    # per step kind — afterwards the hosts run in lockstep
                    # through the shared collectives.
                    from adnm_tpu.parallel.multihost import host_barrier

                    try:
                        self._train_step.lower(
                            self.state, batch, lr_j, clip_j
                        ).compile()
                    except Exception:
                        pass  # precompile is best-effort; the barrier still helps
                    self._mh_synced.add("train")
                    host_barrier("adnm:train_compiled")
                # keep loss/gnorm as device arrays — fetching per step would
                # force a sync and serialize the async dispatch pipeline
                if batch.ndim == 6:
                    self.state, loss, gnorm = self._train_scan(self.state, batch, lr_j, clip_j)
                else:
                    self.state, loss, gnorm = self._train_step(self.state, batch, lr_j, clip_j)
                losses.append(loss)
                gnorms.append(gnorm)
        # flatten: scanned entries carry k per-step values, others one
        losses = (
            np.concatenate([np.atleast_1d(np.asarray(x)) for x in jax.device_get(losses)])
            if losses else np.zeros(0)
        )
        gnorms = (
            np.concatenate([np.atleast_1d(np.asarray(x)) for x in jax.device_get(gnorms)])
            if gnorms else np.zeros(0)
        )
        n = int(losses.size)
        clip_count = int(np.sum(gnorms > clip_norm)) if self.preset.norm_clip else 0
        return {
            "loss": float(losses.sum()),
            "avg_grad_norm": float(gnorms.mean()) if n else 0.0,
            "clip_ratio": clip_count / max(n, 1),
            "steps": n,
        }

    def predict(self, batch: np.ndarray):
        """One inference step: (loss, predictions) for a single host batch.

        The public serving entry for drivers (cli/visualize, cli/predict):
        activates the mesh context so in-model PartitionSpec annotations
        (sequence sharding, tensor-parallel layouts) resolve exactly as in
        eval_epoch — calling the jitted step without the mesh silently
        no-ops those annotations and produces a different device layout.
        """
        with self._mesh_ctx():
            return self._eval_step(self.state, self._put(batch))

    def eval_epoch(self, loader, collect: bool = False):
        from adnm_tpu.data.loader import device_prefetch

        if collect and self._multiprocess:
            raise NotImplementedError(
                "prediction collection fetches full output arrays, which are "
                "not addressable across hosts — run validate/visualize as a "
                "single host against the shared checkpoint "
                "(see parallel/multihost.py)"
            )
        losses = []
        gts, preds = [], []
        # val/test streams are deliberately unsharded under multi-host
        # (cli/common.py) — identical on every host, so indivisible tails
        # may be assembled replicated
        put = functools.partial(self._put, identical_across_hosts=True)
        with self._mesh_ctx():
            for batch in device_prefetch(loader, put):
                if self._multiprocess and "eval" not in self._mh_synced:
                    # same first-collective sync as train_epoch (compile
                    # skew >> the 30s gloo rendezvous window), once
                    from adnm_tpu.parallel.multihost import host_barrier

                    try:
                        self._eval_step.lower(self.state, batch).compile()
                    except Exception:
                        pass
                    self._mh_synced.add("eval")
                    host_barrier("adnm:eval_compiled")
                loss, out = self._eval_step(self.state, batch)
                # defer the loss fetch — float(loss) per batch forces a sync
                # and serializes dispatch (the train path already defers)
                losses.append(loss)
                if collect:
                    preds.append(np.asarray(out)[:, :, 0])
                    g = np.asarray(batch[:, self.input_frames :, 0])
                    if np.issubdtype(g.dtype, np.integer):
                        # uint8 wire format: bring gts back to [0, 1]
                        # so metrics see the same scale as predictions
                        g = g.astype(np.float32) / 255.0
                    gts.append(g)
        total = float(np.sum(jax.device_get(losses))) if losses else 0.0
        if collect:
            if not preds:
                return total, np.zeros((0,)), np.zeros((0,))
            return total, np.concatenate(preds), np.concatenate(gts)
        return total, None, None

    def fit(
        self,
        train_loader,
        val_loader,
        test_loader=None,
        epochs: Optional[int] = None,
        ckpt_path: Optional[str] = None,
        log_fn: Callable[[str], None] = print,
        eval_test_each_epoch: bool = True,
        metrics_path: Optional[str] = None,
        save_every: Optional[int] = None,
        keep_last: int = 2,
    ):
        """``save_every=N`` additionally writes {ckpt_path}_epoch{E} every N
        epochs (rotating, keep_last retained) — periodic snapshots for
        failure recovery on top of the reference's best-only policy."""
        preset = self.preset
        epochs = epochs or preset.epochs
        jsonl = None
        if metrics_path:
            from adnm_tpu.utils.logging import MetricsLogger

            jsonl = MetricsLogger(metrics_path, echo=False)
        best = float("inf")
        prev_avg_grad_norm = 0.0
        early_stop_count = 0
        logs = []
        for epoch in range(1, epochs + 1):
            t0 = time.time()
            if preset.lr_at_epoch is not None:
                lr = preset.lr_at_epoch(epoch, epochs)
            else:
                # poly decay, stepped at epoch end in the reference
                # (train.py:188-191) so epoch e trains at the (e-1) value
                lr = preset.base_lr * (1.0 - (epoch - 1) / epochs) ** 0.9
            clip_norm = (
                preset.clip_schedule.threshold(epoch, prev_avg_grad_norm)
                if preset.norm_clip
                else 0.0
            )
            tr = self.train_epoch(train_loader, lr, clip_norm)
            prev_avg_grad_norm = tr["avg_grad_norm"]

            val_loss, _, _ = self.eval_epoch(val_loader)
            save_gate = (not preset.save_epoch_gated) or (epoch > preset.save_epoch)
            if save_gate and val_loss < best:
                best = val_loss
                early_stop_count = 0
                if ckpt_path:
                    ckpt.save_state(ckpt_path, self.state)
                log_fn(f"epoch {epoch}: best_val_loss {val_loss:.6f} (saved)")
            else:
                if preset.if_early_stop and save_gate:
                    early_stop_count += 1
                log_fn(f"epoch {epoch}: val_loss {val_loss:.6f}")

            if save_every and ckpt_path and epoch % save_every == 0:
                import glob
                import shutil

                ckpt.save_state(f"{ckpt_path}_epoch{epoch}", self.state)
                snaps = sorted(
                    glob.glob(f"{ckpt_path}_epoch*"),
                    key=lambda p: int(p.rsplit("epoch", 1)[1]),
                )
                for old in snaps[:-keep_last]:
                    shutil.rmtree(old, ignore_errors=True)

            test_loss = 0.0
            if test_loader is not None and eval_test_each_epoch:
                test_loss, _, _ = self.eval_epoch(test_loader)

            dt = time.time() - t0
            logs.append(
                EpochLog(epoch, tr["loss"], val_loss, test_loss, lr,
                         tr["avg_grad_norm"], clip_norm, tr["clip_ratio"], dt)
            )
            if jsonl is not None:
                jsonl.log(epoch=epoch, train_loss=tr["loss"], val_loss=val_loss,
                          test_loss=test_loss, lr=lr, grad_norm=tr["avg_grad_norm"],
                          clip_threshold=clip_norm, clip_ratio=tr["clip_ratio"],
                          steps=tr["steps"], seconds=dt)
            log_fn(
                f"epoch {epoch}: train_loss {tr['loss']:.6f} test_loss {test_loss:.6f} "
                f"lr {lr:.2e} grad_norm {tr['avg_grad_norm']:.4f} "
                f"clip_thr {clip_norm:.4f} clip_ratio {tr['clip_ratio']:.3f} ({dt:.1f}s)"
            )
            if preset.if_early_stop and preset.early_stop and early_stop_count >= preset.early_stop:
                log_fn(f"early stop at epoch {epoch}")
                break
        return logs

    def load(self, ckpt_path: str):
        self.state = ckpt.restore_state(ckpt_path, self.state)
        if self._state_shardings is not None:
            if self._multiprocess:
                # same no-collective placement as __init__ (every host
                # restores the identical checkpoint from the shared root)
                def _place(x, s):
                    x = np.asarray(jax.device_get(x))
                    return jax.make_array_from_callback(
                        x.shape, s, lambda idx, x=x: x[idx]
                    )

                self.state = jax.tree.map(_place, self.state, self._state_shardings)
            else:
                self.state = jax.device_put(self.state, self._state_shardings)


def optax_global_norm(tree) -> jax.Array:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


def set_lr(opt_state, lr):
    """Update the injected learning_rate hyperparam in-place."""
    if hasattr(opt_state, "hyperparams"):
        hp = dict(opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return opt_state._replace(hyperparams=hp)
    return opt_state
