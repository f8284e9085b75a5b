"""Benchmark: ADNM-UNet nowcast frames/sec/chip (train + rollout).

Protocol mirrors the reference's flagship training config (train.py:23,
59-66; train_untils.py:29-55): 5 input -> 20 predicted frames at 256x256,
AdamW + enRainfallLoss, adaptive-clip train step. We time the full jitted
train step (fwd + bwd + update) and the inference rollout, and report
predicted frames per second per chip:

    frames/sec = batch * 20 / step_time

TIMING PROTOCOL (r4 post-mortem). Rounds 1-3 timed dispatch loops ended
by ``jax.block_until_ready``, which on this tunnel-attached chip can
return before the queued executions finish — those rounds' readings
(~3.2 ms/step, "latency-bound") were the tunnel's per-CALL cost, not
compute. The tell was physical: the r3 scan-mode "0.8 ms/step" implies
~5x the chip's bf16 peak even under XLA's inflated dense-conv flop
pricing. r4's protocol forces real materialization: every trial chains
steps through the donated train state AND fetches the stacked per-step
scalar losses to host (``np.asarray``) inside the timed region — a
value fetch cannot complete before the compute that produces it. A
physics tripwire (``timing_suspect``) flags any config whose measured
true-flop rate exceeds the chip peak. Scalar fetches cost ~3 ms/trial,
amortized over the trial's steps and charged to us.

Configs sweep batch size (4 = the reference protocol, up to 14 = the v5e
HBM ceiling, 16 = the OOM tripwire) and scan-mode dispatch (k steps per
device call — with honest timing this only amortizes the ~3 ms call
overhead, a small effect at real step times). The headline is the best
combined (train + rollout) config; every config appears in the detail.

FLOP accounting — TWO counters are reported, because they disagree on
depthwise convolutions and this model is full of them:

  * xla:  compiled-executable cost_analysis. XLA prices grouped convs
    as DENSE (multiplies by the full input channel count), so on this
    model the count is inflated several-fold and the implied TFLOP/s
    can exceed the physical chip peak. It is reported (labelled) for
    continuity and because torch-side estimates usually make the same
    mistake.
  * true: analytic jaxpr-walk count (utils/profiling.py analytic_flops)
    pricing grouped convs correctly — the MFU convention (dot+conv
    MACs x2). Our measured true MFU vs the v5e 197 TFLOP/s bf16 peak
    MUST be < 1.0; it is the physically meaningful utilization.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
denominator is DERIVED and reported under BOTH accountings: an A100
(312 TFLOP/s dense bf16 peak) running the reference torch code at an
assumed 35% MFU of the *same* flop count used in the numerator. The two
accountings answer different questions:

  * vs_baseline_dense (the top-level number, continuity with r1-r3):
    both sides priced with XLA's dense-conv accounting. Equivalent to
    assuming the A100 sustains 109 dense-priced TFLOP/s — which, after
    deflating by the measured dense-overcount factor, implies a TRUE
    A100 rate reported as `implied_a100_true_tflops` (and a true MFU of
    ~35%/overcount). That implied rate is the honest content of the
    claim; README's bench section argues why it is fair-to-generous for
    eager torch on this op mix (hundreds of tiny depthwise conv kernels
    per step at batch 4, each a separate kernel launch).
  * vs_baseline_true: both sides priced with TRUE flops, still at 35%
    assumed A100 MFU — i.e. granting eager torch the utilization of a
    well-tuned fused trainer. This is the most conservative multiplier
    on the table; the real reference would land between the two.

The absolute frames/s/chip is the primary metric; the multipliers are
derived estimates whose every assumption is printed in the JSON.
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_BF16_PEAK = 312e12  # NVIDIA A100 dense bf16, FLOP/s (published spec)
A100_ASSUMED_MFU = 0.35  # assumed for the torch reference (see module docstring)
V5E_BF16_PEAK = 197e12  # TPU v5e per-chip bf16 peak, FLOP/s (published spec)

# (batch, remat, scan_steps, wire, refiner_remat): reference protocol
# first, then probe upward — larger batches are skipped gracefully if
# they OOM, and every skipped config is recorded in the JSON's "failed"
# list (an r4 bench regression shipped silently because failures went
# to stderr only). The refiner's seq-minor duality layout (ops/ssd.py
# linear_attn_dual_seqminor) keeps the (B, small, 65536) tensors
# unpadded in HBM; batch 16 OOMs 16G and stays in the list as the
# tripwire for larger-HBM parts. refiner_remat=False skips the
# backward's recompute of the four full-resolution refiner mixers
# (models/adnm_unet.py Refiner) at the cost of storing their
# activations — the honest-timing A/B the r4 verdict asked for.
# scan_steps=k dispatches k steps per device call (Trainer scan mode):
# under honest timing it saves only the ~3 ms per-call overhead, so one
# scan config is kept to measure that honestly (wire="uint8" quarters
# the (k, B, ...) stack's HBM so k=8 fits at batch 14).
CONFIGS = (
    dict(batch=4),
    dict(batch=4, refiner_remat=False),
    dict(batch=8, refiner_remat=False),
    dict(batch=14),
    dict(batch=16),  # OOM tripwire on 16G v5e
    dict(batch=14, scan=8, wire="uint8"),
)
IMG = 256
T_IN, T_OUT = 5, 20

# end-to-end loader-fed epoch (VERDICT r3 item 4): enough synthetic
# clips for 12 full batches at the headline batch size. Tried in order
# until one fits HBM (the r4 pinned batch-14 config OOM'd and took the
# whole end-to-end measurement with it); the JSON records which ran.
E2E_CLIPS = 168
E2E_CONFIGS = ((14, 4, "uint8"), (8, 4, "uint8"), (4, 1, "float32"))


def _quantize(batch: np.ndarray) -> np.ndarray:
    return np.clip(np.rint(batch * 255.0), 0, 255).astype(np.uint8)


def _make_trainer(remat: bool = False, scan_steps: int = 1,
                  refiner_remat: bool = True):
    import jax.numpy as jnp

    from adnm_tpu.models import create_model
    from adnm_tpu.train import Trainer, get_preset

    model = create_model("ADNMUnet", T_IN, T_OUT, 6, refiner_remat=refiner_remat)
    preset = get_preset("ADNMUnet", T_IN, T_OUT, 6, "Shanghai")
    return Trainer(
        model, preset, T_IN, T_OUT, img_size=IMG,
        compute_dtype=jnp.bfloat16, remat_forward=remat, scan_steps=scan_steps,
    )


def _measure(batch_size: int, remat: bool = False, scan_steps: int = 1,
             wire: str = "float32", refiner_remat: bool = True):
    import jax.numpy as jnp

    trainer = _make_trainer(remat, scan_steps, refiner_remat)
    rng = np.random.default_rng(0)
    host = rng.uniform(0, 1, (batch_size, T_IN + T_OUT, 1, IMG, IMG)).astype(np.float32)
    if wire == "uint8":
        host = _quantize(host)
    batch = jnp.asarray(host)
    lr = jnp.float32(1e-3)
    clip = jnp.float32(0.025)
    try:
        return _measure_inner(trainer, batch, batch_size, remat, wire, lr, clip,
                              refiner_remat)
    finally:
        # free this config's params/opt/compiled-step HBM before the next
        # one EVEN IF it failed (e.g. the batch-16 OOM tripwire) — the
        # jitted bound methods keep the Trainer in a ref cycle until GC,
        # and a leaked dead Trainer would spuriously OOM later configs.
        del trainer, batch
        import gc

        gc.collect()


def _measure_inner(trainer, batch, batch_size, remat, wire, lr, clip,
                   refiner_remat=True):
    import jax
    import jax.numpy as jnp

    k = trainer.scan_steps
    if k > 1:
        # scan mode: k steps per dispatch on a resident (k, B, ...) stack
        # (the per-step time is the dispatch time / k)
        stack = jnp.broadcast_to(batch[None], (k, *batch.shape))  # dense on device
        train_fn = lambda st: trainer._train_scan(st, stack, lr, clip)
    else:
        train_fn = lambda st: trainer._train_step(st, batch, lr, clip)

    # warmup/compile — force real completion with a VALUE FETCH, never
    # block_until_ready (see module docstring: on this tunnel-attached
    # chip block_until_ready can return before queued work finishes,
    # which is exactly how rounds 1-3 measured dispatch instead of
    # compute)
    trainer.state, loss, gn = train_fn(trainer.state)
    float(loss if loss.ndim == 0 else loss[-1])
    eloss, out = trainer._eval_step(trainer.state, batch)
    float(eloss)

    # best-of-trials; trials sized for ~1 s real steps (n_iter * k steps
    # per timed trial, each trial ends with a host fetch of ALL its
    # per-step losses — compute cannot be faked past a value fetch)
    n_iter, n_trials = max(1, -(-4 // k)), 3

    def time_train():
        losses = []
        t0 = time.perf_counter()
        for _ in range(n_iter):
            trainer.state, loss, gn = train_fn(trainer.state)
            losses.append(loss if loss.ndim else loss[None])
        fetched = np.asarray(jnp.concatenate(losses))  # forces every step
        dt = (time.perf_counter() - t0) / (n_iter * k)
        assert np.isfinite(fetched).all(), fetched
        return dt

    def time_rollout():
        losses = []
        t0 = time.perf_counter()
        for _ in range(n_iter):
            eloss, out = trainer._eval_step(trainer.state, batch)
            losses.append(eloss[None])
        fetched = np.asarray(jnp.concatenate(losses))  # forces every step
        dt = (time.perf_counter() - t0) / n_iter
        assert np.isfinite(fetched).all(), fetched
        return dt

    train_trials = [time_train() for _ in range(n_trials)]
    rollout_trials = [time_rollout() for _ in range(n_trials)]
    train_step_s = min(train_trials)
    rollout_step_s = min(rollout_trials)

    def cost(fn, *a):
        """XLA-counted flops + bytes of the compiled executable."""
        try:
            c = fn.lower(*a).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))
        except Exception:
            return 0.0, 0.0

    if k > 1:
        train_flops, train_bytes = cost(trainer._train_scan, trainer.state, stack, lr, clip)
        train_flops, train_bytes = train_flops / k, train_bytes / k
    else:
        train_flops, train_bytes = cost(trainer._train_step, trainer.state, batch, lr, clip)
    roll_flops, roll_bytes = cost(trainer._eval_step, trainer.state, batch)
    return {
        "batch": batch_size,
        "remat": remat,
        "refiner_remat": refiner_remat,
        "scan": k,
        "wire": wire,
        "train_step_s": train_step_s,
        "rollout_step_s": rollout_step_s,
        "train_trials_s": train_trials,
        "rollout_trials_s": rollout_trials,
        "train_flops": train_flops,
        "roll_flops": roll_flops,
        "train_bytes": train_bytes,
    }


def _true_flops_per_frame():
    """Analytic (depthwise-priced, dot+conv) flops of the train and
    rollout steps, per predicted frame — traced once at the reference
    protocol batch (all dot/conv sites scale linearly with batch; the
    optimizer update contributes no MXU flops). Returns
    (train_per_frame, roll_per_frame, op_stats) or (None, None, {}) if
    tracing fails."""
    import jax.numpy as jnp

    from adnm_tpu.utils.profiling import analytic_flops

    try:
        # refiner_remat=False: the analytic count is the ALGORITHMIC
        # (useful) flops — remat recompute is charged to our wall-clock
        # only, never to the flop numerator or the A100 denominator
        # (the standard MFU convention).
        trainer = _make_trainer(refiner_remat=False)
        rng = np.random.default_rng(0)
        batch = jnp.asarray(
            rng.uniform(0, 1, (4, T_IN + T_OUT, 1, IMG, IMG)).astype(np.float32)
        )
        lr, clip = jnp.float32(1e-3), jnp.float32(0.025)
        tr = analytic_flops(
            lambda st, b: trainer._train_step_impl(st, b, lr, clip),
            trainer.state, batch,
        )
        ro = analytic_flops(trainer._eval_step_impl, trainer.state, batch)
        frames = 4 * T_OUT
        stats = {
            "n_conv_sites_train": tr["n_conv"],
            "n_grouped_conv_sites_train": tr["n_grouped_conv"],
            "n_dot_sites_train": tr["n_dot"],
            "conv_dense_overcount_train": round(
                tr["conv_dense_flops"] / tr["conv_flops"], 2
            ) if tr["conv_flops"] else None,
        }
        del trainer
        import gc

        gc.collect()
        return tr["total"] / frames, ro["total"] / frames, stats
    except Exception as e:
        import sys

        print(f"# true-flop tracing failed: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)
        return None, None, {}


def _measure_end_to_end():
    """Loader-fed sustained training throughput (VERDICT r3 item 4):
    synthetic ShanghaiDataset -> prefetching BatchLoader -> train_epoch.
    Epoch 1 generates/caches clips and compiles; epochs 2-3 are timed.
    In THIS container host->device goes through a loopback tunnel
    (~26 MB / 0.6 s), so the number is transfer-bound and far below the
    device-step throughput — on a host-attached TPU the ingest path is
    >10x faster. Tries E2E_CONFIGS in order (larger configs may OOM);
    returns a detail dict (with any skipped configs recorded) or a
    failure dict — never silently None."""
    import gc
    import sys

    skipped = []
    for e2e_batch, e2e_scan, e2e_wire in E2E_CONFIGS:
        try:
            from adnm_tpu.data.loader import BatchLoader
            from adnm_tpu.data.shanghai import ShanghaiDataset

            ds = ShanghaiDataset(None, img_size=IMG, split="train",
                                 synthetic_len=int(E2E_CLIPS / 0.7),
                                 seq_len=T_IN + T_OUT)
            loader = BatchLoader(ds, e2e_batch, shuffle=True,
                                 transfer_dtype=e2e_wire)
            trainer = _make_trainer(scan_steps=e2e_scan)
            try:
                trainer.train_epoch(loader, lr=1e-3, clip_norm=0.025)  # warmup
                times, steps = [], 0
                for _ in range(2):
                    t0 = time.perf_counter()
                    stats = trainer.train_epoch(loader, lr=1e-3, clip_norm=0.025)
                    times.append(time.perf_counter() - t0)
                    steps = stats["steps"]
                frames = steps * e2e_batch * T_OUT
                best = min(times)
                return {
                    "end_to_end_frames_per_s": round(frames / best, 2),
                    "epoch_seconds": [round(t, 2) for t in times],
                    "steps_per_epoch": steps,
                    "batch": e2e_batch,
                    "scan_steps": e2e_scan,
                    "wire": e2e_wire,
                    "skipped_configs": skipped,
                    "note": "sustained loader-fed training (synthetic data, "
                            "prefetching BatchLoader). In this container "
                            "host->device crosses a loopback tunnel "
                            "(~26MB/0.6s), so this is transfer-bound — a "
                            "host-attached TPU sustains much closer to the "
                            "device-step number.",
                }
            finally:
                del trainer
                gc.collect()
        except Exception as e:
            skipped.append({
                "config": {"batch": e2e_batch, "scan": e2e_scan, "wire": e2e_wire},
                "exception": f"{type(e).__name__}: {str(e)[:200]}",
            })
            print(f"# end-to-end config batch={e2e_batch} scan={e2e_scan} "
                  f"failed: {type(e).__name__}", file=sys.stderr, flush=True)
            gc.collect()
    return {"end_to_end_frames_per_s": None, "skipped_configs": skipped,
            "note": "every end-to-end config failed"}


def _backend_ready(timeout_s: float):
    """Initialize the JAX backend on a watchdog: a wedged accelerator
    tunnel makes jax.devices() block forever (observed when the axon
    relay died mid-round), which would hang the driver instead of
    honoring the one-JSON-line contract. Returns an error string, or
    None when the backend is up (and then initialized for the caller)."""
    import threading

    result = {}

    def probe():
        try:
            import jax

            result["ok"] = [str(d) for d in jax.devices()]
        except Exception as e:
            result["error"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        return (f"jax platform init hung >{timeout_s:.0f}s "
                f"(accelerator tunnel down?)")
    return result.get("error")


def main():
    import os

    err = _backend_ready(float(os.environ.get("ADNM_BENCH_INIT_TIMEOUT_S", "240")))
    if err:
        print(json.dumps({
            "metric": "nowcast frames/sec/chip (train + rollout)",
            "value": None, "unit": "frames/s/chip", "vs_baseline": None,
            "error": err,
        }))
        return

    from adnm_tpu.utils.cache import enable_compile_cache

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    enable_compile_cache(cache)

    runs, failed = [], []
    for cfg in CONFIGS:
        b = cfg["batch"]
        remat = cfg.get("remat", False)
        scan = cfg.get("scan", 1)
        wire = cfg.get("wire", "float32")
        rr = cfg.get("refiner_remat", True)
        try:
            try:
                runs.append(_measure(b, remat, scan, wire, rr))
            except Exception as e:
                # One retry for transient tunnel/compile-service failures
                # (observed: "remote_compile: read body: response body
                # closed" killed the reference-protocol config while the
                # code itself was fine). Deterministic failures (OOM)
                # fail identically the second time and get recorded.
                msg = str(e)
                if not any(s in msg for s in (
                        "remote_compile", "read body", "Socket closed",
                        "DEADLINE_EXCEEDED", "UNAVAILABLE")):
                    raise
                import sys

                print(f"# batch {b} transient backend error, retrying: "
                      f"{type(e).__name__}", file=sys.stderr, flush=True)
                import gc

                gc.collect()
                runs.append(_measure(b, remat, scan, wire, rr))
        except Exception as e:  # e.g. HBM OOM on a smaller accelerator
            import sys

            # record in the JSON too — an r4 regression (batch-14 OOM)
            # shipped unnoticed because failures only went to stderr
            failed.append({
                "config": dict(cfg),
                "exception": f"{type(e).__name__}: {str(e)[:300]}",
            })
            print(f"# batch {b} (remat={remat}, scan={scan}, wire={wire}, "
                  f"refiner_remat={rr}) failed: {type(e).__name__}",
                  file=sys.stderr, flush=True)
            # the traceback held the failed Trainer through _measure's
            # finally; collect again now that it's dropped so the dead
            # config's HBM can't bleed into the next one
            import gc

            gc.collect()

    def combined(r):
        frames = r["batch"] * T_OUT
        return (2 * frames) / (r["train_step_s"] + r["rollout_step_s"])

    if not runs:
        # keep the one-JSON-line contract even when every config fails
        # (e.g. HBM OOM on a smaller accelerator)
        print(json.dumps({
            "metric": "nowcast frames/sec/chip (train + rollout)",
            "value": None, "unit": "frames/s/chip", "vs_baseline": None,
            "error": "all benchmark configs failed (see stderr)",
            "failed": failed,
        }))
        return

    best = max(runs, key=combined)
    frames = best["batch"] * T_OUT

    true_train_pf, true_roll_pf, op_stats = _true_flops_per_frame()
    e2e = _measure_end_to_end()

    # Derived A100 reference estimates (see module docstring), under both
    # flop accountings. Per-frame flop counts come from the NO-remat
    # protocol config (batch-size invariant; our remat recompute flops
    # are charged to us only, never to the baseline).
    base = next((r for r in runs if not r["remat"]), best)
    base_frames = base["batch"] * T_OUT
    a100_rate = A100_BF16_PEAK * A100_ASSUMED_MFU

    def a100_est(train_pf, roll_pf):
        """frames/s an A100 would sustain at a100_rate on per-frame
        flop counts (train_pf, roll_pf), combined-metric weighted."""
        if not train_pf or not roll_pf:
            return None
        t_train = train_pf * frames / a100_rate
        t_roll = roll_pf * frames / a100_rate
        return (2 * frames) / (t_train + t_roll) if (t_train + t_roll) > 0 else None

    a100_dense = a100_est(base["train_flops"] / base_frames,
                          base["roll_flops"] / base_frames)
    a100_true = a100_est(true_train_pf, true_roll_pf)
    ours = combined(best)
    vs_dense = round(ours / a100_dense, 3) if a100_dense else None
    vs_true = round(ours / a100_true, 3) if a100_true else None
    # the dense-priced derivation implicitly assumes the A100 executes
    # the TRUE workload at this rate:
    overcount = (base["train_flops"] / base_frames) / true_train_pf if true_train_pf else None
    implied_a100_true_tflops = round(a100_rate / overcount / 1e12, 1) if overcount else None

    # our own measured utilization, both accountings (true must be < 1)
    true_train_flops_best = true_train_pf * frames if true_train_pf else None
    true_tflops = (round(true_train_flops_best / best["train_step_s"] / 1e12, 1)
                   if true_train_flops_best else None)
    true_mfu = (round(true_train_flops_best / best["train_step_s"] / V5E_BF16_PEAK, 4)
                if true_train_flops_best else None)

    def suspect(r):
        """True when a config's measured true-flop rate exceeds the
        physical chip peak — i.e. the timing must be wrong (the r1-r3
        failure mode; see module docstring)."""
        if not true_train_pf:
            return None
        f = r["batch"] * T_OUT
        return bool(true_train_pf * f / r["train_step_s"] > V5E_BF16_PEAK)

    def per_batch_detail(r):
        f = r["batch"] * T_OUT
        return {
            "batch": r["batch"],
            "remat": r["remat"],
            "refiner_remat": r.get("refiner_remat", True),
            "scan_steps": r.get("scan", 1),
            "wire": r.get("wire", "float32"),
            "timing_suspect": suspect(r),
            "train_step_s": round(r["train_step_s"], 4),
            "rollout_step_s": round(r["rollout_step_s"], 4),
            # measured spread across trials (host/tunnel dispatch noise;
            # the headline uses best-of-trials)
            "train_step_s_trials": [round(t, 4) for t in r["train_trials_s"]],
            "rollout_step_s_trials": [round(t, 4) for t in r["rollout_trials_s"]],
            "train_frames_per_s": round(f / r["train_step_s"], 2),
            "rollout_frames_per_s": round(f / r["rollout_step_s"], 2),
            "combined_frames_per_s": round(combined(r), 2),
        }

    # Sensitivity of the derived multipliers to the assumed A100 MFU
    # (the one assumption): both scale linearly in it.
    def band(vs):
        if vs is None:
            return None
        return {
            "0.25": round(vs * A100_ASSUMED_MFU / 0.25, 3),
            "0.35": vs,
            "0.50": round(vs * A100_ASSUMED_MFU / 0.50, 3),
        }

    result = {
        "metric": "nowcast frames/sec/chip (train + rollout)",
        "value": round(ours, 2),
        "unit": "frames/s/chip",
        "vs_baseline": vs_dense,
        "detail": {
            "headline_batch": best["batch"],
            "headline_remat": best["remat"],
            "headline_refiner_remat": best.get("refiner_remat", True),
            "headline_scan_steps": best.get("scan", 1),
            "headline_wire": best.get("wire", "float32"),
            "timing_protocol": "chained donated-state steps; every timed "
                               "trial fetches all its per-step scalar "
                               "losses to host (np.asarray) — readings "
                               "cannot report dispatch-only time (the "
                               "r1-r3 instrumentation failure; see "
                               "bench.py docstring)",
            "timing_suspect": suspect(best),
            "img": IMG,
            "dtype": "bfloat16 compute, fp32 params",
            "per_batch": [per_batch_detail(r) for r in runs],
            # every config either appears in per_batch or here — a
            # lost config can never ship silently (r4 lesson)
            "failed": failed,
            "end_to_end": e2e,
            "flop_accounting": {
                # TRUE = analytic jaxpr count, grouped convs priced
                # correctly (the MFU convention); XLA = cost_analysis,
                # which prices grouped convs dense and therefore
                # overcounts on this depthwise-heavy model.
                "train_gflops_true": round(true_train_flops_best / 1e9, 1)
                if true_train_flops_best else None,
                "train_gflops_xla_dense": round(best["train_flops"] / 1e9, 1),
                "rollout_gflops_true": round(true_roll_pf * frames / 1e9, 1)
                if true_roll_pf else None,
                "rollout_gflops_xla_dense": round(best["roll_flops"] / 1e9, 1),
                "dense_overcount_factor": round(overcount, 2) if overcount else None,
                "measured_true_tflops_per_s": true_tflops,
                "measured_true_mfu_vs_v5e_peak": true_mfu,
                "xla_dense_priced_tflops_per_s": round(
                    best["train_flops"] / best["train_step_s"] / 1e12, 1
                ) if best["train_flops"] else None,
                "xla_bytes_accessed_gb_per_s": round(
                    best["train_bytes"] / best["train_step_s"] / 1e9, 1
                ) if best["train_bytes"] else None,
                "op_sites": op_stats,
            },
            "baseline_basis": {
                "a100_bf16_peak_tflops": A100_BF16_PEAK / 1e12,
                "a100_assumed_mfu": A100_ASSUMED_MFU,
                "a100_est_frames_per_s_dense_priced": round(a100_dense, 2)
                if a100_dense else None,
                "a100_est_frames_per_s_true_priced": round(a100_true, 2)
                if a100_true else None,
                "vs_baseline_dense_priced": vs_dense,
                "vs_baseline_true_priced": vs_true,
                # what the dense-priced headline implicitly credits the
                # A100 with, in TRUE TFLOP/s (= 312 * 0.35 / overcount):
                "implied_a100_true_tflops_in_headline": implied_a100_true_tflops,
                "vs_baseline_dense_at_assumed_mfu": band(vs_dense),
                "vs_baseline_true_at_assumed_mfu": band(vs_true),
                "formula": "a100_step_s = flops / (312e12 * 0.35); "
                           "vs_baseline(_dense|_true) = ours / a100_est with "
                           "the SAME accounting on both sides; frames-per-"
                           "flop is batch-invariant. The top-level "
                           "vs_baseline is the dense-priced variant "
                           "(continuity with r1-r3); the true-priced "
                           "variant grants torch 35% TRUE MFU and is the "
                           "most conservative bound (see README).",
            },
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
