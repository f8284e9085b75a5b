"""Profiling / tracing hooks (reference aux subsystem: the vestigial
print_memory_usage at ADNMUNet.py:37-48 and the Swin flops() estimators
at SwinUnet.py:410-421 etc. — here as first-class utilities).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/adnm_trace"):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_timer(name: str = "step", sync: bool = True, log_fn: Callable[[str], None] = print):
    t0 = time.perf_counter()
    box = {}
    try:
        yield box
    finally:
        if sync and "result" in box:
            jax.block_until_ready(box["result"])
        dt = time.perf_counter() - t0
        box["seconds"] = dt
        log_fn(f"[{name}] {dt * 1e3:.2f} ms")


def estimate_flops(fn: Callable, *args, **kwargs) -> Optional[float]:
    """Static FLOP estimate via XLA cost analysis (replaces the
    hand-written per-module flops() methods in the reference).

    CAVEAT: XLA's counter prices grouped/depthwise convolutions as if
    they were dense (multiplies by the full input channel count), so on
    depthwise-heavy models it overcounts by up to the channel count.
    Use :func:`analytic_flops` for a correctly grouped count.
    """
    try:
        lowered = jax.jit(fn).lower(*args, **kwargs)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:
        return None


def analytic_flops(fn: Callable, *args, **kwargs) -> dict:
    """True MXU FLOPs of ``fn`` by jaxpr traversal — no compile needed.

    Counts multiply-accumulate FLOPs (2 * MACs) of every
    ``dot_general`` and ``conv_general_dilated`` in the traced program,
    recursing into scan/pjit/cond/custom-vjp sub-jaxprs (scan bodies are
    multiplied by their trip count). Grouped/depthwise convolutions are
    priced CORRECTLY (per-group input channels), unlike XLA's
    ``cost_analysis`` which prices them dense — on the flagship
    ADNM-UNet (hundreds of depthwise convs, reference
    models/ADNssd.py:106-185's conv2d branches) the dense-priced count
    is several times the true count. This is the "model FLOPs" of the
    MFU convention (matmul/conv only; elementwise ignored).

    Returns a dict:
      total         — true MXU FLOPs (dot + conv, grouped pricing)
      dot_flops     — dot_general contribution
      conv_flops    — conv contribution (grouped pricing)
      conv_dense_flops — what the convs would cost if priced dense
                      (feature_group_count folded back in); XLA-style
      n_dot / n_conv / n_grouped_conv — op-site counts (static sites,
                      scan bodies counted once per site)
      while_seen    — True if a while_loop body was counted only once
                      (unknown trip count; our graphs don't use one)
    """
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    acc = {
        "total": 0.0, "dot_flops": 0.0, "conv_flops": 0.0,
        "conv_dense_flops": 0.0, "n_dot": 0, "n_conv": 0,
        "n_grouped_conv": 0, "while_seen": False,
    }
    _count_jaxpr(closed.jaxpr, 1.0, acc)
    acc["total"] = acc["dot_flops"] + acc["conv_flops"]
    return acc


def _prod(xs) -> float:
    out = 1.0
    for x in xs:
        out *= float(x)
    return out


def _count_jaxpr(jaxpr, mult: float, acc: dict) -> None:
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
            lhs = eqn.invars[0].aval.shape
            rhs = eqn.invars[1].aval.shape
            batch = _prod(lhs[i] for i in lb)
            contract = _prod(lhs[i] for i in lc)
            m = _prod(d for i, d in enumerate(lhs) if i not in set(lb) | set(lc))
            n = _prod(d for i, d in enumerate(rhs) if i not in set(rb) | set(rc))
            acc["dot_flops"] += mult * 2.0 * batch * m * n * contract
            acc["n_dot"] += 1
        elif name == "conv_general_dilated":
            rhs = eqn.invars[1].aval.shape
            out = eqn.outvars[0].aval.shape
            dn = eqn.params["dimension_numbers"]
            fgc = int(eqn.params.get("feature_group_count", 1))
            k_spatial = _prod(rhs[i] for i in dn.rhs_spec[2:])
            in_ch_per_group = rhs[dn.rhs_spec[1]]  # already C_in / fgc
            f = mult * 2.0 * _prod(out) * in_ch_per_group * k_spatial
            acc["conv_flops"] += f
            acc["conv_dense_flops"] += f * fgc
            acc["n_conv"] += 1
            if fgc > 1:
                acc["n_grouped_conv"] += 1
        elif name == "while":
            acc["while_seen"] = True
            _count_sub(eqn.params.get("body_jaxpr"), mult, acc)
        elif name == "cond":
            # take the max branch (upper bound) by counting into a
            # scratch accumulator per branch
            best, best_acc = -1.0, None
            for br in eqn.params.get("branches", ()):
                sub = {"total": 0.0, "dot_flops": 0.0, "conv_flops": 0.0,
                       "conv_dense_flops": 0.0, "n_dot": 0, "n_conv": 0,
                       "n_grouped_conv": 0, "while_seen": False}
                _count_sub(br, mult, sub)
                tot = sub["dot_flops"] + sub["conv_flops"]
                if tot > best:
                    best, best_acc = tot, sub
            if best_acc is not None:
                for k in ("dot_flops", "conv_flops", "conv_dense_flops"):
                    acc[k] += best_acc[k]
                for k in ("n_dot", "n_conv", "n_grouped_conv"):
                    acc[k] += best_acc[k]
                acc["while_seen"] = acc["while_seen"] or best_acc["while_seen"]
        else:
            length = float(eqn.params["length"]) if name == "scan" else 1.0
            for v in eqn.params.values():
                _count_sub(v, mult * length, acc)


def _count_sub(obj, mult: float, acc: dict) -> None:
    """Recurse into jaxpr-valued eqn params (ClosedJaxpr, Jaxpr, or
    tuples thereof) — covers pjit/scan/remat/custom_jvp/custom_vjp
    without naming every wrapper primitive."""
    if obj is None:
        return
    if isinstance(obj, (tuple, list)):
        for o in obj:
            _count_sub(o, mult, acc)
        return
    inner = getattr(obj, "jaxpr", None)
    if inner is not None and hasattr(inner, "eqns"):  # ClosedJaxpr
        _count_jaxpr(inner, mult, acc)
    elif hasattr(obj, "eqns"):  # open Jaxpr
        _count_jaxpr(obj, mult, acc)


def device_memory_stats() -> dict:
    """Per-device memory stats (replaces print_memory_usage)."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
