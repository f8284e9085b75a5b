"""Checkpointing via Orbax (reference: torch.save state_dict,
train.py:169-178,209-213).

Improvements over the reference (documented, not parity-breaking):
optimizer state and batch stats are saved alongside params, enabling
true resume; the reference saves params only. Path scheme mirrors the
reference: {root}/model_params/{dataset}/{model}/{model}_best.

States are stored as a flat top-level dict of the TrainState fields so
layouts can evolve: restore intersects the checkpoint's top-level keys
with the target's and keeps target values for anything missing.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def best_ckpt_dir(root: str, dataset: str, model_name: str) -> str:
    return os.path.join(root, "model_params", dataset, model_name, f"{model_name}_best")


def _to_tree(state: Any) -> dict:
    if hasattr(state, "params"):
        tree = {"params": state.params, "opt_state": state.opt_state}
        if state.batch_stats:
            tree["batch_stats"] = state.batch_stats
        if state.step is not None:
            tree["step"] = state.step
        return tree
    return state


def save_state(path: str, state: Any) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    tree = _to_tree(state)
    if any(
        isinstance(x, jax.Array) and not x.is_fully_addressable
        for x in jax.tree.leaves(tree)
    ):
        # cross-process shards (multi-host ZeRO-1): orbax coordinates the
        # distributed save natively from the global jax.Arrays
        ckptr.save(path, tree, force=True)
    else:
        ckptr.save(path, jax.device_get(tree), force=True)
    ckptr.wait_until_finished()


def _host_template(tree: Any):
    """Host copy of ``tree`` for use as a restore target. Multi-host
    leaves can't be device_get when not fully addressable: replicated
    ones are reconstructed from any local shard (full logical value);
    truly sharded ones (cross-process ZeRO-1 moments) become shape/dtype
    zeros templates. Returns (template, zeroed_top_keys) so the caller
    can refuse to silently keep zeros for keys the checkpoint lacks."""
    import numpy as np

    zeroed: set = set()

    def leaf(key, x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            if x.sharding.is_fully_replicated:
                return np.asarray(x.addressable_shards[0].data)
            zeroed.add(key)
            return np.zeros(x.shape, x.dtype)
        return jax.device_get(x)

    out = {k: jax.tree.map(lambda x, k=k: leaf(k, x), v) for k, v in tree.items()}
    return out, zeroed


def restore_state(path: str, target: Any) -> Any:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    tgt_tree, zeroed_keys = _host_template(_to_tree(target))
    try:
        meta = ckptr.metadata(path)
        avail = set(meta.item_metadata.keys() if hasattr(meta, "item_metadata") else meta.keys())
    except Exception:
        avail = set(tgt_tree.keys())
    sub_tgt = {k: v for k, v in tgt_tree.items() if k in avail}
    try:
        restored = ckptr.restore(path, target=sub_tgt)
    except Exception as e:
        # optimizer-state layout changed (e.g. optax.flatten migration):
        # fall back to params(+stats) only, keep a fresh optimizer
        import logging

        logging.warning("full train-state restore failed (%s); restoring params only", e)
        keep = {k: v for k, v in sub_tgt.items() if k in ("params", "batch_stats")}
        restored = ckptr.restore(path, target=keep)
    missing_zeroed = zeroed_keys - set(restored)
    if missing_zeroed:
        # These target leaves were zeros TEMPLATES (cross-process ZeRO-1
        # moment shards). For the documented params-only fallback that is
        # exactly a FRESH optimizer (optax moments init to zeros; the
        # replicated count/hyperparam scalars were reconstructed from
        # local shards) — same intent as the single-host fallback, so
        # warn loudly rather than fail the resume.
        import logging

        logging.warning(
            "checkpoint %s lacks %s; multi-host restore keeps FRESH "
            "(zero) optimizer moments for those", path, sorted(missing_zeroed)
        )
    merged = dict(tgt_tree)
    merged.update(restored)
    if hasattr(target, "params"):
        return type(target)(
            params=merged["params"],
            opt_state=merged["opt_state"],
            batch_stats=merged.get("batch_stats", target.batch_stats),
            step=merged.get("step", target.step),
        )
    return merged
