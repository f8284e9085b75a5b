"""Checkpointing via Orbax (reference: torch.save state_dict,
train.py:169-178,209-213).

Improvements over the reference (documented, not parity-breaking):
optimizer state and batch stats are saved alongside params, enabling
true resume; the reference saves params only. Path scheme mirrors the
reference: {root}/model_params/{dataset}/{model}/{model}_best.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def best_ckpt_dir(root: str, dataset: str, model_name: str) -> str:
    return os.path.join(root, "model_params", dataset, model_name, f"{model_name}_best")


def save_state(path: str, state: Any) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()


def restore_state(path: str, target: Any) -> Any:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=jax.device_get(target))
