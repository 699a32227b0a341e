"""Full-train-state checkpointing (orbax) + reference-.pth import glue.

Improves on the reference, which saves only weights + metrics and does not
restore the epoch or optimizer state on resume (core/train.py:85-98,
212-231): here the checkpoint holds {epoch, params (both nets), opt_state,
rng, best_metrics} so resume continues the schedule exactly.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(directory: str, name: str, state: Dict[str, Any]) -> str:
    """Save a pytree state under directory/name (atomic orbax save)."""
    path = os.path.abspath(os.path.join(directory, name))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, _to_host(state), force=True)
    return path


def load_checkpoint(path: str):
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def latest_checkpoint(directory: str, pattern: str = r"ckpt-epoch-(\d+)") -> Optional[str]:
    """Path of the highest-epoch checkpoint in a directory, or None."""
    best, best_epoch = None, -1
    if not os.path.isdir(directory):
        return None
    for entry in os.listdir(directory):
        m = re.match(pattern, entry)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(directory, entry)
    return best


def load_weights_auto(path: str, rmnet_variables, tflownet_variables):
    """Load either a framework orbax checkpoint or a reference torch .pth
    into (rmnet_variables, tflownet_variables); returns (rmnet, tflownet,
    extras dict)."""
    if path.endswith(".pth") or path.endswith(".pt"):
        from rmnet_tpu.models.torch_import import (
            import_state_dict,
            load_reference_checkpoint,
        )

        ckpt = load_reference_checkpoint(path)
        rmnet_vars, miss_r = import_state_dict(
            _to_mutable(rmnet_variables), ckpt["rmnet"], "reference"
        )
        tfn_vars, miss_t = import_state_dict(
            _to_mutable(tflownet_variables), ckpt["tflownet"], "reference"
        )
        if miss_r or miss_t:
            raise KeyError(f"unmapped torch keys: {miss_r + miss_t}")
        return rmnet_vars, tfn_vars, {
            "epoch": ckpt.get("epoch_index"),
            "best_metrics": ckpt.get("best_metrics"),
        }
    state = load_checkpoint(path)
    return state["rmnet"], state["tflownet"], {
        "epoch": state.get("epoch"),
        "best_metrics": state.get("best_metrics"),
        "opt_state": state.get("opt_state"),
    }


def _to_mutable(tree):
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return np.asarray(tree)


def load_backbone_weights(source: str, rmnet_variables):
    """ImageNet-pretrained encoder initialization for training.

    Loads a torchvision-format ResNet-50 state dict into BOTH encoder
    trunks (conv1/bn1/layer1..3 params + running stats), leaving the
    kaiming-initialized heads and mask stems untouched — the reference's
    init scheme (models/rmnet.py:57,86 builds the encoders from
    ``torchvision.models.resnet50(pretrained=True)``; core/train.py:50-53
    re-inits only kv/decoder heads).

    ``source``: path to a ``.pth``/``.pt`` state dict (raw resnet50, or a
    checkpoint dict with a ``state_dict``/``model`` entry), or the token
    ``"torchvision"`` to load via torchvision's local weight cache.

    Returns (variables, n_imported) with the trunks filled in.
    """
    from rmnet_tpu.models.torch_import import import_resnet50_into_trunk

    if source == "torchvision":
        import torchvision  # local cache only; no download in this env

        sd = torchvision.models.resnet50(
            weights=torchvision.models.ResNet50_Weights.IMAGENET1K_V1
        ).state_dict()
    else:
        import torch

        obj = torch.load(source, map_location="cpu", weights_only=False)
        sd = obj
        for key in ("state_dict", "model"):
            if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
                sd = sd[key]
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()

    variables, missing = import_resnet50_into_trunk(_to_mutable(rmnet_variables), sd)
    # trunk leaves that were NOT matched are reported in ``missing``; the
    # imported count is total trunk leaves minus those
    n_trunk = sum(
        1
        for collection in variables
        for enc in ("encoder_memory", "encoder_query")
        for _ in jax.tree_util.tree_leaves(
            variables[collection].get(enc, {}).get("trunk", {})
        )
    )
    n_imported = n_trunk - len(missing)
    if n_imported <= 0:
        raise ValueError(f"no trunk weights imported from {source}")
    return variables, n_imported
