"""Import torch checkpoints (reference .pth / torchvision resnet50) into flax.

The reference publishes 202 MB .pth checkpoints holding
``{epoch_index, best_metrics, tflownet, rmnet}`` state dicts with
``module.`` DataParallel prefixes (core/train.py:212-231,
utils/eval_server.py:92). This module converts those — and raw torchvision
ResNet-50 state dicts — into this framework's flax variable trees, so parity
configs can run the reference's own weights on TPU.

Layout conversions:
  Conv2d          OIHW -> HWIO                    (transpose 2,3,1,0)
  ConvTranspose2d IOHW -> HWIO, spatially flipped (w[:, :, ::-1, ::-1]
                  then transpose 2,3,0,1) — matches the dilated-conv
                  implementation in rmnet_tpu/nn/layers.py.
  BatchNorm       weight/bias -> params; running_mean/var -> batch_stats.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

# flax module names implemented as ConvTranspose2d (need the flip+transpose)
_CONV_TRANSPOSE_NAMES = {
    "deconv4", "deconv3", "deconv2",
    "upsampled_flow5_to_4", "upsampled_flow4_to_3", "upsampled_flow3_to_2",
}

# trunk layer names: flax uses torchvision's layer1..3; the reference
# encoders rename them res2..res4 (models/rmnet.py:62-64)
_TRUNK_RENAME_REFERENCE = {"layer1": "res2", "layer2": "res3", "layer3": "res4"}


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def strip_module_prefix(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Remove DataParallel 'module.' prefixes (utils/eval_server.py:92)."""
    return {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}


def _flax_path_to_torch_key(path: Tuple[str, ...], trunk_rename: Mapping[str, str]) -> str:
    """Map a flax variable path to the corresponding torch state-dict key."""
    parts = []
    for p in path:
        if p == "trunk":
            continue  # trunk is an organizational wrapper, flattened in torch
        if p == "downsample_conv":
            parts.append("downsample")  # ResBlock: direct conv attr
        elif p == "downsample_bn":
            parts.append("downsample.1")  # Bottleneck Sequential index
        elif "_" in p and p.split("_")[0] in ("layer1", "layer2", "layer3"):
            layer, idx = p.rsplit("_", 1)
            parts.append(f"{trunk_rename.get(layer, layer)}.{idx}")
        else:
            parts.append(p)
    # NOTE: 'downsample_conv' maps to 'downsample' — correct for ResBlock's
    # direct conv attr; the Bottleneck Sequential form 'downsample.0' is
    # found via the '<mod>.0.<leaf>' fallback in _fill_tree.
    return ".".join(parts)


def _convert_weight(path: Tuple[str, ...], torch_arr: np.ndarray) -> np.ndarray:
    arr = _to_numpy(torch_arr)
    leaf = path[-1]
    module = path[-2] if len(path) >= 2 else ""
    if leaf == "weight" and arr.ndim == 4:
        if module in _CONV_TRANSPOSE_NAMES:
            return np.ascontiguousarray(arr[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))
        return np.ascontiguousarray(arr.transpose(2, 3, 1, 0))
    return arr


def _fill_tree(
    tree: Dict[str, Any],
    sd: Mapping[str, np.ndarray],
    prefix: Tuple[str, ...],
    trunk_rename: Mapping[str, str],
    extra_seq_index: Mapping[str, str],
    strict: bool,
    missing: list,
):
    for name, sub in tree.items():
        path = prefix + (name,)
        if isinstance(sub, dict):
            _fill_tree(sub, sd, path, trunk_rename, extra_seq_index, strict, missing)
            continue
        key = _flax_path_to_torch_key(path, trunk_rename)
        if key not in sd:
            # Sequential-wrapped convs in the reference TinyFlowNet
            # (conv1 = Sequential(Conv2d, LeakyReLU)) live at '<name>.0.<leaf>'
            mod = ".".join(key.split(".")[:-1])
            alt = f"{mod}.0.{key.split('.')[-1]}"
            if alt in sd:
                key = alt
        if key in sd:
            arr = _convert_weight(path, sd[key])
            if arr.shape != sub.shape:
                raise ValueError(f"shape mismatch for {key}: torch {arr.shape} vs flax {sub.shape}")
            tree[name] = arr.astype(np.asarray(sub).dtype)
        else:
            missing.append(".".join(path))
            if strict:
                raise KeyError(f"torch key not found for flax path {'.'.join(path)} (tried {key})")


def import_state_dict(
    variables: Dict[str, Any],
    torch_sd: Mapping[str, Any],
    trunk_names: str = "reference",
    strict: bool = True,
):
    """Fill a flax variables dict ({'params':..., 'batch_stats':...}) from a
    torch state dict. ``trunk_names='reference'`` expects res2/res3/res4
    encoder naming; ``'torchvision'`` expects layer1/2/3 (raw resnet50)."""
    import jax

    sd = strip_module_prefix(dict(torch_sd))
    rename = _TRUNK_RENAME_REFERENCE if trunk_names == "reference" else {}
    out = jax.tree_util.tree_map(lambda x: np.asarray(x), variables)
    missing: list = []
    for collection in out:
        _fill_tree(out[collection], sd, (), rename, {}, strict, missing)
    if missing and strict:
        raise KeyError(f"missing torch keys for: {missing}")
    return jax.tree_util.tree_map(lambda x: np.asarray(x), out), missing


def import_resnet50_into_trunk(
    variables: Dict[str, Any],
    resnet_sd: Mapping[str, Any],
    encoder_names=("encoder_memory", "encoder_query"),
):
    """Load a torchvision resnet50 state dict into both encoder trunks
    (conv1/bn1/layer1..3), leaving heads/stems untouched — the reference's
    pretrained-encoder initialization (models/rmnet.py:57-64, 86-94)."""
    import jax

    sd = strip_module_prefix(dict(resnet_sd))
    out = jax.tree_util.tree_map(lambda x: np.asarray(x), variables)
    missing: list = []
    for collection in out:
        for enc in encoder_names:
            enc_tree = out[collection].get(enc)
            if enc_tree is None or "trunk" not in enc_tree:
                continue
            _fill_tree(enc_tree["trunk"], sd, (), {}, {}, False, missing)
    return out, missing


def load_reference_checkpoint(path: str):
    """Load a reference .pth (torch.load) and return its component dicts."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return {
        "epoch_index": ckpt.get("epoch_index"),
        "best_metrics": ckpt.get("best_metrics"),
        "tflownet": strip_module_prefix(ckpt.get("tflownet", {})),
        "rmnet": strip_module_prefix(ckpt.get("rmnet", {})),
    }
