"""Pretrained-backbone initialization wiring (VERDICT round-1 missing #1).

The reference builds both encoders from torchvision
resnet50(pretrained=True) (models/rmnet.py:57,86) and kaiming-inits only the
heads (core/train.py:50-53). Here cfg.TRAIN.BACKBONE_WEIGHTS feeds
load_backbone_weights -> import_resnet50_into_trunk. The test builds a
torchvision-format resnet50 state dict, loads it, trains one step, and
asserts both trunks carry the imported weights.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp


def _torchvision_format_sd():
    """Random ResNet-50 state dict with torchvision naming (layer1..3)."""
    from tests.torch_ref import TrunkT

    torch.manual_seed(0)
    trunk = TrunkT()
    rename = {"res2": "layer1", "res3": "layer2", "res4": "layer3"}
    sd = {}
    for k, v in trunk.state_dict().items():
        head = k.split(".", 1)[0]
        sd[k.replace(head, rename.get(head, head), 1)] = v
    # torchvision extras the importer must ignore
    sd["fc.weight"] = torch.zeros(10, 2048)
    sd["fc.bias"] = torch.zeros(10)
    return sd


def test_backbone_weights_train_one_step(tmp_path):
    from rmnet_tpu.config import Config
    from rmnet_tpu.core.engine import build_models
    from rmnet_tpu.core.train import make_optimizer, make_train_step
    from rmnet_tpu.models.rmnet import RMNetApply
    from rmnet_tpu.utils.checkpoint import load_backbone_weights

    sd = _torchvision_format_sd()
    path = tmp_path / "resnet50-imagenet.pth"
    torch.save(sd, str(path))

    cfg = Config()
    cfg.TRAIN.BACKBONE_WEIGHTS = str(path)
    rmnet, tflownet, rm_vars, tfn_vars = build_models(cfg, 0)

    rm_vars, n_imported = load_backbone_weights(cfg.TRAIN.BACKBONE_WEIGHTS, rm_vars)
    assert n_imported > 200  # conv + bn params/stats of conv1/bn1/layer1..3

    # both trunks carry the exact imported weights (OIHW -> HWIO)
    want_conv1 = sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    for enc in ("encoder_memory", "encoder_query"):
        got = np.asarray(rm_vars["params"][enc]["trunk"]["conv1"]["weight"])
        np.testing.assert_array_equal(got, want_conv1)
        got_rv = np.asarray(
            rm_vars["batch_stats"][enc]["trunk"]["layer2_1"]["bn2"]["running_var"]
        )
        np.testing.assert_array_equal(
            got_rv, sd["layer2.1.bn2.running_var"].numpy()
        )
    # heads stay kaiming/random (untouched by the import)
    kv = np.asarray(rm_vars["params"]["kv_memory"]["key_conv"]["weight"])
    assert np.abs(kv).sum() > 0

    # one train step from the imported init
    apply = RMNetApply(rmnet, memorize_every=1)
    optimizer = make_optimizer(cfg)
    params = rm_vars["params"]
    opt_state = optimizer.init(params)
    extra_vars = {k: v for k, v in rm_vars.items() if k != "params"}
    train_step = make_train_step(cfg, apply, tflownet, optimizer, remat=False)

    rs = np.random.RandomState(0)
    B, T, K, H, W = 1, 2, 3, 32, 32
    labels = rs.randint(0, K, (B, T, H, W))
    batch = {
        "frames": rs.rand(B, T, H, W, 3).astype(np.float32),
        "masks": np.moveaxis(np.eye(K, dtype=np.float32)[labels], -1, 2),
        "flows": (rs.rand(B, T, H, W, 2).astype(np.float32) - 0.5),
        "n_objects": np.full((B, T), K - 1, np.int32),
    }
    new_params, _, _, loss = train_step(params, opt_state, extra_vars, batch,
                                        cfg.TRAIN.LEARNING_RATE)
    assert np.isfinite(float(loss))
    # the trained trunk moved FROM the imported weights (one lr=1e-5 Adam
    # step: tiny delta), i.e. training actually started from the import
    new_conv1 = np.asarray(new_params["encoder_memory"]["trunk"]["conv1"]["weight"])
    delta = np.abs(new_conv1 - want_conv1).max()
    assert 0 < delta < 1e-3
