"""Full-resolution (480x854) f32 golden parity — VERDICT round-2 weak #4.

Realistic parity (tests/test_realistic_parity.py) runs at 240x427; the true
DAVIS eval shape 480x854 pads 854 -> 864 and 480 -> 480 (the reference's
pad_divide_by prints 480x912 only because IT pads after the /16-grid concat;
ours pads the same way — helpers.pad_divide_by, reference
utils/helpers.py:105-124). This exercises the real eval geometry once:
streaming engine f32 vs the inline torch spec with imported weights,
T=5 frames, 2 objects, memorize_every=5 (reference test config,
/root/reference/config.py:137-142).

Marked slow: one torch forward + one engine run at full 480p on CPU.
"""

import numpy as np
import pytest
import torch

import jax

from rmnet_tpu.config import Config
from rmnet_tpu.core.engine import InferenceEngine
from rmnet_tpu.models.rmnet import RMNet
from rmnet_tpu.models.tiny_flownet import TinyFlowNet
from rmnet_tpu.models.torch_import import import_state_dict

from tests import torch_ref as TR

B, T, K, H, W = 1, 5, 3, 480, 854


def _build_clip():
    rs = np.random.RandomState(11)
    frames = rs.rand(B, T, H, W, 3).astype(np.float32) * 2 - 1
    labels = np.zeros((B, T, H, W), np.uint8)
    for t in range(T):
        y = 90 + 8 * t
        labels[:, t, y : y + 140, 120:320] = 1
        labels[:, t, 250:400, 420 + 6 * t : 680 + 6 * t] = 2
    masks = np.stack([(labels == k) for k in range(K)], axis=2).astype(np.float32)
    flows = np.zeros((B, T, H, W, 2), np.float32)
    flows[..., 0] = -6.0
    flows[..., 1] = 8.0
    n_objects = np.full((B, T), 2, np.int64)
    return frames, masks, flows, n_objects


@pytest.mark.slow
def test_full_480p_f32_golden_parity():
    frames, masks, flows, n_objects = _build_clip()

    torch.manual_seed(0)
    t_model = TR.RMNetT().eval()  # reference-default 64px bbox dilation
    for m in t_model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.8, 1.4)

    j_model = RMNet()
    variables = j_model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 16, 16, 3), np.float32),
        np.zeros((1, 16, 16), np.float32),
        np.zeros((1, 16, 16), np.float32),
    )
    variables = jax.tree_util.tree_map(np.asarray, variables)
    variables, missing = import_state_dict(variables, t_model.state_dict(), "reference")
    assert not missing

    with torch.no_grad():
        est_torch = t_model(
            torch.from_numpy(frames.transpose(0, 1, 4, 2, 3)),
            torch.from_numpy(masks),
            torch.from_numpy(flows.transpose(0, 1, 4, 2, 3)),
            torch.from_numpy(n_objects),
            5,
        ).numpy()[0]

    cfg = Config()
    cfg.TEST.MEMORIZE_EVERY = 5
    cfg.TEST.MEMORY_CAPACITY = 0  # auto
    engine = InferenceEngine(
        cfg,
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        TinyFlowNet().init(jax.random.PRNGKey(1),
                           np.zeros((1, 2, 64, 64, 3), np.float32)),
        chunk=4,
    )
    est_jax = engine.run_video(frames[0], masks[0], n_objects[0], flows=flows[0])

    diff = np.abs(est_jax - est_torch)
    assert diff.max() < 5e-3, f"prob diff {diff.max()}"
    agree = np.mean(est_jax.argmax(1) == est_torch.argmax(1))
    assert agree > 0.999, f"label agreement {agree}"
