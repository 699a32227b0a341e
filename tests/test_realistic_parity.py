"""Full-forward parity at a REALISTIC configuration (VERDICT round-1 #3).

Round-1 parity was proven only at 48x64, T=3, memorize_every=1. This test
runs the torch golden spec (tests/torch_ref.py, reference-exact semantics)
against the streaming InferenceEngine at half-480p geometry with the real
eval structure:

  * 240x427 frames (the 480p aspect; W pads 427->432 like 854->864, so the
    symmetric-padding path is exercised at realistic shape),
  * 3 objects + background, one object appearing mid-video (injection path),
  * memorize_every=5 with T=8 (two committed bank entries + ephemeral prev),
  * TTA ON: LR-flip pass with negated flow-x, averaged
    (reference utils/helpers.py:58-78),
  * auto-sized memory bank (TEST.MEMORY_CAPACITY=0).

Weights are imported from the torch spec, so any numerical drift in the
encoder/reader/decoder stack at scale shows up here. Tolerance 5e-3 on
probabilities (the round-1 bar) + >99.9% label agreement.
"""

import numpy as np
import torch

import jax

from rmnet_tpu.config import Config
from rmnet_tpu.core.engine import InferenceEngine
from rmnet_tpu.models.rmnet import RMNet
from rmnet_tpu.models.tiny_flownet import TinyFlowNet
from rmnet_tpu.models.torch_import import import_state_dict

from tests import torch_ref as TR

B, T, K, H, W = 1, 8, 4, 240, 427
LOOSE = 32  # bbox dilation scaled with the half-480p resolution


def _build_clip():
    rs = np.random.RandomState(7)
    frames = rs.rand(B, T, H, W, 3).astype(np.float32) * 2 - 1
    labels = np.zeros((B, T, H, W), np.uint8)
    for t in range(T):
        y = 40 + 4 * t
        labels[:, t, y : y + 60, 60:160] = 1
        labels[:, t, 120:200, 200 + 3 * t : 330 + 3 * t] = 2
        if t >= 2:  # object 3 appears at t=2 -> new-object injection
            labels[:, t, 20:80, 300:400] = 3
    masks = np.stack([(labels == k) for k in range(K)], axis=2).astype(np.float32)
    flows = np.zeros((B, T, H, W, 2), np.float32)
    flows[..., 0] = 2.5   # constant backward flow: x
    flows[..., 1] = -3.0  # y
    n_objects = np.array([[2, 2, 3, 3, 3, 3, 3, 3]])
    return frames, masks, flows, n_objects


def test_realistic_shape_parity_with_flip_tta():
    frames, masks, flows, n_objects = _build_clip()

    torch.manual_seed(0)
    t_model = TR.RMNetT(n_bbox_loose_pixels=LOOSE).eval()
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

    # ---- torch golden: straight pass + LR-flip pass, averaged
    f_t = torch.from_numpy(frames.transpose(0, 1, 4, 2, 3))
    m_t = torch.from_numpy(masks)
    fl_t = torch.from_numpy(flows.transpose(0, 1, 4, 2, 3))
    no_t = torch.from_numpy(n_objects)
    with torch.no_grad():
        est_a = t_model(f_t, m_t, fl_t, no_t, 5)
        f_f = torch.flip(f_t, dims=(-1,))
        m_f = torch.flip(m_t, dims=(-1,))
        fl_f = torch.flip(fl_t, dims=(-1,))
        fl_f[:, :, 0] = -fl_f[:, :, 0]  # reference utils/helpers.py:60-62
        est_b = torch.flip(t_model(f_f, m_f, fl_f, no_t, 5), dims=(-1,))
    est_torch = ((est_a + est_b) / 2).numpy()[0]  # (T, K, H, W)

    # ---- engine: streaming chunked scan, auto bank capacity
    cfg = Config()
    cfg.TEST.MEMORIZE_EVERY = 5
    cfg.TEST.MEMORY_CAPACITY = 0  # auto
    engine = InferenceEngine(cfg, {"params": variables["params"],
                                   "batch_stats": variables["batch_stats"]},
                             TinyFlowNet().init(jax.random.PRNGKey(1),
                                                np.zeros((1, 2, 64, 64, 3), np.float32)),
                             chunk=4,
                             apply_overrides={"n_bbox_loose_pixels": LOOSE})

    est_1 = engine.run_video(frames[0], masks[0], n_objects[0], flows=flows[0])
    fr_f = frames[0, :, :, ::-1].copy()
    mk_f = masks[0, :, :, :, ::-1].copy()
    fl_f = flows[0, :, :, ::-1].copy()
    fl_f[..., 0] = -fl_f[..., 0]
    est_2 = engine.run_video(fr_f, mk_f, n_objects[0], flows=fl_f)[:, :, :, ::-1]
    est_jax = (est_1 + est_2) / 2

    diff = np.abs(est_jax - est_torch)
    assert diff.max() < 5e-3, f"prob diff {diff.max()}"
    agree = np.mean(est_jax.argmax(1) == est_torch.argmax(1))
    assert agree > 0.999, f"label agreement {agree}"
