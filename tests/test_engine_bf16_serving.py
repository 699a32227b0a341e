"""Engine-level accuracy validation of the benched serving configuration
(VERDICT round-2 missing #2: BENCH is bf16 + warp_u8 + skip_bg_warp but all
golden parity runs were f32).

The serving engine differs from the golden-tested f32 engine in exactly
three ways (core/engine.py:71-79): bfloat16 compute, the u8-packed 1-gather
warp feeding the bbox op, and skipping the background channel in the warp.
This validates each at the ENGINE level (full pipeline: on-device preproc,
chunked scan, memorize, regional read, decode, aggregation, packing):

  * f32 + warp_u8 + skip_bg_warp vs plain f32: identical probabilities.
    skip_bg is forward-identical by design (slot 0 never reaches the bbox
    generator) and the <=1/510 u8 mask quantization only matters if a
    warped probability sits within it of the 0.5 bbox threshold — on
    confident masks it never does.
  * bf16 vs f32, teacher-forced single steps from confident ground-truth
    states at several trajectory points (including the new-object-injection
    frame): per-pixel probability error bounded (p99 measured ~4.5e-3;
    asserted < 2e-2), and labels identical wherever the f32 top-2 margin
    exceeds the bf16 noise floor.

Why single steps and not a free-running multi-frame drift bound: an
UNTRAINED network is a chaotic map — its outputs sit at near-ties, so any
precision perturbation flips labels globally regardless of engine
correctness (measured: f32-vs-bf16 free-running label agreement collapses
to ~10% by t=4 with random weights, while per-step probability error stays
~1.5e-3). Whether per-step noise compounds is a property of the
checkpoint's contraction, not of the engine; for a trained checkpoint the
margin distribution is confident and the per-step bound implies label
stability. Trajectory-level J&F delta vs f32 with a real checkpoint is
staged in docs/JF_PARITY.md.
"""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rmnet_tpu.config import Config
from rmnet_tpu.core.engine import InferenceEngine
from rmnet_tpu.models.rmnet import RMNet
from rmnet_tpu.models.tiny_flownet import TinyFlowNet
from rmnet_tpu.models.torch_import import import_state_dict

from tests import torch_ref as TR

T, K, H, W = 4, 4, 240, 427
LOOSE = 32


def _clip():
    rs = np.random.RandomState(7)
    frames = rs.rand(T, H, W, 3).astype(np.float32) * 2 - 1
    labels = np.zeros((T, H, W), np.uint8)
    for t in range(T):
        y = 40 + 4 * t
        labels[t, y : y + 60, 60:160] = 1
        labels[t, 120:200, 200 + 3 * t : 330 + 3 * t] = 2
        if t >= 2:  # object 3 appears at t=2 -> injection path
            labels[t, 20:80, 300:400] = 3
    masks = np.stack([(labels == k) for k in range(K)], axis=1).astype(np.float32)
    flows = np.zeros((T, H, W, 2), np.float32)
    flows[..., 0] = 2.5
    flows[..., 1] = -3.0
    n_objects = np.array([2, 2, 3, 3])
    return frames, masks, flows, n_objects


def _variables():
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
    variables, missing = import_state_dict(variables, t_model.state_dict(),
                                           "reference")
    assert not missing
    return {"params": variables["params"],
            "batch_stats": variables["batch_stats"]}


@pytest.mark.slow
def test_serving_config_engine_accuracy():
    frames, masks, flows, n_objects = _clip()
    rm_vars = _variables()
    tfn_vars = TinyFlowNet().init(
        jax.random.PRNGKey(1), np.zeros((1, 2, 64, 64, 3), np.float32)
    )
    cfg = Config()
    cfg.TEST.MEMORIZE_EVERY = 5
    cfg.TEST.MEMORY_CAPACITY = 0

    ov = {"n_bbox_loose_pixels": LOOSE}
    eng32 = InferenceEngine(cfg, rm_vars, tfn_vars, chunk=1, apply_overrides=ov)
    eng16 = InferenceEngine(cfg, rm_vars, tfn_vars, chunk=1,
                            dtype=jnp.bfloat16, apply_overrides=ov)
    assert eng16.apply.warp_u8 and eng16.apply.skip_bg_warp  # the benched cfg
    engq = InferenceEngine(cfg, rm_vars, tfn_vars, chunk=1, apply_overrides=ov)
    engq.apply = dataclasses.replace(engq.apply, warp_u8=True,
                                     skip_bg_warp=True)

    max_p99 = 0.0
    for t0 in range(T - 1):  # teacher-forced 2-frame windows along the clip
        f2, m2 = frames[t0:t0 + 2], masks[t0:t0 + 2]
        fl2, no2 = flows[t0:t0 + 2], n_objects[t0:t0 + 2]
        p32 = eng32.run_video(f2, m2, no2, flows=fl2)[1]  # (K, H, W)
        p16 = eng16.run_video(f2, m2, no2, flows=fl2)[1]
        pq = engq.run_video(f2, m2, no2, flows=fl2)[1]

        # (1) the u8 warp + bg skip change nothing in f32
        np.testing.assert_array_equal(pq, p32)

        # (2) bf16 engine reproduces f32 probabilities per-pixel
        err = np.abs(p16 - p32).max(axis=0)
        p99 = float(np.quantile(err, 0.99))
        max_p99 = max(max_p99, p99)
        assert p99 < 2e-2, f"t0={t0}: bf16 p99 prob error {p99}"
        assert float(np.median(err)) < 1e-2

        # (3) labels agree wherever f32 is confident (top-2 margin above
        # the bf16 noise floor)
        srt = np.sort(p32, axis=0)
        confident = (srt[-1] - srt[-2]) > 0.05
        if confident.any():
            agree = np.mean(
                p32.argmax(0)[confident] == p16.argmax(0)[confident]
            )
            assert agree > 0.9999, f"t0={t0}: confident agreement {agree}"

    assert max_p99 > 0  # sanity: the engines really computed in bf16 vs f32
