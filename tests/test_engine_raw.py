"""Raw-uint8 engine path (on-device normalize + one-hot) must match the
host-preprocessed labels path exactly."""

import numpy as np

from rmnet_tpu.config import Config
from rmnet_tpu.core.engine import InferenceEngine, build_models


def test_raw_path_matches_host_path():
    cfg = Config()
    cfg.TEST.MEMORY_CAPACITY = 4
    cfg.TEST.MEMORIZE_EVERY = 2
    _, _, rm_vars, tfn_vars = build_models(cfg, 0)
    engine = InferenceEngine(cfg, rm_vars, tfn_vars, chunk=4)

    T, H, W, K = 5, 48, 64, 3
    rs = np.random.RandomState(0)
    frames_u8 = rs.randint(0, 255, (T, H, W, 3), np.uint8)
    gt_labels = np.zeros((T, H, W), np.uint8)
    gt_labels[:, 10:30, 8:28] = 1
    gt_labels[:, 20:40, 40:60] = 2
    n_objects = np.full((T,), 2, np.int32)

    # host preprocessing (the data-pipeline way)
    mean = np.asarray(cfg.CONST.DATASET_MEAN, np.float32)
    std = np.asarray(cfg.CONST.DATASET_STD, np.float32)
    frames = (frames_u8.astype(np.float32) / 255.0 - mean) / std
    masks = np.stack([(gt_labels == k) for k in range(K)], 1).astype(np.uint8)

    host_labels = engine.run_video_labels(frames, masks, n_objects)
    raw_labels = engine.run_video_raw(frames_u8, gt_labels, n_objects, n_slots=K)

    # host numpy and on-device XLA normalization can differ by 1 ULP
    # ((x/255 - mean)/std fuses differently), which random weights can
    # amplify into an argmax tie flip on isolated pixels — allow a
    # vanishing mismatch budget, not bit equality
    mismatch = np.mean(raw_labels != host_labels)
    assert mismatch < 2e-3, f"raw/host label mismatch fraction {mismatch}"


def test_chunk_plan_tapers_tail():
    """Full chunks then C/4 tail chunks; short videos stay single-chunk."""
    cfg = Config()
    _, _, rm_vars, tfn_vars = build_models(cfg, 0)
    eng = InferenceEngine(cfg, rm_vars, tfn_vars, chunk=16)
    assert eng._chunk_plan(5) == [16]          # short: one padded chunk
    assert eng._chunk_plan(16) == [16]
    plan = eng._chunk_plan(47)                 # 2 full + tapered tail
    assert plan[:2] == [16, 16] and set(plan[2:]) == {4}
    assert sum(plan) >= 47
    eng1 = InferenceEngine(cfg, rm_vars, tfn_vars, chunk=1)
    assert eng1._chunk_plan(3) == [1, 1, 1]


def test_label_packing_roundtrip():
    """trit/2-bit/4-bit pack <-> _unpack_labels are exact inverses."""
    rs = np.random.RandomState(0)
    for K, W in ((3, 854), (4, 854), (9, 64), (3, 47)):
        labels = rs.randint(0, K, (2, 1, 5, W)).astype(np.uint8)
        if K <= 3 and W >= 20:
            pad = (-W) % 5
            lp = np.pad(labels, ((0, 0), (0, 0), (0, 0), (0, pad)))
            packed = (lp[..., 0::5] + 3 * lp[..., 1::5] + 9 * lp[..., 2::5]
                      + 27 * lp[..., 3::5] + 81 * lp[..., 4::5])
        elif K <= 4 and W >= 20:
            pad = (-W) % 4
            lp = np.pad(labels, ((0, 0), (0, 0), (0, 0), (0, pad)))
            packed = (lp[..., 0::4] | (lp[..., 1::4] << 2)
                      | (lp[..., 2::4] << 4) | (lp[..., 3::4] << 6))
        else:
            packed = labels[..., 0::2] | (labels[..., 1::2] << 4)
        out = InferenceEngine._unpack_labels(packed.astype(np.uint8), W)
        np.testing.assert_array_equal(out, labels)
