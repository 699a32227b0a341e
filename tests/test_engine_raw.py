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
