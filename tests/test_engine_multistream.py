"""Multi-stream lockstep serving: N videos batched through one compiled
chunk program must match each video served alone.

The reference serves strictly one video at a time
(/root/reference/core/test.py:59-118); single-stream 480p serving on TPU is
latency-bound (docs/PERFORMANCE.md), so `run_videos*` batches streams on the
model batch axis for aggregate throughput. These tests pin (a) numerical
parity with the single-video path, (b) the packed-label path against the
batched probabilities, and (c) the lockstep-schedule guard.
"""

import numpy as np
import pytest

from rmnet_tpu.config import Config
from rmnet_tpu.core.engine import InferenceEngine, build_models
from rmnet_tpu.models.rmnet import RMNetApply

T, K, H, W = 4, 4, 48, 64
LOOSE = 8


def _make_video(seed, x0):
    rs = np.random.RandomState(seed)
    frames = rs.rand(T, H, W, 3).astype(np.float32) * 2 - 1
    labels = np.zeros((T, H, W), np.uint8)
    for t in range(T):
        y = 6 + 3 * t
        labels[t, y:y + 14, x0:x0 + 14] = 1
        if t >= 1:  # object 2 appears at t=1 (same schedule in every video)
            labels[t, y + 6:y + 20, x0 + 28:x0 + 42] = 2
    masks = np.stack([(labels == k) for k in range(K)], axis=1).astype(np.float32)
    flows = np.zeros((T, H, W, 2), np.float32)
    flows[..., 1] = -2.0 - 0.5 * seed
    n_objects = np.array([1, 2, 2, 2])
    return frames, masks, flows, n_objects


def _engine():
    cfg = Config()
    cfg.TEST.MEMORIZE_EVERY = 2
    cfg.TEST.MEMORY_CAPACITY = 4
    _, _, rm_vars, tfn_vars = build_models(cfg, 0)
    engine = InferenceEngine(cfg, rm_vars, tfn_vars, memorize_every=2, capacity=4)
    engine.apply = RMNetApply(engine.rmnet, memorize_every=2,
                              n_bbox_loose_pixels=LOOSE)
    return engine


def test_multistream_matches_single_video():
    engine = _engine()
    vids = [_make_video(0, 8), _make_video(1, 14)]
    singles = [engine.run_video(f, m, n, flows=fl) for f, m, fl, n in vids]

    frames = np.stack([v[0] for v in vids])
    masks = np.stack([v[1] for v in vids])
    flows = np.stack([v[2] for v in vids])
    n_objects = np.stack([v[3] for v in vids])

    est = engine.run_videos(frames, masks, n_objects, flows=flows)
    assert est.shape == (2, T, K, H, W)
    for i in range(2):
        np.testing.assert_allclose(est[i], singles[i], rtol=1e-4, atol=1e-4)

    # packed-label path: must equal the argmax of the batched probabilities
    # (bit-exact round trip through the on-device trit/2-bit packing)
    labels = engine.run_videos_labels(frames, masks, n_objects, flows=flows)
    assert labels.shape == (2, T, H, W)
    np.testing.assert_array_equal(labels[:, 1:],
                                  np.argmax(est, axis=2).astype(np.uint8)[:, 1:])
    # frame 0 is the given ground truth in both paths
    np.testing.assert_array_equal(labels[:, 0], np.argmax(masks[:, 0], axis=1))


def test_multistream_requires_lockstep_schedule():
    engine = _engine()
    f, m, fl, n = _make_video(0, 8)
    f2, m2, fl2, _ = _make_video(1, 14)
    n2 = np.array([1, 1, 2, 2])  # object 2 appears a frame later
    with pytest.raises(ValueError, match="lockstep"):
        engine.run_videos_labels(
            np.stack([f, f2]), np.stack([m, m2]), np.stack([n, n2]),
            flows=np.stack([fl, fl2]),
        )
