"""Multi-stream serving: N videos batched through one compiled chunk
program must match each video served alone.

The reference serves strictly one video at a time
(/root/reference/core/test.py:59-118); single-stream 480p serving on TPU is
latency-bound (docs/PERFORMANCE.md), so `run_videos*` batches streams on the
model batch axis for aggregate throughput. These tests pin (a) numerical
parity with the single-video path for lockstep batches (scalar-cursor
program), (b) the packed-label path against the batched probabilities,
(c) MIXED-schedule and RAGGED-length batches through the per-stream
(B,)-cursor path (`run_video_batch`), and (d) the per-stream ring-buffer
eviction wrap.
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


def _make_video_schedule(seed, x0, appear_t, T_i=T):
    """A video whose 2nd object appears at frame ``appear_t`` (never, if
    >= T_i) — videos built with different appear_t have DIFFERENT
    commit/any_new schedules."""
    rs = np.random.RandomState(seed)
    frames = rs.rand(T_i, H, W, 3).astype(np.float32) * 2 - 1
    labels = np.zeros((T_i, H, W), np.uint8)
    for t in range(T_i):
        y = 6 + 3 * t
        labels[t, y:y + 14, x0:x0 + 14] = 1
        if t >= appear_t:
            labels[t, y + 6:y + 20, x0 + 28:x0 + 42] = 2
    masks = np.stack([(labels == k) for k in range(K)], axis=1).astype(np.float32)
    flows = np.zeros((T_i, H, W, 2), np.float32)
    flows[..., 1] = -2.0 - 0.5 * seed
    n_objects = np.where(np.arange(T_i) >= appear_t, 2, 1).astype(np.int64)
    return frames, masks, n_objects, flows


def test_mixed_schedule_batch_matches_single_videos():
    """Videos with DIFFERENT object-appearance schedules (different
    commit/any_new flags) batch through the per-stream cursor path and
    match each video served alone (reference per-video semantics,
    models/rmnet.py:404-426)."""
    engine = _engine()
    vids = [
        _make_video_schedule(0, 8, appear_t=1),
        _make_video_schedule(1, 14, appear_t=2),  # commits diverge at t=2
        _make_video_schedule(2, 20, appear_t=99),  # single object throughout
    ]
    singles = [engine.run_video(f, m, n, flows=fl) for f, m, n, fl in vids]
    batch = engine.run_video_batch(vids, return_probs=True)
    assert len(batch) == 3
    for i, (est, single) in enumerate(zip(batch, singles)):
        assert est.shape == single.shape
        np.testing.assert_allclose(est, single, rtol=1e-4, atol=1e-4,
                                   err_msg=f"video {i}")

    labels = engine.run_video_batch(vids, return_probs=False)
    for i, (lab, est) in enumerate(zip(labels, batch)):
        np.testing.assert_array_equal(
            lab[1:], np.argmax(est, axis=1).astype(np.uint8)[1:],
            err_msg=f"video {i}",
        )


def test_ragged_length_batch_matches_single_videos():
    """Videos of DIFFERENT lengths: shorter streams freeze past their last
    frame (per-stream step_valid) and outputs are trimmed to true length."""
    engine = _engine()
    vids = [
        _make_video_schedule(0, 8, appear_t=1, T_i=6),
        _make_video_schedule(1, 14, appear_t=1, T_i=4),
        _make_video_schedule(2, 20, appear_t=2, T_i=3),
    ]
    singles = [engine.run_video(f, m, n, flows=fl) for f, m, n, fl in vids]
    batch = engine.run_video_batch(vids, return_probs=True)
    for i, (est, single) in enumerate(zip(batch, singles)):
        assert est.shape == single.shape, f"video {i}: trim to true length"
        np.testing.assert_allclose(est, single, rtol=1e-4, atol=1e-4,
                                   err_msg=f"video {i}")


def test_per_stream_ring_wrap_matches_single_videos():
    """Capacity below the commit count: each stream's ring wraps at its own
    cadence (per-stream one-slot scatter with gather-restore on non-commit
    steps) and still matches the single-video scalar-cursor ring."""
    cfg = Config()
    cfg.TEST.MEMORIZE_EVERY = 1   # commit every frame -> guaranteed wrap
    cfg.TEST.MEMORY_CAPACITY = 2
    _, _, rm_vars, tfn_vars = build_models(cfg, 0)
    engine = InferenceEngine(cfg, rm_vars, tfn_vars, memorize_every=1,
                             capacity=2)
    engine.apply = RMNetApply(engine.rmnet, memorize_every=1,
                              n_bbox_loose_pixels=LOOSE)
    vids = [
        _make_video_schedule(0, 8, appear_t=1, T_i=6),
        _make_video_schedule(1, 14, appear_t=3, T_i=5),
    ]
    singles = [engine.run_video(f, m, n, flows=fl) for f, m, n, fl in vids]
    batch = engine.run_video_batch(vids, return_probs=True)
    for i, (est, single) in enumerate(zip(batch, singles)):
        np.testing.assert_allclose(est, single, rtol=1e-4, atol=1e-4,
                                   err_msg=f"video {i}")
