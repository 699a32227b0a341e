"""Streaming engine consistency: the jitted per-frame streaming path must
produce the same masks as the scan-based whole-sequence forward."""

import numpy as np

import jax
import jax.numpy as jnp

from rmnet_tpu.config import Config
from rmnet_tpu.core.engine import InferenceEngine, build_models
from rmnet_tpu.models.rmnet import RMNetApply

from tests.test_rmnet_forward import build_clip, B, T, K, H, W, LOOSE


def test_streaming_matches_scan_forward():
    frames, masks, flows, n_objects = build_clip()
    cfg = Config()
    cfg.TEST.MEMORIZE_EVERY = 1
    cfg.TEST.MEMORY_CAPACITY = 4

    rmnet, tfn, rm_vars, tfn_vars = build_models(cfg, 0)
    apply = RMNetApply(rmnet, memorize_every=1, n_bbox_loose_pixels=LOOSE)
    est_scan = np.asarray(
        jax.jit(apply.forward_video)(
            rm_vars, jnp.asarray(frames), jnp.asarray(masks),
            jnp.asarray(flows), jnp.asarray(n_objects),
        )
    )

    engine = InferenceEngine(cfg, rm_vars, tfn_vars, memorize_every=1, capacity=4)
    engine.apply = RMNetApply(engine.rmnet, memorize_every=1, n_bbox_loose_pixels=LOOSE)
    est_stream = engine.run_video(frames[0], masks[0], n_objects[0], flows[0])

    np.testing.assert_allclose(est_stream, est_scan[0], rtol=1e-4, atol=1e-4)


def test_tinyflownet_chunked_flows_shapes():
    cfg = Config()
    _, _, rm_vars, tfn_vars = build_models(cfg, 0)
    engine = InferenceEngine(cfg, rm_vars, tfn_vars)
    frames = np.random.RandomState(0).rand(5, 64, 64, 3).astype(np.float32)
    flows = engine.compute_flows(frames, chunk=2)  # exercises chunk padding
    assert flows.shape == (5, 64, 64, 2)
    np.testing.assert_array_equal(flows[0], 0.0)
    assert np.isfinite(flows).all()


def test_update_weights_no_recompile_matches_fresh_engine():
    """update_weights must swap checkpoints WITHOUT recompiling (weights are
    jit arguments): after a swap the reused engine produces exactly what a
    fresh engine with the new weights produces, with no new compiled fns."""
    frames, masks, flows, n_objects = build_clip()
    cfg = Config()
    cfg.TEST.MEMORIZE_EVERY = 1
    cfg.TEST.MEMORY_CAPACITY = 4

    _, _, rm_a, tfn_a = build_models(cfg, 0)
    _, _, rm_b, tfn_b = build_models(cfg, 1)

    engine = InferenceEngine(cfg, rm_a, tfn_a, memorize_every=1, capacity=4)
    out_a = engine.run_video(frames[0], masks[0], n_objects[0], flows[0])
    n_compiled = len(engine._chunk_fns)

    engine.update_weights(rm_b, tfn_b)
    out_b = engine.run_video(frames[0], masks[0], n_objects[0], flows[0])
    assert len(engine._chunk_fns) == n_compiled, "weight swap recompiled"

    fresh = InferenceEngine(cfg, rm_b, tfn_b, memorize_every=1, capacity=4)
    out_fresh = fresh.run_video(frames[0], masks[0], n_objects[0], flows[0])
    assert not np.array_equal(out_a, out_b)  # weights actually changed
    np.testing.assert_array_equal(out_b, out_fresh)


def test_update_weights_swaps_tinyflownet():
    """TinyFlowNet weights are jit arguments too: compute_flows (and the
    in-loop tfn_flow) must reflect swapped weights without recompiling."""
    cfg = Config()
    _, _, rm_a, tfn_a = build_models(cfg, 0)
    _, _, rm_b, tfn_b = build_models(cfg, 1)
    engine = InferenceEngine(cfg, rm_a, tfn_a)
    frames = np.random.RandomState(0).rand(3, 64, 64, 3).astype(np.float32)
    fl_a = engine.compute_flows(frames)
    engine.update_weights(rm_b, tfn_b)
    fl_b = engine.compute_flows(frames)
    fresh = InferenceEngine(cfg, rm_b, tfn_b)
    np.testing.assert_array_equal(fl_b, fresh.compute_flows(frames))
    assert not np.array_equal(fl_a, fl_b)
