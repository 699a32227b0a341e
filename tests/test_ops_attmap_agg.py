"""Golden tests: regional attention map (vs numpy port of the CUDA kernel),
soft aggregation (vs torch port of the reference loop), straight-through grad."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from rmnet_tpu.ops import regional_attention_map, soft_aggregation
from rmnet_tpu.ops.aggregation import SUPPRESSED_LOGIT


def numpy_reg_att_map(mask, prob_threshold=0.5, n_pts_threshold=10, loose=64):
    """Numpy golden with the semantics of reg_att_map_generator.cu:15-93."""
    B, K, H, W = mask.shape
    att = np.zeros((B, K, H, W), np.float32)
    bboxes = np.zeros((B, K, 4), np.int32)
    for b in range(B):
        for k in range(1, K):
            ys, xs = np.where(mask[b, k] >= prob_threshold)
            n_pts = len(xs)
            if n_pts < n_pts_threshold:
                x_min, x_max, y_min, y_max = 0, W - 1, 0, H - 1
            else:
                x_min = max(xs.min() - loose, 0)
                x_max = min(xs.max() + loose, W - 1)
                y_min = max(ys.min() - loose, 0)
                y_max = min(ys.max() + loose, H - 1)
            bboxes[b, k] = (x_min, x_max, y_min, y_max)
            att[b, k, y_min : y_max + 1, x_min : x_max + 1] = 1
    return att, bboxes


def test_att_map_matches_cuda_semantics():
    rs = np.random.RandomState(0)
    B, K, H, W = 2, 4, 120, 200
    mask = np.zeros((B, K, H, W), np.float32)
    # object 1: a blob; object 2: sparse (< 10 pts -> whole frame); object 3: empty
    mask[0, 1, 30:60, 50:90] = 0.9
    mask[0, 2, 5, 5:12] = 0.8  # 7 points < 10
    mask[1, 1, 0:10, 0:10] = 1.0  # near the border, dilate clamps
    mask[1, 3] = rs.rand(H, W) * 0.4  # all below threshold
    g_att, g_box = numpy_reg_att_map(mask)
    j_att, j_box = regional_attention_map(jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(j_att), g_att)
    np.testing.assert_array_equal(np.asarray(j_box), g_box)


def test_att_map_straight_through_grad():
    mask = jnp.asarray(np.random.RandomState(1).rand(1, 3, 16, 16).astype(np.float32))

    def f(m):
        att, _ = regional_attention_map(m)
        return jnp.sum(att * 3.0)

    grad = jax.grad(f)(mask)
    # Reference backward = constant ones regardless of upstream cotangent.
    np.testing.assert_array_equal(np.asarray(grad), np.ones_like(np.asarray(mask)))


def torch_soft_aggregation(ps, K, n_objects):
    """Verbatim semantics of reference models/rmnet.py:289-302 (test golden)."""
    B = len(n_objects)
    _, H, W = ps.shape
    em = torch.zeros(B, K, H, W)
    for i in range(B):
        begin = sum(n_objects[:i])
        end = begin + n_objects[i]
        em[i, 0] = torch.prod(1 - ps[begin:end], dim=0)
        em[i, 1 : n_objects[i] + 1] = ps[begin:end]
    em = torch.clamp(em, 1e-7, 1 - 1e-7)
    return torch.log(em / (1 - em))


def test_soft_aggregation_matches_torch():
    rs = np.random.RandomState(2)
    K = 5
    n_objects = [2, 3]
    H, W = 24, 36
    ragged = rs.rand(sum(n_objects), H, W).astype(np.float32)
    golden = torch_soft_aggregation(torch.from_numpy(ragged), K, n_objects).numpy()

    # static-K layout: scatter ragged probs into slots 1..n_obj
    ps = np.zeros((2, K, H, W), np.float32)
    valid = np.zeros((2, K), bool)
    ofs = 0
    for i, n in enumerate(n_objects):
        ps[i, 1 : n + 1] = ragged[ofs : ofs + n]
        valid[i, 1 : n + 1] = True
        ofs += n

    logit = soft_aggregation(jnp.asarray(ps), jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(logit), golden, rtol=1e-4, atol=5e-4)


def test_soft_aggregation_invalid_slots_suppressed():
    ps = jnp.asarray(np.random.RandomState(3).rand(1, 4, 8, 8).astype(np.float32))
    valid = jnp.asarray(np.array([[False, True, False, False]]))
    logit = soft_aggregation(ps, valid)
    # invalid object slots land exactly on the reference's magic constant
    np.testing.assert_allclose(np.asarray(logit[0, 2]), SUPPRESSED_LOGIT, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(logit[0, 3]), SUPPRESSED_LOGIT, rtol=1e-5)


def test_att_map_fuzz_vs_numpy_golden():
    """Random masks across shapes/thresholds, including boxes clamped at
    every border, exactly-at-threshold probabilities, and n_pts straddling
    the whole-frame-fallback cutoff."""
    rs = np.random.RandomState(9)
    for trial in range(6):
        B = int(rs.randint(1, 3))
        K = int(rs.randint(2, 5))
        H = int(rs.randint(20, 90))
        W = int(rs.randint(20, 90))
        loose = int(rs.choice([0, 3, 64]))
        mask = np.zeros((B, K, H, W), np.float32)
        for b in range(B):
            for k in range(1, K):
                kind = rs.randint(4)
                if kind == 0:  # dense blob, random position (may hug borders)
                    y0 = rs.randint(0, H - 1); x0 = rs.randint(0, W - 1)
                    y1 = rs.randint(y0 + 1, H + 1); x1 = rs.randint(x0 + 1, W + 1)
                    mask[b, k, y0:y1, x0:x1] = 0.5  # exactly at threshold
                elif kind == 1:  # sparse: n_pts near the cutoff
                    n = rs.randint(5, 15)
                    ys = rs.randint(0, H, n); xs = rs.randint(0, W, n)
                    mask[b, k, ys, xs] = 0.9
                elif kind == 2:  # noise below threshold
                    mask[b, k] = rs.rand(H, W) * 0.49
                # kind 3: empty channel
        g_att, g_box = numpy_reg_att_map(mask, loose=loose)
        j_att, j_box = regional_attention_map(
            jnp.asarray(mask), n_bbox_loose_pixels=loose
        )
        np.testing.assert_array_equal(
            np.asarray(j_att), g_att,
            err_msg=f"trial={trial} B={B} K={K} H={H} W={W} loose={loose}",
        )
        np.testing.assert_array_equal(
            np.asarray(j_box), g_box,
            err_msg=f"trial={trial} B={B} K={K} H={H} W={W} loose={loose}",
        )


def test_soft_aggregation_fuzz_vs_torch():
    """Aggregation parity across random K/object-counts/shapes, including
    probabilities at exactly 0 and 1 (the clamp boundaries where the
    f32-pinned 1-1e-7 math is load-bearing)."""
    rs = np.random.RandomState(13)
    for trial in range(5):
        K = int(rs.randint(2, 7))
        B = int(rs.randint(1, 3))
        H = int(rs.randint(4, 20))
        W = int(rs.randint(4, 20))
        n_objects = [int(rs.randint(1, K)) for _ in range(B)]
        ragged = rs.rand(sum(n_objects), H, W).astype(np.float32)
        ragged[ragged > 0.95] = 1.0  # exact clamp boundaries
        ragged[ragged < 0.05] = 0.0
        golden = torch_soft_aggregation(
            torch.from_numpy(ragged), K, n_objects
        ).numpy()
        ps = np.zeros((B, K, H, W), np.float32)
        valid = np.zeros((B, K), bool)
        ofs = 0
        for i, n in enumerate(n_objects):
            ps[i, 1 : n + 1] = ragged[ofs : ofs + n]
            valid[i, 1 : n + 1] = True
            ofs += n
        logit = soft_aggregation(jnp.asarray(ps), jnp.asarray(valid))
        np.testing.assert_allclose(
            np.asarray(logit), golden, rtol=1e-4, atol=5e-4,
            err_msg=f"trial={trial} B={B} K={K} n_objects={n_objects}",
        )
