"""Tests for the affine flow-update op: numpy spec vs scalar loop vs native C++."""

import numpy as np
import pytest

from rmnet_tpu.ops.flow_affine import update_optical_flow_numpy, update_optical_flow


def scalar_update_optical_flow(flow, m1, m2):
    """Direct scalar transliteration of the reference C++ loop
    (flow_affine_transformation.cpp:63-83), used as the golden."""
    h, w = flow.shape[:2]
    out = np.empty_like(flow)
    for i in range(h):
        for j in range(w):
            x2 = np.round(m2[0, 0] * j + m2[0, 1] * i + m2[0, 2])
            y2 = np.round(m2[1, 0] * j + m2[1, 1] * i + m2[1, 2])
            x1 = j + flow[i, j, 0]
            y1 = i + flow[i, j, 1]
            x1 = np.round(m1[0, 0] * x1 + m1[0, 1] * y1 + m1[0, 2])
            y1 = np.round(m1[1, 0] * x1 + m1[1, 1] * y1 + m1[1, 2])
            x1 = min(max(x1, 0), w - 1)
            y1 = min(max(y1, 0), h - 1)
            x2 = min(max(x2, 0), w - 1)
            y2 = min(max(y2, 0), h - 1)
            out[i, j, 0] = x1 - x2
            out[i, j, 1] = y1 - y2
    return out


def _random_affine(rs):
    ang = rs.uniform(-0.3, 0.3)
    s = rs.uniform(0.9, 1.1)
    m = np.array(
        [
            [s * np.cos(ang), -s * np.sin(ang), rs.uniform(-5, 5)],
            [s * np.sin(ang), s * np.cos(ang), rs.uniform(-5, 5)],
        ],
        np.float32,
    )
    return m


def test_numpy_matches_scalar_golden():
    rs = np.random.RandomState(0)
    flow = (rs.rand(37, 53, 2).astype(np.float32) - 0.5) * 30
    m1, m2 = _random_affine(rs), _random_affine(rs)
    golden = scalar_update_optical_flow(flow, m1, m2)
    out = update_optical_flow_numpy(flow, m1, m2)
    np.testing.assert_allclose(out, golden, atol=1e-4)


def test_identity_matrices_round_and_clamp_endpoints():
    rs = np.random.RandomState(1)
    h = w = 16
    flow = (rs.rand(h, w, 2).astype(np.float32) - 0.5) * 4
    ident = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    out = update_optical_flow_numpy(flow, ident, ident)
    jj, ii = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    # with identity transforms: new flow = clip(round(p + flow)) - p
    np.testing.assert_allclose(
        out[..., 0], np.clip(np.round(jj + flow[..., 0]), 0, w - 1) - jj, atol=1e-5
    )
    np.testing.assert_allclose(
        out[..., 1], np.clip(np.round(ii + flow[..., 1]), 0, h - 1) - ii, atol=1e-5
    )


def test_native_matches_numpy():
    from rmnet_tpu.native import flow_affine_native

    if flow_affine_native is None:
        pytest.skip("native library not built")
    rs = np.random.RandomState(2)
    flow = (rs.rand(41, 29, 2).astype(np.float32) - 0.5) * 25
    m1, m2 = _random_affine(rs), _random_affine(rs)
    np.testing.assert_allclose(
        flow_affine_native.update_optical_flow(flow, m1, m2),
        update_optical_flow_numpy(flow, m1, m2),
        atol=1e-4,
    )
    out = update_optical_flow(flow, m1, m2)  # dispatcher prefers native
    np.testing.assert_allclose(out, update_optical_flow_numpy(flow, m1, m2), atol=1e-4)
