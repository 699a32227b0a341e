"""Flow re-computation after per-frame affine augmentation.

Host-side preprocessing op mirroring the reference CPython/NumPy C-API module
``extensions/flow_affine_transformation/flow_affine_transformation.cpp:39-85``.
Given a flow field (H, W, 2) from frame t to frame t-1 and the two 2x3
*inverse* affine matrices applied to frame t-1 (``m1``) and frame t (``m2``),
recompute flow values so they remain consistent after both frames were warped.

Exact reference semantics, including the quirk at
flow_affine_transformation.cpp:72-73 where the y coordinate is computed from
the *already transformed* x coordinate (x1 is overwritten before y1 reads it)
— replicated bit-for-bit so augmented training data matches.

A vectorized numpy implementation is the default; a C++ implementation with
identical semantics lives in native/flow_affine.cpp and is used when its
shared library has been built (python -m rmnet_tpu.native build).
"""

from __future__ import annotations

import numpy as np


def update_optical_flow_numpy(
    flow: np.ndarray, m1: np.ndarray, m2: np.ndarray
) -> np.ndarray:
    """Vectorized numpy port of the reference C++ loop.

    Args:
      flow: (H, W, 2) float32, (dx, dy).
      m1: (2, 3) float32 inverse affine applied to frame t-1.
      m2: (2, 3) float32 inverse affine applied to frame t.

    Returns:
      (H, W, 2) float32 updated flow.
    """
    h, w = flow.shape[:2]
    jj, ii = np.meshgrid(
        np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32)
    )  # jj -> X, ii -> Y

    x2 = np.round(m2[0, 0] * jj + m2[0, 1] * ii + m2[0, 2])
    y2 = np.round(m2[1, 0] * jj + m2[1, 1] * ii + m2[1, 2])

    x1 = jj + flow[..., 0]
    y1 = ii + flow[..., 1]
    # NOTE: the reference overwrites x1 first and then uses the *new* x1 when
    # computing y1 (flow_affine_transformation.cpp:72-73). Keep that order.
    x1_new = np.round(m1[0, 0] * x1 + m1[0, 1] * y1 + m1[0, 2])
    y1_new = np.round(m1[1, 0] * x1_new + m1[1, 1] * y1 + m1[1, 2])

    x1_new = np.clip(x1_new, 0, w - 1)
    y1_new = np.clip(y1_new, 0, h - 1)
    x2 = np.clip(x2, 0, w - 1)
    y2 = np.clip(y2, 0, h - 1)

    out = np.empty_like(flow)
    out[..., 0] = x1_new - x2
    out[..., 1] = y1_new - y2
    return out.astype(np.float32)


_native = None


def _load_native():
    global _native
    if _native is None:
        try:
            from rmnet_tpu.native import flow_affine_native

            _native = flow_affine_native if flow_affine_native is not None else False
        except Exception:  # library not built — numpy fallback
            _native = False
    return _native


def update_optical_flow(flow: np.ndarray, m1: np.ndarray, m2: np.ndarray) -> np.ndarray:
    """Dispatch to the native C++ implementation when built, else numpy."""
    native = _load_native()
    if native:
        return native.update_optical_flow(
            np.ascontiguousarray(flow, dtype=np.float32),
            np.ascontiguousarray(m1, dtype=np.float32),
            np.ascontiguousarray(m2, dtype=np.float32),
        )
    return update_optical_flow_numpy(
        np.asarray(flow, dtype=np.float32),
        np.asarray(m1, dtype=np.float32),
        np.asarray(m2, dtype=np.float32),
    )
