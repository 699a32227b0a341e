"""Bilinear / nearest resize with exact torch ``F.interpolate`` semantics.

The reference relies on torch's interpolation conventions in several
numerically-sensitive places:
  * decoder 2x/4x upsampling, align_corners=False (models/rmnet.py:117-118,139)
  * attention-map 1/16 downsampling              (models/rmnet.py:245,356)
  * TinyFlowNet 0.5x/8x resampling               (models/tiny_flownet.py:87-88,111)
  * test-time multi-scale inference              (utils/helpers.py:50-62)

torch bilinear uses half-pixel source centers (align_corners=False:
``src = (dst + 0.5) * in/out - 0.5`` clamped at 0) with *no antialiasing* on
downsample; torch 'nearest' uses ``src = floor(dst * in/out)``. Both are
reimplemented here as separable gathers (jit/vmap-friendly, static shapes).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def scale_hw(h: int, w: int, scale: float) -> Tuple[int, int]:
    """Output size for torch ``F.interpolate(scale_factor=scale)``: floor(in*scale)."""
    return int(h * scale), int(w * scale)


def _linear_weights(in_size: int, out_size: int, align_corners: bool):
    dst = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        if out_size == 1:
            src = jnp.zeros((1,), jnp.float32)
        else:
            src = dst * (float(in_size - 1) / float(out_size - 1))
    else:
        src = (dst + 0.5) * (float(in_size) / float(out_size)) - 0.5
        src = jnp.maximum(src, 0.0)  # torch clamps negative source coords to 0
    i0 = jnp.floor(src).astype(jnp.int32)
    i0 = jnp.minimum(i0, in_size - 1)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    w1 = src - i0.astype(jnp.float32)
    return i0, i1, w1


def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> jnp.ndarray:
    """(out, in) dense interpolation matrix with two taps per row.

    Interpolation-as-matmul: gathers are expensive on TPU (no hardware
    gather), while a small dense matmul rides the MXU. Each row holds the
    two bilinear tap weights; the result is bit-identical to the gather
    formulation (the extra terms are exact float zeros, and coincident taps
    at clamped edges sum to w0 + w1 exactly).
    """
    i0, i1, w1 = _linear_weights(in_size, out_size, align_corners)
    rows = jnp.arange(out_size)
    m = jnp.zeros((out_size, in_size), jnp.float32)
    return m.at[rows, i0].add(1.0 - w1).at[rows, i1].add(w1)


def _interp_axis(x: jnp.ndarray, axis: int, out_size: int, align_corners: bool):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if not align_corners and in_size == 2 * out_size:
        # exact 2x downsample: src = 2d + 0.5 -> taps (2d, 2d+1) with
        # weights (0.5, 0.5) for every d — a pairwise mean along the axis
        # (reshape + reduce: no transpose, no matmul; the generic matmul
        # path costs a physical moveaxis both ways)
        shape = x.shape[:axis] + (out_size, 2) + x.shape[axis + 1:]
        return jnp.mean(x.reshape(shape), axis=axis + 1)
    m = _interp_matrix(in_size, out_size, align_corners)
    xm = jnp.moveaxis(x, axis, -1)
    out = jnp.einsum("oi,...i->...o", m, xm, preferred_element_type=jnp.float32)
    return jnp.moveaxis(out, -1, axis)


def resize_bilinear(
    x: jnp.ndarray,
    out_hw: Tuple[int, int],
    spatial_axes: Tuple[int, int] = (-3, -2),
    align_corners: bool = False,
) -> jnp.ndarray:
    """Separable bilinear resize matching torch ``F.interpolate(mode='bilinear')``.

    Default ``spatial_axes=(-3, -2)`` fits NHWC; pass (-2, -1) for (..., H, W).
    """
    h_ax = spatial_axes[0] % x.ndim
    w_ax = spatial_axes[1] % x.ndim
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    xf = _interp_axis(xf, h_ax, out_hw[0], align_corners)
    xf = _interp_axis(xf, w_ax, out_hw[1], align_corners)
    return xf.astype(orig_dtype) if jnp.issubdtype(orig_dtype, jnp.floating) else xf


def _nearest_idx(in_size: int, out_size: int):
    dst = jnp.arange(out_size, dtype=jnp.float32)
    idx = jnp.floor(dst * (float(in_size) / float(out_size))).astype(jnp.int32)
    return jnp.minimum(idx, in_size - 1)


def _select_axis(x: jnp.ndarray, axis: int, out_size: int):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    idx = _nearest_idx(in_size, out_size)
    if jnp.issubdtype(x.dtype, jnp.floating):
        # selection-as-matmul (one-hot rows): exact for floats, MXU-friendly
        m = jnp.zeros((out_size, in_size), jnp.float32).at[
            jnp.arange(out_size), idx
        ].set(1.0)
        xm = jnp.moveaxis(x, axis, -1).astype(jnp.float32)
        out = jnp.einsum("oi,...i->...o", m, xm, preferred_element_type=jnp.float32)
        return jnp.moveaxis(out, -1, axis).astype(x.dtype)
    return jnp.take(x, idx, axis=axis)


def resize_nearest(
    x: jnp.ndarray,
    out_hw: Tuple[int, int],
    spatial_axes: Tuple[int, int] = (-3, -2),
) -> jnp.ndarray:
    """Nearest resize matching torch ``F.interpolate(mode='nearest')``."""
    h_ax = spatial_axes[0] % x.ndim
    w_ax = spatial_axes[1] % x.ndim
    x = _select_axis(x, h_ax, out_hw[0])
    x = _select_axis(x, w_ax, out_hw[1])
    return x
