"""Symmetric pad-to-multiple, mirroring reference utils/helpers.py:105-124.

The reference pads H and W up to the next multiple of ``d`` with zeros,
splitting the padding as (floor/2 on the low side, remainder on the high
side), and returns the pad tuple ``(lw, uw, lh, uh)`` so callers can un-pad
outputs (reference models/rmnet.py:376-380).

All shapes here are static at trace time, so this is jit-transparent.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def divide_pads(h: int, w: int, d: int) -> Tuple[int, int, int, int]:
    """Compute the (lw, uw, lh, uh) zero-padding that makes (h, w) divisible by d."""
    new_h = h + (d - h % d) % d
    new_w = w + (d - w % d) % d
    lh = (new_h - h) // 2
    uh = (new_h - h) - lh
    lw = (new_w - w) // 2
    uw = (new_w - w) - lw
    return (lw, uw, lh, uh)


def pad_divide_by(
    arrays: Sequence[jnp.ndarray],
    d: int,
    spatial_axes: Tuple[int, int] = (-3, -2),
):
    """Zero-pad each array's spatial dims up to a multiple of ``d``.

    Args:
      arrays: sequence of arrays sharing H, W on ``spatial_axes``.
      d: divisor.
      spatial_axes: (h_axis, w_axis). Default (-3, -2) fits NHWC tensors;
        use (-2, -1) for channel-less (B, H, W) or (B, K, H, W) tensors.

    Returns:
      (padded_arrays, (lw, uw, lh, uh))  — same pad-tuple layout as the
      reference so un-padding code lines up 1:1.
    """
    first = arrays[0]
    h_ax = spatial_axes[0] % first.ndim
    w_ax = spatial_axes[1] % first.ndim
    h, w = first.shape[h_ax], first.shape[w_ax]
    lw, uw, lh, uh = divide_pads(h, w, d)

    out = []
    for a in arrays:
        a_h_ax = h_ax + (a.ndim - first.ndim)
        a_w_ax = w_ax + (a.ndim - first.ndim)
        pad_width = [(0, 0)] * a.ndim
        pad_width[a_h_ax] = (lh, uh)
        pad_width[a_w_ax] = (lw, uw)
        out.append(jnp.pad(a, pad_width))
    return out, (lw, uw, lh, uh)


def unpad(
    x: jnp.ndarray,
    pads: Tuple[int, int, int, int],
    spatial_axes: Tuple[int, int] = (-3, -2),
) -> jnp.ndarray:
    """Inverse of :func:`pad_divide_by` for a single array."""
    lw, uw, lh, uh = pads
    h_ax = spatial_axes[0] % x.ndim
    w_ax = spatial_axes[1] % x.ndim
    idx = [slice(None)] * x.ndim
    if lh + uh > 0:
        idx[h_ax] = slice(lh, x.shape[h_ax] - uh)
    if lw + uw > 0:
        idx[w_ax] = slice(lw, x.shape[w_ax] - uw)
    return x[tuple(idx)]
