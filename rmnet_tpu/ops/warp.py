"""Backward (inverse) warping by optical flow — TPU-tuned, torch-exact.

Mirrors reference models/rmnet.py:252-278 (PWC-Net style): sample ``img`` at
``(x + flow_x, y + flow_y)`` with bilinear ``grid_sample(align_corners=True,
padding_mode='zeros')`` semantics, warp an all-ones validity mask the same
way, binarize it at 0.9999, and zero out invalid output pixels.

TPU notes (measured on v5e):
  * 2-D advanced indexing lowers to a scatter-ish gather that costs ~26 ms
    per 480p warp; gathering through a flattened H*W axis with
    ``take_along_axis`` halves that.
  * the all-ones grid_sample has a closed form: bilinear weights factor per
    axis, so sample(ones) == covy(y) * covx(x) with
    cov(c) = (1-frac)*inb(floor(c)) + frac*inb(floor(c)+1) — bit-identical
    to gathering an ones image, and removes 4 of the 8 gathers.

Channels-last layout: img (B, H, W, C) or (B, H, W); flow (B, H, W, 2) with
flow[..., 0] = dx (x/width displacement), flow[..., 1] = dy.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _axis_coverage(c: jnp.ndarray, n: int) -> jnp.ndarray:
    """Bilinear sample of an all-ones 1-D signal with zeros padding."""
    c0 = jnp.floor(c)
    w1 = c - c0
    in0 = (c0 >= 0) & (c0 <= n - 1)
    in1 = (c0 + 1 >= 0) & (c0 + 1 <= n - 1)
    return (1.0 - w1) * in0 + w1 * in1


def grid_sample_bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img (B,H,W,C) at pixel coords x, y (B,H,W), zeros padding.

    Matches torch ``F.grid_sample(mode='bilinear', padding_mode='zeros',
    align_corners=True)`` once the caller converts normalized grid coords to
    pixel coords via ``ix = (gx + 1) / 2 * (W - 1)``.
    """
    B, H, W, C = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    flat = img.reshape(B, H * W, C)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        idx = (jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)).astype(jnp.int32)
        vals = jnp.take_along_axis(flat, idx.reshape(B, H * W, 1), axis=1)
        return vals.reshape(B, H, W, C) * valid[..., None].astype(img.dtype)

    out = (
        tap(y0, x0) * (wy0 * wx0)[..., None]
        + tap(y0, x0 + 1) * (wy0 * wx1)[..., None]
        + tap(y0 + 1, x0) * (wy1 * wx0)[..., None]
        + tap(y0 + 1, x0 + 1) * (wy1 * wx1)[..., None]
    )
    return out.astype(img.dtype)


def backward_warp(
    img: jnp.ndarray, flow: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp ``img`` backwards by ``flow`` with a binary validity mask.

    Args:
      img: (B, H, W, C) or (B, H, W).
      flow: (B, H, W, 2), channels-last (dx, dy).

    Returns:
      (warped, mask): warped image with invalid regions zeroed, and the
      binary validity mask broadcast over channels (both same shape as img).
    """
    squeeze = img.ndim == 3
    if squeeze:
        img = img[..., None]
    B, H, W, C = img.shape

    xs = jnp.arange(W, dtype=flow.dtype)[None, None, :]
    ys = jnp.arange(H, dtype=flow.dtype)[None, :, None]
    x = xs + flow[..., 0]
    y = ys + flow[..., 1]

    warped = grid_sample_bilinear(img, x, y)
    # ones-warp in closed form (== grid_sample of an all-ones image)
    ones = _axis_coverage(y, H) * _axis_coverage(x, W)
    # Reference binarization: <0.9999 -> 0, >0 -> 1 (models/rmnet.py:274-275).
    mask = (ones >= 0.9999).astype(img.dtype)[..., None]
    mask = jnp.broadcast_to(mask, warped.shape)
    warped = warped * mask

    if squeeze:
        return warped[..., 0], mask[..., 0]
    return warped, mask
