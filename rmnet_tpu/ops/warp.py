"""Backward (inverse) warping by optical flow.

Mirrors reference models/rmnet.py:252-278 (PWC-Net style): sample ``img`` at
``(x + flow_x, y + flow_y)`` with bilinear ``grid_sample(align_corners=True,
padding_mode='zeros')`` semantics, warp an all-ones validity mask the same
way, binarize it at 0.9999, and zero out invalid output pixels.

Channels-last layout: img (B, H, W, C) or (B, H, W); flow (B, H, W, 2) with
flow[..., 0] = dx (x/width displacement), flow[..., 1] = dy.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def grid_sample_bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img (B,H,W,C) at pixel coords x, y (B,H,W), zeros padding.

    Matches torch ``F.grid_sample(mode='bilinear', padding_mode='zeros',
    align_corners=True)`` once the caller converts normalized grid coords to
    pixel coords via ``ix = (gx + 1) / 2 * (W - 1)``.
    """
    B, H, W, C = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1
    y1 = y0 + 1

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(yi, xi):
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        b = jnp.arange(B)[:, None, None]
        vals = img[b, yc, xc]  # (B, H, W, C)
        return vals * valid[..., None].astype(img.dtype)

    out = (
        gather(y0, x0) * (wy0 * wx0)[..., None]
        + gather(y0, x1) * (wy0 * wx1)[..., None]
        + gather(y1, x0) * (wy1 * wx0)[..., None]
        + gather(y1, x1) * (wy1 * wx1)[..., None]
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
    ones = jnp.ones_like(img)
    mask = grid_sample_bilinear(ones, x, y)
    # Reference binarization: <0.9999 -> 0, >0 -> 1 (models/rmnet.py:274-275).
    mask = (mask >= 0.9999).astype(img.dtype)
    warped = warped * mask

    if squeeze:
        return warped[..., 0], mask[..., 0]
    return warped, mask
