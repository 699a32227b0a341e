"""Regional attention-map generation (bbox-of-mask, dilated, rasterized).

TPU-native replacement for the reference CUDA op
``extensions/reg_att_map_generator/reg_att_map_generator.cu:15-93``:
instead of one thread-block with atomicMin/Max per batch element, bboxes are
plain masked min/max reductions and the map is rasterized with broadcasted
iotas — pure XLA, fully fused, differentiable-free forward.

Exact semantics replicated:
  * pixels with ``mask >= prob_threshold`` (default 0.5) vote;
  * fewer than ``n_pts_threshold`` (10) votes -> whole-frame bbox;
  * otherwise the tight bbox is dilated by ``n_bbox_loose_pixels`` (64) and
    clamped to the frame;
  * object slot 0 (background) gets a zero map and a zero bbox
    (the CUDA loops start at i=1);
  * bboxes are (x_min, x_max, y_min, y_max) int32, shape (B, K, 4).

The straight-through backward of the reference wrapper
(``extensions/reg_att_map_generator/__init__.py:21-24``) returns a tensor of
*constant ones* as grad wrt the input mask, independent of the upstream
cotangent — replicated exactly via ``jax.custom_vjp`` since the op sits in
the training graph and this choice affects training parity.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_BIG = 32767  # CUDA kernel init value for mins (reg_att_map_generator.cu:31-34)


def _forward(
    mask: jnp.ndarray,
    prob_threshold: float,
    n_pts_threshold: int,
    n_bbox_loose_pixels: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    B, K, H, W = mask.shape
    hit = mask >= prob_threshold  # (B, K, H, W)
    n_pts = jnp.sum(hit, axis=(2, 3), dtype=jnp.int32)  # (B, K)

    # project to 1-D occupancy first (cheap any-reduce), then take min/max
    # over tiny H-/W-length vectors — avoids full-size iota broadcasts
    hit_x = jnp.any(hit, axis=2)  # (B, K, W)
    hit_y = jnp.any(hit, axis=3)  # (B, K, H)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    ys = jax.lax.broadcasted_iota(jnp.int32, (1, 1, H), 2)

    x_min = jnp.min(jnp.where(hit_x, xs, _BIG), axis=2)
    x_max = jnp.max(jnp.where(hit_x, xs, -1), axis=2)
    y_min = jnp.min(jnp.where(hit_y, ys, _BIG), axis=2)
    y_max = jnp.max(jnp.where(hit_y, ys, -1), axis=2)

    # Loosen / fall back to whole frame when too few points.
    whole = n_pts < n_pts_threshold
    x_min = jnp.where(whole, 0, jnp.maximum(x_min - n_bbox_loose_pixels, 0))
    x_max = jnp.where(whole, W - 1, jnp.minimum(x_max + n_bbox_loose_pixels, W - 1))
    y_min = jnp.where(whole, 0, jnp.maximum(y_min - n_bbox_loose_pixels, 0))
    y_max = jnp.where(whole, H - 1, jnp.minimum(y_max + n_bbox_loose_pixels, H - 1))

    # Slot 0 is background: zero bbox, zero map (CUDA loops start at i=1).
    obj = jnp.arange(K, dtype=jnp.int32)[None, :] >= 1  # (1, K)
    zero = jnp.zeros((), jnp.int32)
    x_min = jnp.where(obj, x_min, zero)
    x_max = jnp.where(obj, x_max, zero)
    y_min = jnp.where(obj, y_min, zero)
    y_max = jnp.where(obj, y_max, zero)

    # rasterize as an outer product of 1-D range masks
    inside_x = (xs >= x_min[..., None]) & (xs <= x_max[..., None])  # (B, K, W)
    inside_y = (ys >= y_min[..., None]) & (ys <= y_max[..., None])  # (B, K, H)
    att = (
        inside_y[..., :, None] & inside_x[..., None, :] & obj[..., None, None]
    ).astype(mask.dtype)

    bboxes = jnp.stack([x_min, x_max, y_min, y_max], axis=-1)  # (B, K, 4)
    return att, bboxes


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def regional_attention_map(
    mask: jnp.ndarray,
    prob_threshold: float = 0.5,
    n_pts_threshold: int = 10,
    n_bbox_loose_pixels: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-object dilated-bbox attention maps and bboxes.

    Args:
      mask: (B, K, H, W) per-object soft masks (slot 0 = background).

    Returns:
      att_map: (B, K, H, W) binary {0,1} maps, dtype of ``mask``.
      bboxes:  (B, K, 4) int32 (x_min, x_max, y_min, y_max).
    """
    return _forward(mask, prob_threshold, n_pts_threshold, n_bbox_loose_pixels)


def _fwd(mask, prob_threshold, n_pts_threshold, n_bbox_loose_pixels):
    out = _forward(mask, prob_threshold, n_pts_threshold, n_bbox_loose_pixels)
    return out, None


def _bwd(prob_threshold, n_pts_threshold, n_bbox_loose_pixels, res, cotangents):
    # Constant-ones straight-through gradient, independent of the cotangent
    # (reference extensions/reg_att_map_generator/__init__.py:22-24). The
    # att-map cotangent has the same shape/dtype as the input mask.
    g_att, _ = cotangents
    return (jnp.ones(g_att.shape, g_att.dtype),)


regional_attention_map.defvjp(_fwd, _bwd)
