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

    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)

    def reduce_box(coord, largest_init):
        c = jnp.broadcast_to(coord, (B, K, H, W))
        if largest_init:
            sel = jnp.where(hit, c, _BIG)
            return jnp.min(sel, axis=(2, 3))
        sel = jnp.where(hit, c, -1)
        return jnp.max(sel, axis=(2, 3))

    x_min = reduce_box(xs, True)
    x_max = reduce_box(xs, False)
    y_min = reduce_box(ys, True)
    y_max = reduce_box(ys, False)

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

    inside_x = (xs[None, None] >= x_min[..., None, None]) & (
        xs[None, None] <= x_max[..., None, None]
    )
    inside_y = (ys[None, None] >= y_min[..., None, None]) & (
        ys[None, None] <= y_max[..., None, None]
    )
    att = (inside_x & inside_y & obj[..., None, None]).astype(mask.dtype)

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
