"""Segmentation visualization: palette PNGs and contour overlays.

Capability of reference utils/helpers.py:138-178 (get_segmentation): either a
palettized PNG of the label map (benchmark submission format) or a blended
overlay with dilated object contours for TensorBoard/inspection.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.ndimage
from PIL import Image

# 16-color VOC-style palette used for both overlays and palettized PNGs
PALETTE = np.array([[i, i, i] for i in range(256)])
PALETTE[:16] = np.array(
    [
        [0, 0, 0],
        [128, 0, 0],
        [0, 128, 0],
        [128, 128, 0],
        [0, 0, 128],
        [128, 0, 128],
        [0, 128, 128],
        [128, 128, 128],
        [64, 0, 0],
        [191, 0, 0],
        [64, 128, 0],
        [191, 128, 0],
        [64, 0, 128],
        [191, 0, 128],
        [64, 128, 128],
        [191, 128, 128],
    ]
)


def img_denormalize(image_hwc: np.ndarray, mean, std) -> np.ndarray:
    """(H, W, 3) normalized float -> uint8 RGB."""
    return ((image_hwc * np.asarray(std) + np.asarray(mean)) * 255).astype(np.uint8)


def img_normalize(image: np.ndarray, mean, std) -> np.ndarray:
    """uint8 HWC RGB -> normalized float32 HWC."""
    return ((image.astype(np.float32) / 255.0 - np.asarray(mean)) / np.asarray(std)).astype(
        np.float32
    )


def get_segmentation(
    frame_hwc: Optional[np.ndarray],
    mask: np.ndarray,
    normalization_params=None,
    ignore_idx: int = 255,
    alpha: float = 0.4,
) -> Image.Image:
    """Render a label map.

    With ``frame_hwc=None`` returns a palettized PNG of the mask (the DAVIS /
    YouTube-VOS benchmark submission format); otherwise alpha-blends each
    object color onto the denormalized frame and blackens dilated contours.
    """
    mask = np.asarray(mask)
    if frame_hwc is None:
        img = Image.fromarray(mask.astype(np.uint8), mode="P")
        img.putpalette(PALETTE.reshape(-1).tolist())
        return img

    frame = img_denormalize(
        np.asarray(frame_hwc)[..., :3],
        normalization_params["mean"],
        normalization_params["std"],
    ).copy()
    for o_id in np.unique(mask)[1:]:
        if o_id == ignore_idx:
            continue
        fg = frame * alpha + np.ones(frame.shape) * (1 - alpha) * np.array(PALETTE[o_id])
        binary = mask == o_id
        frame[binary] = fg[binary]
        contours = scipy.ndimage.binary_dilation(binary) ^ binary
        frame[contours, :] = 0
    return Image.fromarray(frame)
