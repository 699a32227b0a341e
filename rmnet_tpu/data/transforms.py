"""Video data augmentation / preprocessing (numpy, host-side).

Capability of reference utils/data_transforms.py with the cv2/torchvision
dependencies replaced by numpy (+ the native C++ warp when built):

  Compose, ToArrays (ToTensor twin, NHWC), ReorganizeObjectID, ToOneHot,
  Normalize, RandomPermuteRGB, RandomFlip, Resize, RandomCrop, ColorJitter,
  HistogramEqualization, RandomAffine.

Documented divergences from the reference (distribution-level equivalent):
  * masks are warped with NEAREST in RandomAffine — the reference passes
    label maps through cv2.warpAffine's default bilinear, blending object
    ids at boundaries (utils/data_transforms.py:291,307); nearest avoids
    phantom ids without changing the augmentation distribution.
  * Resize uses half-pixel bilinear / floor nearest (torch conventions)
    instead of cv2's variants — sub-pixel differences only.
Replicated reference quirks that affect data: the affine center is computed
as (h/2+.5, w/2+.5) in (x, y) slots (utils/data_transforms.py:276) and flow
updates use the x1-then-y1 ordering (see ops/flow_affine.py).
"""

from __future__ import annotations

import math
import numbers
import random
import sys
from typing import List, Optional, Sequence

import numpy as np

from rmnet_tpu.data.rng import nprand, pyrand
from rmnet_tpu.ops.flow_affine import update_optical_flow


# --------------------------------------------------------------- warp utils
def _invert_affine_2x3(m: np.ndarray) -> np.ndarray:
    full = np.vstack([m, [0.0, 0.0, 1.0]]).astype(np.float64)
    return np.linalg.inv(full)[:2].astype(np.float32)


def affine_warp_numpy(img, matrix, fill, nearest=False):
    """Inverse-mapping warp: out(y, x) = img(matrix . (x, y, 1)).

    matrix is the dst->src 2x3 affine; bilinear or nearest sampling with a
    constant fill for out-of-bounds sources. Vectorized numpy fallback for
    native/flow_affine.cpp::affine_warp.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    fill = np.broadcast_to(np.asarray(fill, np.float32), (c,))
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    sx = matrix[0, 0] * xs + matrix[0, 1] * ys + matrix[0, 2]
    sy = matrix[1, 0] * xs + matrix[1, 1] * ys + matrix[1, 2]

    imgf = img.astype(np.float32)
    if nearest:
        # round-half-away-from-zero to match the native lround()
        ix = np.floor(sx + 0.5).astype(np.int64)
        iy = np.floor(sy + 0.5).astype(np.int64)
        oob = (ix < 0) | (iy < 0) | (ix >= w) | (iy >= h)
        ix = np.clip(ix, 0, w - 1)
        iy = np.clip(iy, 0, h - 1)
        out = imgf[iy, ix]
        out[oob] = fill
    else:
        x0 = np.floor(sx).astype(np.int64)
        y0 = np.floor(sy).astype(np.int64)
        wx = (sx - x0)[..., None]
        wy = (sy - y0)[..., None]

        def tap(yy, xx):
            oob = (xx < 0) | (yy < 0) | (xx >= w) | (yy >= h)
            v = imgf[np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)]
            v[oob] = fill
            return v

        out = (
            tap(y0, x0) * (1 - wy) * (1 - wx)
            + tap(y0, x0 + 1) * (1 - wy) * wx
            + tap(y0 + 1, x0) * wy * (1 - wx)
            + tap(y0 + 1, x0 + 1) * wy * wx
        )
    out = out[..., 0] if squeeze else out
    return out


def affine_warp(img, matrix, fill, nearest=False):
    try:
        from rmnet_tpu.native import flow_affine_native

        if flow_affine_native is not None:
            return flow_affine_native.affine_warp(
                np.asarray(img, np.float32), matrix, np.broadcast_to(
                    np.asarray(fill, np.float32),
                    (1 if img.ndim == 2 else img.shape[-1],),
                ).copy(), nearest,
            )
    except Exception:
        pass
    return affine_warp_numpy(img, matrix, fill, nearest)


def resize_bilinear_np(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Half-pixel-center bilinear resize (torch align_corners=False)."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape

    def coords(out_size, in_size):
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * (in_size / out_size) - 0.5
        src = np.clip(src, 0, in_size - 1)
        i0 = np.floor(src).astype(np.int64)
        i1 = np.minimum(i0 + 1, in_size - 1)
        return i0, i1, (src - i0).astype(np.float32)

    y0, y1, wy = coords(out_h, h)
    x0, x1, wx = coords(out_w, w)
    imgf = img.astype(np.float32)
    top = imgf[y0][:, x0] * (1 - wx)[None, :, None] + imgf[y0][:, x1] * wx[None, :, None]
    bot = imgf[y1][:, x0] * (1 - wx)[None, :, None] + imgf[y1][:, x1] * wx[None, :, None]
    out = top * (1 - wy)[:, None, None] + bot * wy[:, None, None]
    out = out[..., 0] if squeeze else out
    return out


def resize_nearest_np(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = img.shape[:2]
    ys = np.minimum(np.floor(np.arange(out_h) * (h / out_h)).astype(np.int64), h - 1)
    xs = np.minimum(np.floor(np.arange(out_w) * (w / out_w)).astype(np.int64), w - 1)
    return img[ys][:, xs]


# ------------------------------------------------------------------ compose
class Compose:
    """Dict-driven transform pipeline (reference utils/data_transforms.py:23-38)."""

    REGISTRY = {}

    def __init__(self, transforms: Sequence[dict]):
        self.transformers = []
        for tr in transforms:
            cls = self.REGISTRY[tr["callback"]]
            self.transformers.append(cls(tr.get("parameters")))

    def __call__(self, frames, masks, optical_flows):
        for tr in self.transformers:
            frames, masks, optical_flows = tr(frames, masks, optical_flows)
        return frames, masks, optical_flows


def register(cls):
    Compose.REGISTRY[cls.__name__] = cls
    return cls


@register
class ToArrays:
    """Stack per-frame lists into contiguous NHWC arrays (ToTensor twin):
    frames (T, H, W, 3) f32, masks (T, K, H, W) u8, flows (T, H, W, 2) f32."""

    def __init__(self, parameters=None):
        pass

    def __call__(self, frames, masks, optical_flows):
        frames = np.ascontiguousarray(np.stack(frames), np.float32)
        masks = np.ascontiguousarray(np.stack(masks))
        optical_flows = np.ascontiguousarray(np.stack(optical_flows), np.float32)
        return frames, masks, optical_flows


# keep the reference pipeline name working
Compose.REGISTRY["ToTensor"] = ToArrays


@register
class ReorganizeObjectID:
    """Densify mask ids to 0..n (reference utils/data_transforms.py:53-68)."""

    def __init__(self, parameters):
        self.ignore_idx = parameters["ignore_idx"]

    def __call__(self, frames, masks, optical_flows):
        mask_indexes = np.unique(np.array(masks))
        mask_indexes = mask_indexes[mask_indexes != self.ignore_idx]
        for m_idx, m in enumerate(masks):
            _m = np.zeros(m.shape, np.uint8)
            for idx, mi in enumerate(mask_indexes):
                _m[m == mi] = idx
            masks[m_idx] = _m
        return frames, masks, optical_flows


@register
class ToOneHot:
    """Label map -> K+1 binary channels, optional object-id shuffle
    (reference utils/data_transforms.py:71-83)."""

    def __init__(self, parameters):
        self.shuffle = parameters["shuffle"]
        self.n_objects = parameters["n_objects"]

    def __call__(self, frames, masks, optical_flows):
        perm = nprand().permutation(self.n_objects) + 1
        perm = np.insert(perm, 0, 0)
        out = []
        for m in masks:
            oh = np.stack([(m == k) for k in range(self.n_objects + 1)]).astype(np.uint8)
            out.append(oh[perm] if self.shuffle else oh)
        return frames, out, optical_flows


@register
class Normalize:
    def __init__(self, parameters):
        self.mean = np.asarray(parameters["mean"], np.float32)
        self.std = np.asarray(parameters["std"], np.float32)

    def __call__(self, frames, masks, optical_flows):
        for idx, (f, m) in enumerate(zip(frames, masks)):
            frames[idx] = ((np.asarray(f, np.float32) / 255.0 - self.mean) / self.std).astype(
                np.float32
            )
            masks[idx] = np.asarray(m, np.uint8)
        return frames, masks, optical_flows


@register
class RandomPermuteRGB:
    def __init__(self, parameters=None):
        pass

    def __call__(self, frames, masks, optical_flows):
        perm = nprand().permutation(3)
        for idx, f in enumerate(frames):
            frames[idx] = f[..., perm]
        return frames, masks, optical_flows


@register
class RandomFlip:
    """Horizontal flip with flow-x negation (reference :111-125; defined but
    unused by the stock pipelines — provided for capability parity)."""

    def __init__(self, parameters=None):
        pass

    def __call__(self, frames, masks, optical_flows):
        if pyrand().random() <= 0.5:
            for idx in range(len(frames)):
                frames[idx] = np.flip(frames[idx], axis=1).copy()
                masks[idx] = np.flip(masks[idx], axis=1).copy()
                of = np.flip(optical_flows[idx], axis=1).copy()
                of[..., 0] = -of[..., 0]
                optical_flows[idx] = of
        return frames, masks, optical_flows


@register
class Resize:
    """Keep-ratio short-side resize; flow values scaled by the same factor
    (reference utils/data_transforms.py:128-156)."""

    def __init__(self, parameters):
        self.size = parameters["size"]
        self.keep_ratio = parameters["keep_ratio"]

    def __call__(self, frames, masks, optical_flows):
        img_h, img_w = masks[0].shape
        if self.keep_ratio:
            scale = max(self.size / img_h, self.size / img_w)
            height = int(img_h * scale + 0.5)
            width = int(img_w * scale + 0.5)
        else:
            scale = 1.0
            height = width = self.size
        frames = [resize_bilinear_np(f, height, width) for f in frames]
        masks = [resize_nearest_np(m, height, width) for m in masks]
        optical_flows = [
            resize_bilinear_np(of, height, width) * scale for of in optical_flows
        ]
        return frames, masks, optical_flows


@register
class RandomCrop:
    """Bbox-aware crop keeping objects in view; flow offsets adjusted by the
    inter-frame crop delta (reference utils/data_transforms.py:159-230)."""

    def __init__(self, parameters):
        self.height = parameters["height"]
        self.width = parameters["width"]
        self.ignore_idx = parameters["ignore_idx"]

    def __call__(self, frames, masks, optical_flows):
        prev_x_min = 0
        prev_y_min = 0
        for i in range(len(frames)):
            x_min, y_min = sys.maxsize, sys.maxsize
            x_max, y_max = 0, 0
            mask = masks[i].copy()
            mask[mask == 255] = 0
            for j in np.unique(mask):
                if j == 0:
                    continue
                rows = np.where(np.any(mask == j, axis=1))[0]
                cols = np.where(np.any(mask == j, axis=0))[0]
                if len(rows) == 0 or len(cols) == 0:
                    continue
                x_min = min(x_min, cols[0])
                x_max = max(x_max, cols[-1])
                y_min = min(y_min, rows[0])
                y_max = max(y_max, rows[-1])

            bbox_height = y_max - y_min + 1
            bbox_width = x_max - x_min + 1
            img_h, img_w = masks[i].shape
            height_diff = abs(bbox_height - self.height)
            width_diff = abs(bbox_width - self.width)

            if bbox_height <= self.height:
                y_lb = max(y_min - height_diff, 0)
                y_ub = min(img_h - self.height, y_min)
                y_min = pyrand().randint(y_lb, y_ub) if y_lb < y_ub else 0
            else:
                y_min = pyrand().randint(y_min, y_min + height_diff)
            if bbox_width <= self.width:
                x_lb = max(x_min - width_diff, 0)
                x_ub = min(img_w - self.width, x_min)
                x_min = pyrand().randint(x_lb, x_ub) if x_lb < x_ub else 0
            else:
                x_min = pyrand().randint(x_min, x_min + width_diff)

            frames[i] = frames[i][y_min:y_min + self.height, x_min:x_min + self.width, :]
            masks[i] = masks[i][y_min:y_min + self.height, x_min:x_min + self.width]
            optical_flows[i] = optical_flows[i][
                y_min:y_min + self.height, x_min:x_min + self.width, :
            ].copy()
            if i > 0:
                optical_flows[i][..., 0] -= prev_x_min - x_min
                optical_flows[i][..., 1] -= prev_y_min - y_min
            prev_x_min, prev_y_min = x_min, y_min
        return frames, masks, optical_flows


@register
class ColorJitter:
    """Brightness/contrast/saturation/hue jitter, torchvision-param
    compatible (reference utils/data_transforms.py:233-248). Enabled ops run
    in a random order with factors drawn uniformly from the given ranges."""

    def __init__(self, parameters):
        self.brightness = parameters["brightness"]
        self.contrast = parameters["contrast"]
        self.saturation = parameters["saturation"]
        self.hue = parameters["hue"]

    @staticmethod
    def _blend(a, b, factor):
        return np.clip(a * factor + b * (1.0 - factor), 0, 255)

    def _apply(self, img, op, factor):
        img = img.astype(np.float32)
        if op == "brightness":
            return self._blend(img, np.zeros_like(img), factor)
        if op == "contrast":
            gray = img @ np.array([0.299, 0.587, 0.114], np.float32)
            return self._blend(img, gray.mean(), factor)
        if op == "saturation":
            gray = (img @ np.array([0.299, 0.587, 0.114], np.float32))[..., None]
            return self._blend(img, gray, factor)
        if op == "hue":
            # shift hue via YIQ rotation (cheap, torchvision-equivalent scale)
            t = factor * 2.0 * math.pi
            u, w = math.cos(t), math.sin(t)
            m = np.array(
                [
                    [0.299 + 0.701 * u + 0.168 * w, 0.587 - 0.587 * u + 0.330 * w,
                     0.114 - 0.114 * u - 0.497 * w],
                    [0.299 - 0.299 * u - 0.328 * w, 0.587 + 0.413 * u + 0.035 * w,
                     0.114 - 0.114 * u + 0.292 * w],
                    [0.299 - 0.300 * u + 1.250 * w, 0.587 - 0.588 * u - 1.050 * w,
                     0.114 + 0.886 * u - 0.203 * w],
                ],
                np.float32,
            )
            return np.clip(img @ m.T, 0, 255)
        return img

    def __call__(self, frames, masks, optical_flows):
        ops = []
        if self.brightness is not None:
            ops.append(("brightness", pyrand().uniform(*self.brightness)))
        if self.contrast is not None:
            ops.append(("contrast", pyrand().uniform(*self.contrast)))
        if self.saturation is not None:
            ops.append(("saturation", pyrand().uniform(*self.saturation)))
        if self.hue is not None:
            ops.append(("hue", pyrand().uniform(*self.hue)))
        pyrand().shuffle(ops)
        for idx, f in enumerate(frames):
            out = f.astype(np.float32)
            for op, factor in ops:
                out = self._apply(out, op, factor)
            frames[idx] = out.astype(np.uint8)
        return frames, masks, optical_flows


@register
class HistogramEqualization:
    """Y-channel histogram equalization (reference :251-261; unused by the
    stock pipelines — capability parity)."""

    def __init__(self, parameters=None):
        pass

    def __call__(self, frames, masks, optical_flows):
        for idx, f in enumerate(frames):
            img = f.astype(np.float32)
            y = img @ np.array([0.299, 0.587, 0.114], np.float32)
            hist, _ = np.histogram(y.astype(np.uint8), bins=256, range=(0, 256))
            cdf = np.cumsum(hist).astype(np.float64)
            nz = cdf[cdf > 0]
            if len(nz) == 0:
                continue
            lut = np.clip((cdf - nz[0]) / max(cdf[-1] - nz[0], 1) * 255.0, 0, 255)
            y_eq = lut[y.astype(np.uint8)]
            scale = (y_eq + 1.0) / (y + 1.0)
            frames[idx] = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
        return frames, masks, optical_flows


@register
class RandomAffine:
    """Per-frame random affine with consistent flow re-computation
    (reference utils/data_transforms.py:264-361)."""

    def __init__(self, parameters):
        self.degrees = parameters["degrees"]
        self.translate = parameters["translate"]
        self.scale = parameters["scale"]
        self.shears = parameters["shears"]
        self.frame_fill_color = parameters["frame_fill_color"]
        self.mask_fill_color = parameters["mask_fill_color"]
        self.optical_flow_fill_color = parameters["optical_flow_fill_color"]

    @staticmethod
    def get_params(degrees, translate, scale_ranges, shears, img_size):
        """torchvision RandomAffine.get_params semantics."""
        angle = pyrand().uniform(degrees[0], degrees[1])
        if translate is not None:
            max_dx = translate[0] * img_size[0]
            max_dy = translate[1] * img_size[1]
            translations = (
                np.round(pyrand().uniform(-max_dx, max_dx)),
                np.round(pyrand().uniform(-max_dy, max_dy)),
            )
        else:
            translations = (0, 0)
        scale = pyrand().uniform(scale_ranges[0], scale_ranges[1]) if scale_ranges else 1.0
        shear = pyrand().uniform(shears[0], shears[1]) if shears else 0.0
        return angle, translations, scale, shear

    @staticmethod
    def inverse_affine_matrix(center, angle, translate, scale, shear):
        """Inverse of M = T * C * RSS * C^-1 (PIL convention: maps output
        coords to input coords). Port of the torchvision helper the
        reference vendors (utils/data_transforms.py:309-361)."""
        if isinstance(shear, numbers.Number):
            shear = [shear, 0]
        rot = math.radians(angle)
        sx, sy = [math.radians(s) for s in shear]
        cx, cy = center
        tx, ty = translate

        a = math.cos(rot - sy) / math.cos(sy)
        b = -math.cos(rot - sy) * math.tan(sx) / math.cos(sy) - math.sin(rot)
        c = math.sin(rot - sy) / math.cos(sy)
        d = -math.sin(rot - sy) * math.tan(sx) / math.cos(sy) + math.cos(rot)

        M = [d, -b, 0, -c, a, 0]
        M = [x / scale for x in M]
        M[2] += M[0] * (-cx - tx) + M[1] * (-cy - ty)
        M[5] += M[3] * (-cx - tx) + M[4] * (-cy - ty)
        M[2] += cx
        M[5] += cy
        return np.array(M, np.float32).reshape(2, 3)

    def __call__(self, frames, masks, optical_flows):
        img_h, img_w = masks[0].shape
        # reference quirk kept: center slots get (h-based, w-based) values
        center = (img_h * 0.5 + 0.5, img_w * 0.5 + 0.5)

        tr_matrices: List[np.ndarray] = []
        for idx in range(len(frames)):
            angle, translations, scale, shear = self.get_params(
                self.degrees, self.translate, self.scale, self.shears, (img_h, img_w)
            )
            G = self.inverse_affine_matrix(center, angle, translations, scale, shear)
            tr_matrices.append(G)
            # cv2.warpAffine(img, G) samples src at inv(G).(x, y): G is the
            # forward point motion, inv(G) the dst->src sampling map.
            sampling = _invert_affine_2x3(G)
            frames[idx] = affine_warp(
                frames[idx], sampling, self.frame_fill_color, nearest=False
            ).astype(frames[idx].dtype if frames[idx].dtype != np.uint8 else np.float32).astype(
                np.uint8 if frames[idx].dtype == np.uint8 else frames[idx].dtype
            )
            masks[idx] = affine_warp(
                masks[idx], sampling, self.mask_fill_color, nearest=True
            ).astype(np.uint8)

        for idx in range(1, len(optical_flows)):
            of = update_optical_flow(
                np.asarray(optical_flows[idx], np.float32),
                tr_matrices[idx - 1],
                tr_matrices[idx],
            )
            sampling = _invert_affine_2x3(tr_matrices[idx])
            optical_flows[idx] = affine_warp(
                of, sampling, self.optical_flow_fill_color, nearest=False
            ).astype(np.float32)
        return frames, masks, optical_flows
