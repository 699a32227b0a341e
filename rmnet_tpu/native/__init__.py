"""Native (C++) host-side kernels, built on demand with g++ and loaded via ctypes.

The TPU compute path is pure JAX/XLA/Pallas; these natives cover the *host*
side of the pipeline where the reference also used C++ (its
flow_affine_transformation CPython module): flow re-computation under affine
augmentation and batched affine warping for the data loader.

Build:   python -m rmnet_tpu.native
Usage:   from rmnet_tpu.native import flow_affine_native
         flow_affine_native.update_optical_flow(flow, m1, m2)

If the shared library is missing, importing ``flow_affine_native`` raises and
callers fall back to the vectorized numpy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_HERE))
_SRC = os.path.join(_REPO, "native", "flow_affine.cpp")
_LIB = os.path.join(_HERE, "_flow_affine.so")


def build(force: bool = False) -> str:
    """Compile native/flow_affine.cpp into rmnet_tpu/native/_flow_affine.so."""
    if not force and os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    # -ffp-contract=off: keep float rounding identical to the numpy fallback
    # (FMA contraction flips nearest-neighbor ties at exact .5 coordinates)
    cmd = ["g++", "-O3", "-march=native", "-ffp-contract=off",
           "-shared", "-fPIC", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True)
    return _LIB


class _FlowAffineNative:
    """ctypes wrapper around the C ABI in native/flow_affine.cpp."""

    def __init__(self, lib_path: str):
        import numpy as np

        self._np = np
        self._lib = ctypes.CDLL(lib_path)
        f32p = ctypes.POINTER(ctypes.c_float)
        self._lib.update_optical_flow.argtypes = [
            f32p, f32p, f32p, f32p, ctypes.c_size_t, ctypes.c_size_t
        ]
        self._lib.affine_warp.argtypes = [
            f32p, f32p, f32p, f32p,
            ctypes.c_size_t, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_int,
        ]

    def _ptr(self, a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    def update_optical_flow(self, flow, m1, m2):
        np = self._np
        flow = np.ascontiguousarray(flow, np.float32)
        m1 = np.ascontiguousarray(m1, np.float32)
        m2 = np.ascontiguousarray(m2, np.float32)
        out = np.empty_like(flow)
        h, w = flow.shape[:2]
        self._lib.update_optical_flow(
            self._ptr(flow), self._ptr(m1), self._ptr(m2), self._ptr(out), h, w
        )
        return out

    def affine_warp(self, img, matrix, fill, nearest=False):
        """out(y,x) = img(matrix . (x, y, 1)); matrix is the dst->src mapping."""
        np = self._np
        squeeze = img.ndim == 2
        if squeeze:
            img = img[..., None]
        img = np.ascontiguousarray(img, np.float32)
        matrix = np.ascontiguousarray(matrix, np.float32)
        fill = np.ascontiguousarray(fill, np.float32)
        out = np.empty_like(img)
        h, w, c = img.shape
        assert fill.shape == (c,)
        self._lib.affine_warp(
            self._ptr(img), self._ptr(matrix), self._ptr(fill), self._ptr(out),
            h, w, c, 1 if nearest else 0,
        )
        return out[..., 0] if squeeze else out


def _load():
    if not os.path.exists(_LIB):
        try:
            build()
        except Exception as ex:  # no toolchain — numpy fallbacks take over
            raise ImportError(f"native library unavailable: {ex}")
    return _FlowAffineNative(_LIB)


try:
    flow_affine_native = _load()
except ImportError:
    flow_affine_native = None  # type: ignore[assignment]
    if __name__ != "__main__":
        pass

if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(f"built {path}")
