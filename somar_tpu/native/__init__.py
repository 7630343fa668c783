"""Native (C++) runtime components, loaded via ctypes.

The reference implements its regrid-time machinery (Berger-Rigoutsos
clustering, box calculus) in C++ (LepticMeshRefine, 1606 LoC); these are
inherently host-side (they change array shapes), so they stay native here
too.  Built on first use with g++ -O2; falls back to a NumPy
implementation if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB = None
_BUILD_FAILED = False


def _build_and_load():
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    src = os.path.join(_HERE, "clustering.cpp")
    so = os.path.join(_HERE, "libsomar_native.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                 "-o", so, src],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.br_cluster.restype = ctypes.c_int
        lib.br_cluster.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        lib.tag_bounding_box.restype = ctypes.c_int
        lib.tag_bounding_box.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        _LIB = lib
    except Exception as e:  # pragma: no cover - compiler missing
        print(f"somar_tpu.native: build failed ({e}); using NumPy fallback",
              file=sys.stderr)
        _BUILD_FAILED = True
    return _LIB


def _as3d(tags: np.ndarray):
    t = np.ascontiguousarray(tags.astype(np.uint8))
    if t.ndim == 2:
        t = t[:, :, None]
    assert t.ndim == 3
    return t


def berger_rigoutsos(tags: np.ndarray, fill_ratio: float = 0.7,
                     max_boxes: int = 64, min_side: int = 4) -> np.ndarray:
    """Cluster a boolean tag field into boxes.

    Returns an (nboxes, 2, ndim) int array of [lo, hi] (hi inclusive) in
    the tag array's axis order.  Reference: LepticMeshRefine::regrid.
    """
    ndim = tags.ndim
    t = _as3d(tags)
    lib = _build_and_load()
    if lib is not None:
        out = np.zeros((max_boxes, 6), dtype=np.int32)
        n = lib.br_cluster(
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            t.shape[0], t.shape[1], t.shape[2],
            float(fill_ratio), int(max_boxes), int(min_side),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        boxes = out[:n].reshape(n, 2, 3)
    else:
        boxes = _numpy_bounding(t)
    if ndim == 2:
        boxes = boxes[:, :, :2]
    return boxes


def tag_bounding_box(tags: np.ndarray):
    """Bounding box of all tags, or None (single-patch fast path)."""
    ndim = tags.ndim
    t = _as3d(tags)
    lib = _build_and_load()
    if lib is not None:
        out = np.zeros(6, dtype=np.int32)
        ok = lib.tag_bounding_box(
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            t.shape[0], t.shape[1], t.shape[2],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        if not ok:
            return None
        box = out.reshape(2, 3)
    else:
        bb = _numpy_bounding(t)
        if bb.shape[0] == 0:
            return None
        box = bb[0]
    return box[:, :ndim] if ndim == 2 else box


def _numpy_bounding(t: np.ndarray) -> np.ndarray:
    idx = np.argwhere(t != 0)
    if idx.size == 0:
        return np.zeros((0, 2, 3), dtype=np.int32)
    lo = idx.min(axis=0)
    hi = idx.max(axis=0)
    return np.stack([lo, hi])[None, ...].astype(np.int32)
