"""ctypes bindings for the native host-side kernels.

Builds ``heatmap_native.cc`` with the system compiler on first import
(cached as ``_heatmap_native.so``); falls back to the NumPy reference
implementation in :mod:`dcd_tpu.data.heatmap` when no compiler is
available. Both paths are bit-compatible (tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "_dcd_native.so")
_SRCS = [
    os.path.join(_HERE, "heatmap_native.cc"),
    os.path.join(_HERE, "eval_native.cc"),
]

_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[ctypes.CDLL]:
    global _build_error
    if os.path.exists(_SO_PATH) and all(
        os.path.getmtime(_SO_PATH) >= os.path.getmtime(src) for src in _SRCS
    ):
        return ctypes.CDLL(_SO_PATH)
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", *_SRCS, "-o", _SO_PATH],
            check=True,
            capture_output=True,
        )
        return ctypes.CDLL(_SO_PATH)
    except Exception as e:  # pragma: no cover - toolchain-dependent
        _build_error = str(e)
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None:
        _lib = _build()
        if _lib is not None:
            _lib.splat_batch.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int,
            ]
            _lib.pad_normalize_image.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ]
            _lib.kitti_match_scores.restype = ctypes.c_int
            _lib.kitti_match_scores.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_double, ctypes.POINTER(ctypes.c_double),
            ]
            _lib.kitti_fused_statistics.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int, ctypes.c_double,
                ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
            ]
    return _lib


def available() -> bool:
    return get_lib() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def splat_batch(
    heatmap: np.ndarray,  # (num_cls, H, W) float32, modified in place
    cls_ids: np.ndarray,
    centers: np.ndarray,  # (n, 2) int
    radii_x: np.ndarray,
    radii_y: np.ndarray,
    kinds: np.ndarray,  # 0 isotropic, 1 elliptic
) -> np.ndarray:
    lib = get_lib()
    n = len(cls_ids)
    if n == 0:
        return heatmap
    if lib is None:
        from ..data import heatmap as hm

        for i in range(n):
            c = int(cls_ids[i])
            if c < 0 or c >= heatmap.shape[0]:
                continue
            if kinds[i] == 0:
                hm.draw_umich_gaussian(heatmap[c], centers[i], int(radii_x[i]))
            else:
                hm.draw_umich_gaussian_2d(
                    heatmap[c], centers[i], int(radii_x[i]), int(radii_y[i])
                )
        return heatmap

    heatmap = np.ascontiguousarray(heatmap, np.float32)
    cls_ids = np.ascontiguousarray(cls_ids, np.int32)
    cxs = np.ascontiguousarray(centers[:, 0], np.int32)
    cys = np.ascontiguousarray(centers[:, 1], np.int32)
    radii_x = np.ascontiguousarray(radii_x, np.int32)
    radii_y = np.ascontiguousarray(radii_y, np.int32)
    kinds = np.ascontiguousarray(kinds, np.int32)
    lib.splat_batch(
        _ptr(heatmap, ctypes.c_float),
        heatmap.shape[0], heatmap.shape[1], heatmap.shape[2],
        _ptr(cls_ids, ctypes.c_int32), _ptr(cxs, ctypes.c_int32), _ptr(cys, ctypes.c_int32),
        _ptr(radii_x, ctypes.c_int32), _ptr(radii_y, ctypes.c_int32),
        _ptr(kinds, ctypes.c_int32), n,
    )
    return heatmap


def pad_normalize_image(
    img: np.ndarray, out_h: int, out_w: int, mean: np.ndarray, std: np.ndarray
) -> Optional[np.ndarray]:
    """Fused center-pad + normalize. Returns None if native lib missing."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    out = np.empty((out_h, out_w, c), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib.pad_normalize_image(
        _ptr(img, ctypes.c_uint8), h, w, c,
        _ptr(out, ctypes.c_float), out_h, out_w,
        _ptr(mean, ctypes.c_float), _ptr(std, ctypes.c_float),
    )
    return out


def kitti_match_scores(overlaps, dt_scores, ignored_gt, ignored_det, min_overlap):
    """Native phase-1 matcher: scores of matched TPs at thresh=0.
    Returns None when the native lib is unavailable (caller falls back to
    the Python protocol loop)."""
    lib = get_lib()
    if lib is None:
        return None
    det_size, gt_size = overlaps.shape
    overlaps = np.ascontiguousarray(overlaps, np.float64)
    dt_scores = np.ascontiguousarray(dt_scores, np.float64)
    ignored_gt = np.ascontiguousarray(ignored_gt, np.int64)
    ignored_det = np.ascontiguousarray(ignored_det, np.int64)
    out = np.empty((max(gt_size, 1),), np.float64)
    n = lib.kitti_match_scores(
        _ptr(overlaps, ctypes.c_double), det_size, gt_size,
        _ptr(dt_scores, ctypes.c_double),
        _ptr(ignored_gt, ctypes.c_int64), _ptr(ignored_det, ctypes.c_int64),
        ctypes.c_double(min_overlap), _ptr(out, ctypes.c_double),
    )
    return out[:n]


def kitti_fused_statistics(
    overlaps, dt_scores, dt_alphas, gt_alphas, dt_dc_overlap,
    ignored_gt, ignored_det, metric, min_overlap, thresholds, compute_aos, pr,
):
    """Native fused greedy matching over all thresholds for one image;
    accumulates into pr (T, 4) in place. Returns False when the native lib
    is unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    det_size, gt_size = overlaps.shape
    dc_size = dt_dc_overlap.shape[1] if dt_dc_overlap is not None else 0
    overlaps = np.ascontiguousarray(overlaps, np.float64)
    dt_scores = np.ascontiguousarray(dt_scores, np.float64)
    dt_alphas = np.ascontiguousarray(dt_alphas, np.float64)
    gt_alphas = np.ascontiguousarray(gt_alphas, np.float64)
    if dc_size:
        dc = np.ascontiguousarray(dt_dc_overlap, np.float64)
        dc_ptr = _ptr(dc, ctypes.c_double)
    else:
        dc_ptr = ctypes.POINTER(ctypes.c_double)()
    ignored_gt = np.ascontiguousarray(ignored_gt, np.int64)
    ignored_det = np.ascontiguousarray(ignored_det, np.int64)
    thresholds = np.ascontiguousarray(thresholds, np.float64)
    assert pr.dtype == np.float64 and pr.flags.c_contiguous
    lib.kitti_fused_statistics(
        _ptr(overlaps, ctypes.c_double), det_size, gt_size,
        _ptr(dt_scores, ctypes.c_double), _ptr(dt_alphas, ctypes.c_double),
        _ptr(gt_alphas, ctypes.c_double), dc_ptr, dc_size,
        _ptr(ignored_gt, ctypes.c_int64), _ptr(ignored_det, ctypes.c_int64),
        int(metric), ctypes.c_double(min_overlap),
        _ptr(thresholds, ctypes.c_double), len(thresholds), int(compute_aos),
        _ptr(pr, ctypes.c_double),
    )
    return True
