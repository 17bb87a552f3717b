"""Native (C++) host-side components, loaded through ctypes.

The compute path runs on TPU through XLA/Pallas; the host-side runtime hot
spots — CenterNet target encoding and image normalization in the data
pipeline — are implemented in C++ (``encoder.cpp``) as the analog of the
reference's native DCNv2 extension for *its* hot spot. The shared library
is compiled on first use with the toolchain baked into the image (g++) and
cached next to the source; when no compiler is available everything falls
back to the numpy implementations transparently.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "encoder.cpp"
_LIB_PATH = Path(__file__).parent / "_encoder.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[Path]:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", str(_LIB_PATH), str(_SRC),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except (OSError, subprocess.SubprocessError) as exc:
        log.warning("native encoder build failed (%s); using numpy fallback",
                    exc)
        return None


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native encoder library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("CENTERNET_DISABLE_NATIVE"):
            return None
        path = _LIB_PATH
        if not path.exists() or path.stat().st_mtime < _SRC.stat().st_mtime:
            if _build() is None:
                return None
        try:
            lib = ctypes.CDLL(str(path))
        except OSError as exc:
            log.warning("could not load native encoder: %s", exc)
            return None

        f32p = ctypes.POINTER(ctypes.c_float)
        lib.gaussian_radius.restype = ctypes.c_double
        lib.gaussian_radius.argtypes = [ctypes.c_double] * 3
        lib.encode_targets.restype = None
        lib.encode_targets.argtypes = [
            f32p, ctypes.POINTER(ctypes.c_int32), f32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float,
            f32p, f32p, f32p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint8), f32p, f32p,
        ]
        lib.draw_gaussian.restype = None
        lib.draw_gaussian.argtypes = [f32p] + [ctypes.c_int] * 5
        lib.normalize_image.restype = None
        lib.normalize_image.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), f32p, ctypes.c_int, f32p, f32p,
        ]
        _lib = lib
        log.info("native target encoder loaded (%s)", path.name)
        return _lib


def available() -> bool:
    return load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def encode_targets(
    boxes: np.ndarray,
    classes: np.ndarray,
    areas: np.ndarray,
    out_h: int,
    out_w: int,
    num_classes: int,
    max_dets: int,
    min_overlap: float = 0.7,
):
    """Native axis-aligned target encoding; returns the target dict or None.

    ``boxes`` (N, 4) x1y1x2y2 float32 in output-map coordinates; ``areas``
    entries < 0 derive the area from the box (datasets/coco.py:230-233).
    """
    lib = load()
    if lib is None:
        return None

    boxes = np.ascontiguousarray(boxes, np.float32)
    classes = np.ascontiguousarray(classes, np.int32)
    areas = np.ascontiguousarray(areas, np.float32)

    hm = np.zeros((out_h, out_w, num_classes), np.float32)
    wh = np.zeros((max_dets, 2), np.float32)
    reg = np.zeros((max_dets, 2), np.float32)
    ind = np.zeros((max_dets,), np.int64)
    reg_mask = np.zeros((max_dets,), np.uint8)
    gt_dets = np.zeros((max_dets, 6), np.float32)
    gt_areas = np.zeros((max_dets,), np.float32)

    lib.encode_targets(
        _ptr(boxes, ctypes.c_float), _ptr(classes, ctypes.c_int32),
        _ptr(areas, ctypes.c_float),
        int(len(boxes)), int(out_h), int(out_w), int(num_classes),
        int(max_dets), float(min_overlap),
        _ptr(hm, ctypes.c_float), _ptr(wh, ctypes.c_float),
        _ptr(reg, ctypes.c_float), _ptr(ind, ctypes.c_int64),
        _ptr(reg_mask, ctypes.c_uint8), _ptr(gt_dets, ctypes.c_float),
        _ptr(gt_areas, ctypes.c_float),
    )
    return {
        "hm": hm, "wh": wh, "reg": reg, "ind": ind, "reg_mask": reg_mask,
        "gt_dets": gt_dets, "gt_areas": gt_areas,
    }


def normalize_image(img: np.ndarray, mean, std) -> Optional[np.ndarray]:
    """Native (x/255 - mean) / std for HWC uint8 images, or None."""
    lib = load()
    if lib is None or img.dtype != np.uint8 or img.shape[-1] != 3:
        return None
    img = np.ascontiguousarray(img)
    out = np.empty(img.shape, np.float32)
    mean = np.ascontiguousarray(np.asarray(mean, np.float32).reshape(3))
    std = np.ascontiguousarray(np.asarray(std, np.float32).reshape(3))
    lib.normalize_image(
        _ptr(img, ctypes.c_uint8), _ptr(out, ctypes.c_float),
        int(img.shape[0] * img.shape[1]),
        _ptr(mean, ctypes.c_float), _ptr(std, ctypes.c_float),
    )
    return out


def _declare_match(lib):
    import ctypes

    lib.coco_greedy_match.restype = None
    lib.coco_greedy_match.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
    ]


def coco_greedy_match(ious, gt_ignore, gt_crowd, thrs, dt_out_of_range):
    """Native COCO greedy matching; returns (dtm, dt_ignore) as (T, D)
    uint8 arrays, or None without a toolchain."""
    lib = load()
    if lib is None:
        return None
    if not hasattr(lib.coco_greedy_match, "argtypes") or \
            not lib.coco_greedy_match.argtypes:
        _declare_match(lib)

    import ctypes

    ious = np.ascontiguousarray(ious, np.float64)
    gt_ignore = np.ascontiguousarray(gt_ignore, np.uint8)
    gt_crowd = np.ascontiguousarray(gt_crowd, np.uint8)
    thrs = np.ascontiguousarray(thrs, np.float64)
    dt_out = np.ascontiguousarray(dt_out_of_range, np.uint8)
    num_dt, num_gt = (ious.shape if ious.size else (len(dt_out), 0))
    num_thrs = len(thrs)

    dtm = np.zeros((num_thrs, num_dt), np.uint8)
    dt_ig = np.zeros((num_thrs, num_dt), np.uint8)
    gtm = np.zeros((max(num_gt, 1),), np.int32)

    lib.coco_greedy_match(
        _ptr(ious, ctypes.c_double), int(num_dt), int(num_gt),
        _ptr(gt_ignore, ctypes.c_uint8), _ptr(gt_crowd, ctypes.c_uint8),
        _ptr(thrs, ctypes.c_double), int(num_thrs),
        _ptr(dt_out, ctypes.c_uint8),
        _ptr(dtm, ctypes.c_uint8), _ptr(dt_ig, ctypes.c_uint8),
        _ptr(gtm, ctypes.c_int32),
    )
    return dtm, dt_ig
