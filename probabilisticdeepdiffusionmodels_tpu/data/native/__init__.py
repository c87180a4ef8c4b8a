"""ctypes loader for the native data-path library (lazy g++ build).

Falls back cleanly (returns None) when no compiler is available; the numpy
path in data/transforms.py is the behavioral reference either way.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).parent
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[Path]:
    src = _HERE / "transform.cpp"
    out = _HERE / "libpddm_native.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(out), str(src)],
            check=True, capture_output=True, timeout=120,
        )
        return out
    except Exception as e:  # no compiler / sandboxed build env
        print(f"[native] build failed ({e}); falling back to numpy transforms")
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        path = _build()
        if path is not None:
            lib = ctypes.CDLL(str(path))
            lib.transform_batch.restype = None
            lib.transform_batch.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),   # in
                ctypes.POINTER(ctypes.c_float),   # out
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),   # flip flags
                ctypes.c_int32, ctypes.c_int64, ctypes.c_int64,  # crop, pad, cs
                ctypes.POINTER(ctypes.c_int32),   # crop ys
                ctypes.POINTER(ctypes.c_int32),   # crop xs
                ctypes.POINTER(ctypes.c_float),   # mean
                ctypes.POINTER(ctypes.c_float),   # std
            ]
            _LIB = lib
    return _LIB


def transform_batch_native(
    images: np.ndarray,
    flip_flags: Optional[np.ndarray],
    do_crop: bool,
    pad: int,
    crop_size: int,
    crop_ys: Optional[np.ndarray],
    crop_xs: Optional[np.ndarray],
    mean: np.ndarray,
    std: np.ndarray,
) -> Optional[np.ndarray]:
    """One-pass flip+crop+normalize; None when the native lib is absent."""
    lib = get_lib()
    if lib is None:
        return None
    images = np.ascontiguousarray(images, dtype=np.uint8)
    b, h, w, c = images.shape
    out_side_h = crop_size if do_crop else h
    out_side_w = crop_size if do_crop else w
    out = np.empty((b, out_side_h, out_side_w, c), np.float32)

    ff = np.ascontiguousarray(
        flip_flags if flip_flags is not None else np.zeros(b, np.int32),
        dtype=np.int32,
    )
    ys = np.ascontiguousarray(
        crop_ys if crop_ys is not None else np.zeros(b, np.int32), dtype=np.int32
    )
    xs = np.ascontiguousarray(
        crop_xs if crop_xs is not None else np.zeros(b, np.int32), dtype=np.int32
    )
    mean = np.ascontiguousarray(np.broadcast_to(mean, (c,)), dtype=np.float32)
    std = np.ascontiguousarray(np.broadcast_to(std, (c,)), dtype=np.float32)

    lib.transform_batch(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b, h, w, c,
        ff.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        1 if do_crop else 0, pad, crop_size,
        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
