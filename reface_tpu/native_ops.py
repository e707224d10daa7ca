"""ctypes bindings for the C++ host-runtime kernels (native/).

Role parity: the reference's native surface is dlib (C++ detector + ERT
landmark predictor) plus cv2/PIL internals. libreface_native.so provides
OpenMP C++ equivalents for the host pipeline: resize/remap warps, TPS grids,
mask LUT ops, uint8 normalization, and an ERT landmark cascade evaluator
(own binary format; tools/convert_dlib_sp.py converts a dlib .dat offline).

All entry points degrade gracefully: `available()` is False when the .so
hasn't been built (`make -C native`), and the pure-numpy paths in
reface_tpu.data / reface_tpu.preprocess remain the reference implementations
the tests compare against.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = [
    "available",
    "build",
    "resize_bilinear",
    "remap_bilinear",
    "tps_grid",
    "mask_remap",
    "preserve_mask",
    "u8_to_pm1",
    "u8_to_clip",
    "ert_load",
    "ert_predict",
    "ert_predict_batch",
]

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_ROOT, "native", "libreface_native.so")
_lib = None


def build(force: bool = False) -> bool:
    """Compile the native library with make; returns success."""
    if os.path.exists(_SO) and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", os.path.join(_ROOT, "native")],
            check=True, capture_output=True,
        )
        return os.path.exists(_SO)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not build():
        return None
    lib = ctypes.CDLL(_SO)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.rn_resize_bilinear.argtypes = [f32p] + [ctypes.c_int] * 3 + [f32p] + [ctypes.c_int] * 2
    lib.rn_remap_bilinear.argtypes = [f32p] + [ctypes.c_int] * 3 + [f32p, f32p, f32p] + [ctypes.c_int] * 2
    lib.rn_tps_grid.argtypes = [f32p, f32p, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int]
    lib.rn_tps_grid.restype = ctypes.c_int
    lib.rn_mask_remap.argtypes = [i32p, ctypes.c_int, i32p, ctypes.c_int, i32p]
    lib.rn_preserve_mask.argtypes = [i32p, ctypes.c_int, i32p, ctypes.c_int, f32p]
    lib.rn_u8_to_pm1.argtypes = [u8p, ctypes.c_int, f32p]
    lib.rn_u8_to_clip.argtypes = [u8p, ctypes.c_int, f32p]
    lib.rn_ert_load.argtypes = [ctypes.c_char_p]
    lib.rn_ert_load.restype = ctypes.c_int
    lib.rn_ert_predict.argtypes = [u8p, ctypes.c_int, ctypes.c_int] + [ctypes.c_float] * 4 + [f32p]
    lib.rn_ert_predict.restype = ctypes.c_int
    lib.rn_ert_n_points.restype = ctypes.c_int
    lib.rn_ert_predict_batch.argtypes = [u8p] + [ctypes.c_int] * 3 + [f32p, f32p]
    lib.rn_ert_predict_batch.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _up(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_bilinear(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(src, np.float32)
    sh, sw, c = src.shape
    dst = np.empty((dh, dw, c), np.float32)
    lib.rn_resize_bilinear(_fp(src), sh, sw, c, _fp(dst), dh, dw)
    return dst


def remap_bilinear(src: np.ndarray, map_x: np.ndarray, map_y: np.ndarray) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(src, np.float32)
    sh, sw, c = src.shape
    map_x = np.ascontiguousarray(map_x, np.float32)
    map_y = np.ascontiguousarray(map_y, np.float32)
    dh, dw = map_x.shape
    dst = np.empty((dh, dw, c), np.float32)
    lib.rn_remap_bilinear(_fp(src), sh, sw, c, _fp(map_x), _fp(map_y), _fp(dst), dh, dw)
    return dst


def tps_grid(ctrl: np.ndarray, warped: np.ndarray, h: int, w: int) -> np.ndarray:
    lib = _load()
    ctrl = np.ascontiguousarray(ctrl, np.float32)
    warped = np.ascontiguousarray(warped, np.float32)
    out = np.empty((h, w, 2), np.float32)
    rc = lib.rn_tps_grid(_fp(ctrl), _fp(warped), ctrl.shape[0], _fp(out), h, w)
    if rc != 0:
        raise RuntimeError(f"tps solve failed rc={rc}")
    return out


def mask_remap(mask: np.ndarray, lut: np.ndarray) -> np.ndarray:
    lib = _load()
    mask = np.ascontiguousarray(mask, np.int32)
    lut = np.ascontiguousarray(lut, np.int32)
    out = np.empty_like(mask)
    lib.rn_mask_remap(_ip(mask), mask.size, _ip(lut), lut.size, _ip(out))
    return out


def preserve_mask(mask: np.ndarray, classes) -> np.ndarray:
    lib = _load()
    mask = np.ascontiguousarray(mask, np.int32)
    cls = np.asarray(list(classes), np.int32)
    out = np.empty(mask.shape, np.float32)
    lib.rn_preserve_mask(_ip(mask), mask.size, _ip(cls), cls.size, _fp(out))
    return out


def u8_to_pm1(img: np.ndarray) -> np.ndarray:
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty(img.shape, np.float32)
    lib.rn_u8_to_pm1(_up(img), img.size, _fp(out))
    return out


def u8_to_clip(img: np.ndarray) -> np.ndarray:
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    assert img.shape[-1] == 3
    out = np.empty(img.shape, np.float32)
    lib.rn_u8_to_clip(_up(img), img.size // 3, _fp(out))
    return out


def ert_load(path: str) -> None:
    lib = _load()
    rc = lib.rn_ert_load(path.encode())
    if rc != 0:
        raise RuntimeError(f"ert model load failed rc={rc}")


def ert_predict_batch(grays: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """grays: (N,H,W) uint8; boxes: (N,4). Returns (N, n_points, 2)."""
    lib = _load()
    grays = np.ascontiguousarray(grays, np.uint8)
    boxes = np.ascontiguousarray(boxes, np.float32)
    n, h, w = grays.shape
    npts = lib.rn_ert_n_points()
    if npts == 0:
        raise RuntimeError("no ERT model loaded")
    out = np.empty((n, npts, 2), np.float32)
    rc = lib.rn_ert_predict_batch(_up(grays), n, h, w, _fp(boxes), _fp(out))
    if rc != 0:
        raise RuntimeError(f"ert batch predict failed rc={rc}")
    return out


def ert_predict(gray: np.ndarray, box) -> np.ndarray:
    """gray: (H,W) uint8; box: (x0,y0,x1,y1). Returns (n_points,2) float."""
    lib = _load()
    gray = np.ascontiguousarray(gray, np.uint8)
    n = lib.rn_ert_n_points()
    if n == 0:
        raise RuntimeError("no ERT model loaded")
    out = np.empty((n, 2), np.float32)
    rc = lib.rn_ert_predict(
        _up(gray), gray.shape[0], gray.shape[1],
        float(box[0]), float(box[1]), float(box[2]), float(box[3]), _fp(out),
    )
    if rc != 0:
        raise RuntimeError(f"ert predict failed rc={rc}")
    return out
