"""ctypes bindings to the native (C++) data-loader core.

`native/loader.cpp` reads + decodes + LUT-maps + pads whole batches of
KITTI-format scans with one thread per sample — the host-side hot path
(the reference does this in forked numpy DataLoader workers). Falls back
to the numpy reader transparently when the library hasn't been built
(`make -C native`).
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "libpmfloader.so")

_lib = None


def load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.read_scan.restype = ctypes.c_int64
    lib.read_scan.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8)]
    lib.read_scan_batch.restype = ctypes.c_int
    lib.read_scan_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64)]
    if hasattr(lib, "decode_png"):
        # decode_image sniffs PNG vs JPEG; decode_png is a back-compat
        # alias in current builds (pre-JPEG builds export only it)
        decoder = getattr(lib, "decode_image", lib.decode_png)
        decoder.restype = ctypes.c_int
        decoder.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib._decode_image = decoder
        lib.read_scan_full.restype = ctypes.c_int64
        lib.read_scan_full.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def png_available() -> bool:
    lib = load_library()
    return lib is not None and hasattr(lib, "decode_png")


def image_available() -> bool:
    """True when the native image decoder (PNG + JPEG dispatch) exists."""
    return png_available()


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def read_scan(pcd_path: str, label_path: str | None, label_lut: np.ndarray,
              n_max: int, point_dim: int = 4):
    """Read one padded scan natively. Returns (points, labels, valid, n)."""
    lib = load_library()
    assert lib is not None, "native loader not built (make -C native)"
    lut = np.ascontiguousarray(label_lut, np.int32)
    points = np.empty((n_max, point_dim), np.float32)
    labels = np.empty((n_max,), np.int32)
    valid = np.empty((n_max,), np.uint8)
    n = lib.read_scan(
        pcd_path.encode(), (label_path or "").encode(),
        _ptr(lut, ctypes.c_int32), lut.size, n_max, point_dim,
        _ptr(points, ctypes.c_float), _ptr(labels, ctypes.c_int32),
        _ptr(valid, ctypes.c_uint8))
    if n < 0:
        raise IOError(f"native read failed: {pcd_path}")
    return points, labels, valid.astype(bool), int(n)


def read_scan_batch(pcd_paths, label_paths, label_lut: np.ndarray,
                    n_max: int, point_dim: int = 4):
    """Parallel batch read. Returns (points [B,n,pd], labels [B,n],
    valid [B,n] bool, counts [B])."""
    lib = load_library()
    assert lib is not None, "native loader not built (make -C native)"
    B = len(pcd_paths)
    lut = np.ascontiguousarray(label_lut, np.int32)
    points = np.empty((B, n_max, point_dim), np.float32)
    labels = np.empty((B, n_max), np.int32)
    valid = np.empty((B, n_max), np.uint8)
    counts = np.empty((B,), np.int64)
    c_pcd = (ctypes.c_char_p * B)(*[p.encode() for p in pcd_paths])
    if label_paths is None:
        c_lbl = (ctypes.c_char_p * B)(*([b""] * B))
    else:
        c_lbl = (ctypes.c_char_p * B)(
            *[(p or "").encode() for p in label_paths])
    failures = lib.read_scan_batch(
        c_pcd, c_lbl, B, _ptr(lut, ctypes.c_int32), lut.size, n_max,
        point_dim, _ptr(points, ctypes.c_float), _ptr(labels, ctypes.c_int32),
        _ptr(valid, ctypes.c_uint8), _ptr(counts, ctypes.c_int64))
    if failures:
        bad = [p for p, c in zip(pcd_paths, counts) if c < 0]
        raise IOError(f"native batch read failed for {failures} scans: {bad}")
    return points, labels, valid.astype(bool), counts


def decode_image(path: str, canvas_h: int, canvas_w: int):
    """Decode a PNG or JPEG straight onto the float canvas (pad_image
    semantics: top-left, /255, zero padding). Returns (canvas [H,W,3]
    f32, img_h, img_w). PNG: 8-bit gray/RGB/RGBA non-interlaced; JPEG:
    baseline/progressive via libjpeg. Raises on exotic files (callers
    fall back to PIL)."""
    lib = load_library()
    assert lib is not None and hasattr(lib, "_decode_image")
    canvas = np.empty((canvas_h, canvas_w, 3), np.float32)
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    rc = lib._decode_image(path.encode(), _ptr(canvas, ctypes.c_float),
                           canvas_h, canvas_w, ctypes.byref(h),
                           ctypes.byref(w))
    if rc != 0:
        raise IOError(f"native image decode failed ({rc}): {path}")
    return canvas, np.int32(h.value), np.int32(w.value)


decode_png = decode_image  # back-compat name


def read_scan_full(pcd_path: str, label_path: str | None, image_path: str,
                   label_lut: np.ndarray, n_max: int, canvas_h: int,
                   canvas_w: int, point_dim: int = 4):
    """One ctypes call per sample: points + labels + PNG → padded
    buffers. The call drops the GIL, so a Python thread pool scales
    across cores. Returns the full PV sample tuple
    (points, labels, valid, canvas, img_h, img_w, n)."""
    lib = load_library()
    assert lib is not None and hasattr(lib, "read_scan_full")
    lut = np.ascontiguousarray(label_lut, np.int32)
    points = np.empty((n_max, point_dim), np.float32)
    labels = np.empty((n_max,), np.int32)
    valid = np.empty((n_max,), np.uint8)
    canvas = np.empty((canvas_h, canvas_w, 3), np.float32)
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    n = lib.read_scan_full(
        pcd_path.encode(), (label_path or "").encode(), image_path.encode(),
        _ptr(lut, ctypes.c_int32), lut.size, n_max, point_dim,
        _ptr(points, ctypes.c_float), _ptr(labels, ctypes.c_int32),
        _ptr(valid, ctypes.c_uint8), _ptr(canvas, ctypes.c_float),
        canvas_h, canvas_w, ctypes.byref(h), ctypes.byref(w))
    if n < 0:
        raise IOError(f"native full-scan read failed ({n}): {pcd_path}")
    return (points, labels, valid.astype(bool), canvas,
            np.int32(h.value), np.int32(w.value), int(n))
