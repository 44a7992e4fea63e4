"""ctypes bridge to the native host-pipeline kernels (native/fastops.cpp).

Auto-builds libfastops.so on first import when a compiler is present;
everything degrades to the pure-Python implementations when not. Opt out
with DESENET_NATIVE=0.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

LOGGER = logging.getLogger("desenet_tpu")

_LIB: Optional[ctypes.CDLL] = None
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libfastops.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    if os.environ.get("DESENET_NATIVE", "1") == "0":
        return None
    src = os.path.join(_NATIVE_DIR, "fastops.cpp")
    stale = (os.path.exists(_SO_PATH) and os.path.exists(src)
             and os.path.getmtime(src) > os.path.getmtime(_SO_PATH))
    if not os.path.exists(_SO_PATH) or stale:
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-B"], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # no toolchain — fall back silently
            LOGGER.debug("fastops build failed: %s", e)
            if not os.path.exists(_SO_PATH):
                return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.assemble_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_int64, ctypes.c_int64,
        ]
        lib.rasterize_polygons.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.rasterize_polygons.restype = ctypes.c_int64
        lib.rasterize_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.decode_jpeg_scaled.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.decode_jpeg_scaled.restype = ctypes.c_int
        lib.has_jpeg.restype = ctypes.c_int
        lib.assemble_batch_s2d4.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.fastops_version.restype = ctypes.c_int
        assert lib.fastops_version() == 4
        _LIB = lib
        LOGGER.info("fastops native library loaded")
    except Exception as e:
        LOGGER.debug("fastops load failed: %s", e)
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def assemble_batch(samples: Sequence[np.ndarray]) -> np.ndarray:
    """Pack N identical-shape uint8 arrays into one (N, ...) batch with a
    GIL-free parallel memcpy; falls back to np.stack."""
    lib = _load()
    if lib is None or not samples:
        return np.stack(samples, 0)
    shape = samples[0].shape
    n = len(samples)
    out = np.empty((n, *shape), np.uint8)
    srcs = [np.ascontiguousarray(s, dtype=np.uint8) for s in samples]
    arr = (ctypes.c_void_p * n)(
        *[s.ctypes.data_as(ctypes.c_void_p).value for s in srcs]
    )
    lib.assemble_batch(out.ctypes.data_as(ctypes.c_void_p), arr, n,
                       int(np.prod(shape)))
    return out


def assemble_batch_s2d4(samples: Sequence[np.ndarray]) -> np.ndarray:
    """Pack N (H, W, C) uint8 samples into one (N, H/4, W/4, 16C) batch in
    space-to-depth-4 layout (phase-stem input, models/layers.py PhaseStemA).
    The permutation costs nothing beyond the batch memcpy itself in the
    native path; falls back to the numpy reshape/transpose."""
    h, w, c = samples[0].shape
    if h % 4 or w % 4:
        raise ValueError(f"s2d4 needs H, W divisible by 4, got {h}x{w}")
    lib = _load()
    if lib is None or not samples:
        from desenet_tpu.ops.s2d import space_to_depth4_np
        return space_to_depth4_np(np.stack(samples, 0))
    n = len(samples)
    out = np.empty((n, h // 4, w // 4, 16 * c), np.uint8)
    srcs = [np.ascontiguousarray(s, dtype=np.uint8) for s in samples]
    arr = (ctypes.c_void_p * n)(
        *[s.ctypes.data_as(ctypes.c_void_p).value for s in srcs]
    )
    lib.assemble_batch_s2d4(out.ctypes.data_as(ctypes.c_void_p), arr, n,
                            h, w, c)
    return out


def rasterize_polygons_native(
    seg: Sequence[Tuple[int, np.ndarray]], hw: Tuple[int, int]
) -> Optional[np.ndarray]:
    """Native PIL-exact rasterization (fastops.cpp fill_polygon). Returns
    None when the library is unavailable OR any polygon is degenerate
    (self-intersecting / duplicate vertices) — the caller then uses the PIL
    path, so output is bit-identical to PIL in every case."""
    lib = _load()
    if lib is None:
        return None
    mask = np.zeros(hw, np.int32)
    polys = [p for _, p in seg if len(p) > 2]
    ids = [int(c) for c, p in seg if len(p) > 2]
    if not polys:
        return mask
    flat = np.ascontiguousarray(
        np.concatenate([p.astype(np.float32) for p in polys], 0)
    )
    counts = np.asarray([len(p) for p in polys], np.int64)
    cls = np.asarray(ids, np.int32)
    n_done = lib.rasterize_polygons(
        mask.ctypes.data_as(ctypes.c_void_p), hw[0], hw[1],
        flat.ctypes.data_as(ctypes.c_void_p),
        counts.ctypes.data_as(ctypes.c_void_p),
        cls.ctypes.data_as(ctypes.c_void_p), len(polys),
    )
    if n_done != len(polys):  # degenerate polygon: preserve PIL ordering
        return None
    return mask


def jpeg_available() -> bool:
    lib = _load()
    return lib is not None and bool(lib.has_jpeg())


def decode_jpeg_scaled(
    data: bytes, target_long: int
) -> Optional[Tuple[np.ndarray, Tuple[int, int]]]:
    """Scaled JPEG decode: RGB uint8 HWC decoded at the largest libjpeg M/8
    fraction whose long side stays >= target_long, plus the full-resolution
    (h0, w0). DCT-domain scaling makes this ~4x faster than full decode +
    LANCZOS on 2x-oversized sources (the reference's PIL path,
    mixed_datasets.py:624-640). Returns None when the native library lacks
    libjpeg or the stream is not a clean JPEG — callers fall back to PIL."""
    lib = _load()
    if lib is None or not lib.has_jpeg():
        return None
    if len(data) < 3 or data[:2] != b"\xff\xd8":
        return None
    buf = np.frombuffer(data, np.uint8)
    # size the output for the worst case (scale 8/8 = full-res RGB) by
    # reading the SOF dimensions from the marker stream
    import struct as _struct

    h0 = w0 = None
    i, n = 2, len(data)
    while i + 9 < n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = _struct.unpack(">H", data[i + 2:i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h0, w0 = _struct.unpack(">HH", data[i + 5:i + 9])
            break
        i += 2 + seg_len
    if not h0 or not w0:
        return None
    out = np.empty(int(h0) * int(w0) * 3, np.uint8)
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    fw = ctypes.c_int32()
    fh = ctypes.c_int32()
    ok = lib.decode_jpeg_scaled(
        buf.ctypes.data_as(ctypes.c_void_p), len(data), int(target_long),
        out.ctypes.data_as(ctypes.c_void_p), out.size,
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(fw), ctypes.byref(fh),
    )
    if not ok:
        return None
    arr = out[: h.value * w.value * 3].reshape(h.value, w.value, 3)
    return arr, (fh.value, fw.value)
