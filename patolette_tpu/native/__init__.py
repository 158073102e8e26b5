"""ctypes loader for the native oracle library.

Compiles ``oracle.cpp`` on demand with the system g++ (cached as
``liboracle.so`` next to the source) and exposes numpy-friendly wrappers.
Falls back to ``None`` handles if no compiler is available — callers must
skip (tests) or use the JAX path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "liboracle.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    src = os.path.join(_DIR, "oracle.cpp")
    if not os.path.exists(_SO) or (
        os.path.getmtime(_SO) < os.path.getmtime(src)
    ):
        try:
            subprocess.run(
                ["make", "-C", _DIR], check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    lib.oracle_riemersma_dither.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.oracle_nn_map.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.oracle_mbd_scan.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_long, ctypes.c_long, ctypes.c_int,
    ]
    lib.oracle_hilbert_d.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_long, ctypes.c_int, ctypes.POINTER(ctypes.c_uint64),
    ]
    for name, ct in (
        ("oracle_lut_map_u8", ctypes.c_uint8),
        ("oracle_lut_map_u16", ctypes.c_uint16),
        ("oracle_lut_map_i32", ctypes.c_int32),
    ):
        getattr(lib, name).argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ct), ctypes.POINTER(ct), ctypes.c_int,
        ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def riemersma_dither(image, width, height, palette, channel_weights):
    """Exact serial reference-semantics dither. image: (h*w, 3) f64 linear
    Rec2020; returns int32 (h*w) palette map."""
    lib = _load()
    image = np.ascontiguousarray(image, np.float64)
    palette = np.ascontiguousarray(palette, np.float64)
    cw = np.ascontiguousarray(channel_weights, np.float64)
    out = np.zeros(width * height, np.int32)
    lib.oracle_riemersma_dither(
        _ptr(image, ctypes.c_double), width, height,
        _ptr(palette, ctypes.c_double), len(palette),
        _ptr(cw, ctypes.c_double), _ptr(out, ctypes.c_int32),
    )
    return out


def nn_map(colors, palette):
    lib = _load()
    colors = np.ascontiguousarray(colors, np.float64)
    palette = np.ascontiguousarray(palette, np.float64)
    out = np.zeros(len(colors), np.int32)
    lib.oracle_nn_map(
        _ptr(colors, ctypes.c_double), len(colors),
        _ptr(palette, ctypes.c_double), len(palette),
        _ptr(out, ctypes.c_int32),
    )
    return out


def mbd(img, iters=3):
    """Full MBD transform with the reference's alternating scans."""
    lib = _load()
    img = np.ascontiguousarray(img, np.float32)
    rows, cols = img.shape
    l = img.copy()
    u = img.copy()
    d = np.full((rows, cols), np.inf, np.float32)
    d[0, :] = d[-1, :] = d[:, 0] = d[:, -1] = 0
    for it in range(iters):
        inverse = 0 if it % 2 == 1 else 1
        lib.oracle_mbd_scan(
            _ptr(img, ctypes.c_float), _ptr(l, ctypes.c_float),
            _ptr(u, ctypes.c_float), _ptr(d, ctypes.c_float),
            rows, cols, inverse,
        )
    return d


def lut_map_u8(colors_u8, lut, nthreads: int = 0):
    """Fused 24-bit pack + LUT gather: out[i] = lut[r<<16 | g<<8 | b].

    ``colors_u8``: (N, 3) uint8; ``lut``: (2^24,) uint8/uint16/int32.
    Returns an (N,) array of ``lut.dtype``, or None when the native
    library is unavailable (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    fns = {
        np.dtype(np.uint8): (lib.oracle_lut_map_u8, ctypes.c_uint8),
        np.dtype(np.uint16): (lib.oracle_lut_map_u16, ctypes.c_uint16),
        np.dtype(np.int32): (lib.oracle_lut_map_i32, ctypes.c_int32),
    }
    if lut.dtype not in fns:
        return None
    fn, ct = fns[lut.dtype]
    colors_u8 = np.ascontiguousarray(colors_u8, np.uint8)
    lut = np.ascontiguousarray(lut)
    n = len(colors_u8)
    out = np.empty((n,), lut.dtype)
    if not nthreads:
        # latency-bound gather: oversubscribing the cores hides table misses
        nthreads = min(8, 2 * (os.cpu_count() or 1))
    fn(_ptr(colors_u8, ctypes.c_uint8), n, _ptr(lut, ct), _ptr(out, ct),
       nthreads)
    return out


def hilbert_d(x, y, order):
    lib = _load()
    x = np.ascontiguousarray(x, np.uint32)
    y = np.ascontiguousarray(y, np.uint32)
    out = np.zeros(len(x), np.uint64)
    lib.oracle_hilbert_d(
        _ptr(x, ctypes.c_uint32), _ptr(y, ctypes.c_uint32),
        len(x), order, _ptr(out, ctypes.c_uint64),
    )
    return out
