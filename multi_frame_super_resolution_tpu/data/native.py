"""ctypes bindings for the native C++ data loader (native/mfsr_native.cpp).

The native path decodes PNG/JPEG via libpng/libjpeg with threaded burst
loads — the framework equivalent of the reference's C++ cv::imread host
loop (multi_frame_sr.cpp:167-174). Falls back transparently when the
shared library hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB_NAME = "libmfsr_native.so"


def _candidate_paths():
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    yield os.path.join(here, "native", _LIB_NAME)
    env = os.environ.get("MFSR_NATIVE_LIB")
    if env:
        yield env


_lib: Optional[ctypes.CDLL] = None


def _try_build() -> None:
    """Best-effort one-shot build of the native library from source."""
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    src_dir = os.path.join(here, "native")
    if not os.path.exists(os.path.join(src_dir, "Makefile")):
        return
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", src_dir],
            check=False,
            timeout=120,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
    except Exception:
        pass


_build_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if os.environ.get("MFSR_NO_NATIVE"):
        return None
    if not any(os.path.exists(p) for p in _candidate_paths()) and not _build_attempted:
        _build_attempted = True
        _try_build()
    for path in _candidate_paths():
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            lib.mfsr_probe.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.mfsr_probe.restype = ctypes.c_int
            lib.mfsr_read_image_f32.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
            ]
            lib.mfsr_read_image_f32.restype = ctypes.c_int
            lib.mfsr_read_burst_f32.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
            ]
            lib.mfsr_read_burst_f32.restype = ctypes.c_int
            lib.mfsr_read_raw_u16.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_long,
                ctypes.c_float,
            ]
            lib.mfsr_read_raw_u16.restype = ctypes.c_int
            _lib = lib
            return lib
    return None


def available() -> bool:
    return _load() is not None


def probe(path: str):
    """(h, w, channels, bit_depth) or None if unavailable/failed."""
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    bd = ctypes.c_int()
    rc = lib.mfsr_probe(path.encode(), ctypes.byref(h), ctypes.byref(w),
                        ctypes.byref(c), ctypes.byref(bd))
    if rc != 0:
        return None
    return h.value, w.value, c.value, bd.value


def imread_native(path: str, gray: bool = False) -> Optional[np.ndarray]:
    """float32 [0,1] RGB (H, W, 3) or gray (H, W); None on any failure."""
    lib = _load()
    if lib is None:
        return None
    info = probe(path)
    if info is None:
        return None
    h, w, _, _ = info
    want_c = 1 if gray else 3
    out = np.empty((h, w, want_c), np.float32)
    rc = lib.mfsr_read_image_f32(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, want_c,
    )
    if rc != 0:
        return None
    return out[..., 0] if gray else out


def read_burst_native(paths: List[str]) -> Optional[np.ndarray]:
    """Threaded burst load -> (F, H, W, 3) float32; None on failure or if
    frames disagree in shape."""
    lib = _load()
    if lib is None or not paths:
        return None
    info = probe(paths[0])
    if info is None:
        return None
    h, w, _, _ = info
    for p in paths[1:]:
        i2 = probe(p)
        if i2 is None or (i2[0], i2[1]) != (h, w):
            return None
    n = len(paths)
    out = np.empty((n, h, w, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.mfsr_read_burst_f32(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, 3
    )
    if rc != 0:
        return None
    return out


def read_raw_u16(path: str, h: int, w: int, offset: int = 0,
                 max_val: float = 65535.0) -> Optional[np.ndarray]:
    """Packed little-endian u16 RAW -> float32 (H, W) in [0, 1]."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((h, w), np.float32)
    rc = lib.mfsr_read_raw_u16(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, offset, max_val,
    )
    if rc != 0:
        return None
    return out
