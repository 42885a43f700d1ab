"""ctypes bindings for the native emission tier (emitter.cpp).

Loads (building on first use if the toolchain is present) the threaded
JPEG/PNG encode+write library. Falls back gracefully: callers check
`available()` and use the cv2-based Python path otherwise, so the package
works on hosts without a C++ toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libdfemitter.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "libdfemitter.so"],
            cwd=_DIR,
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        srcs = [os.path.join(_DIR, s) for s in ("emitter.cpp", "wire.cpp")]
        stale = not os.path.exists(_LIB_PATH) or any(
            os.path.exists(s)
            and os.path.getmtime(s) > os.path.getmtime(_LIB_PATH)
            for s in srcs
        )
        if stale and not _build() and not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.df_write_jpg_batch.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ]
        lib.df_write_jpg_batch.restype = ctypes.c_int
        lib.df_write_jpg_color_batch.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ]
        lib.df_write_jpg_color_batch.restype = ctypes.c_int
        lib.df_write_png_batch.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int,
        ]
        lib.df_write_png_batch.restype = ctypes.c_int
        for sym in ("df_wire_unpack", "df_wire_unpack_v3"):
            if hasattr(lib, sym):
                fn = getattr(lib, sym)
                fn.argtypes = [
                    u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, u8p, u8p, ctypes.c_int,
                ]
                fn.restype = ctypes.c_int
        if hasattr(lib, "df_wire_unpack_v4"):
            fn = lib.df_wire_unpack_v4
            fn.argtypes = [
                u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ]
            fn.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _paths_blob(paths: Sequence[str]) -> bytes:
    return b"".join(p.encode() + b"\0" for p in paths)


# OpenCV's imencode('.jpg') default quality — the reference's effective
# setting (SURVEY.md §2.2 C21/N6).
JPEG_QUALITY = 95
DEFAULT_THREADS = max(2, (os.cpu_count() or 4) // 2)


def write_jpg_batch(
    planes: np.ndarray, paths: Sequence[str], n_threads: int = 0
) -> None:
    """planes: (N, H, W) uint8 gray. Encodes + writes in parallel."""
    lib = _load()
    assert lib is not None
    planes = np.ascontiguousarray(planes, dtype=np.uint8)
    n, h, w = planes.shape
    rc = lib.df_write_jpg_batch(
        planes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, _paths_blob(paths), JPEG_QUALITY,
        n_threads or DEFAULT_THREADS,
    )
    if rc != n:
        raise RuntimeError("native jpg batch write failed")


def write_jpg_color_batch(
    frames: np.ndarray, paths: Sequence[str], n_threads: int = 0
) -> None:
    """frames: (N, H, W, 3) uint8 BGR."""
    lib = _load()
    assert lib is not None
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, c = frames.shape
    assert c == 3
    rc = lib.df_write_jpg_color_batch(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, _paths_blob(paths), JPEG_QUALITY,
        n_threads or DEFAULT_THREADS,
    )
    if rc != n:
        raise RuntimeError("native color jpg batch write failed")


def has_wire() -> bool:
    """True when the loaded library includes the wire-codec decoder
    (a stale .so built before wire.cpp existed won't)."""
    lib = _load()
    return lib is not None and hasattr(lib, "df_wire_unpack")


def wire_unpack(
    buf: np.ndarray, m: int, c: int, h: int, w: int, exc_cap: int,
    n_threads: int = 0,
):
    """Decode a wire.py v2 buffer: returns (flags (M,) bool, q (M,C,H,W)
    uint8). Pairs with flag False are left unwritten in q (raw fallback)."""
    lib = _load()
    assert lib is not None
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    flags = np.empty(m, np.uint8)
    q = np.empty((m, c, h, w), np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    rc = lib.df_wire_unpack(
        buf.ctypes.data_as(u8p), m, c, h, w, exc_cap,
        flags.ctypes.data_as(u8p), q.ctypes.data_as(u8p),
        n_threads or DEFAULT_THREADS,
    )
    if rc != 0:
        raise RuntimeError("native wire unpack failed")
    return flags.astype(bool), q


def has_wire_v3() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "df_wire_unpack_v3")


def wire_unpack_v3(
    buf: np.ndarray, m: int, c: int, h: int, w: int, exc_cap: int,
    n_threads: int = 0,
):
    """Decode a wire.py v3 (sparse-group) buffer: returns (flags (M,) bool,
    q (M,C,H,W) uint8). Pairs with flag False are left unwritten in q."""
    lib = _load()
    assert lib is not None
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    flags = np.empty(m, np.uint8)
    q = np.empty((m, c, h, w), np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    rc = lib.df_wire_unpack_v3(
        buf.ctypes.data_as(u8p), m, c, h, w, exc_cap,
        flags.ctypes.data_as(u8p), q.ctypes.data_as(u8p),
        n_threads or DEFAULT_THREADS,
    )
    if rc != 0:
        raise RuntimeError("native wire v3 unpack failed")
    return flags.astype(bool), q


def has_wire_v4() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "df_wire_unpack_v4")


def wire_unpack_v4(
    buf: np.ndarray, m: int, h: int, w: int, n_threads: int = 0
) -> np.ndarray:
    """Decode a wire.py v4 (lossless float32) buffer -> (M, H, W, 2) f32."""
    lib = _load()
    assert lib is not None
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    out = np.empty((m, h, w, 2), np.float32)
    rc = lib.df_wire_unpack_v4(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), m, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads or DEFAULT_THREADS,
    )
    if rc != 0:
        raise RuntimeError("native wire v4 unpack failed")
    return out


def write_png_batch(
    frames: np.ndarray, paths: Sequence[str], n_threads: int = 0
) -> None:
    """frames: (N, H, W, 3) uint8 BGR."""
    lib = _load()
    assert lib is not None
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, c = frames.shape
    assert c == 3
    rc = lib.df_write_png_batch(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, _paths_blob(paths), n_threads or DEFAULT_THREADS,
    )
    if rc != n:
        raise RuntimeError("native png batch write failed")
