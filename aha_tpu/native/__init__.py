"""ctypes bindings for the native libav decoder (native/decoder.cc).

Builds `libaha_decoder.so` on demand via make (g++ + libav dev headers are
part of the toolchain); falls back cleanly when unavailable —
`aha_tpu.data.media.decode_video` stays the portable cv2 path and
`decode_video_native` is the drop-in fast path with identical outputs
(same frame-counter resampling and letterbox math).
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libaha_decoder.so")

_lib = None
_tried = False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("AHA_NATIVE_DECODER", "auto") == "off":
        return None
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.aha_open.restype = ctypes.c_void_p
    lib.aha_open.argtypes = [ctypes.c_char_p]
    lib.aha_info.restype = ctypes.c_int
    lib.aha_info.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
                             ctypes.POINTER(ctypes.c_double),
                             ctypes.POINTER(ctypes.c_int),
                             ctypes.POINTER(ctypes.c_int)]
    lib.aha_decode.restype = ctypes.c_int
    lib.aha_decode.argtypes = [ctypes.c_void_p, ctypes.c_double, ctypes.c_int,
                               ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p]
    lib.aha_close.restype = None
    lib.aha_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


class NativeVideo:
    """Streaming decoder handle: probe + incremental chunked decode."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native decoder unavailable")
        self._lib = lib
        self._ctx = lib.aha_open(path.encode())
        if not self._ctx:
            raise IOError(f"cannot open video {path}")
        fps = ctypes.c_double()
        dur = ctypes.c_double()
        w = ctypes.c_int()
        h = ctypes.c_int()
        lib.aha_info(self._ctx, ctypes.byref(fps), ctypes.byref(dur),
                     ctypes.byref(w), ctypes.byref(h))
        self.fps = fps.value
        self.duration = dur.value
        self.width = w.value
        self.height = h.value

    def decode(self, *, output_fps: float, output_size: int,
               max_frames: int) -> tuple[np.ndarray, list[int]]:
        """Decode the next `max_frames` resampled frames (streaming: call
        repeatedly for chunked/prefetched pipelines)."""
        out = np.zeros((max_frames, output_size, output_size, 3), np.uint8)
        idx = np.zeros((max_frames,), np.int32)
        n = self._lib.aha_decode(
            self._ctx, float(output_fps), int(output_size), int(max_frames),
            out.ctypes.data_as(ctypes.c_void_p), idx.ctypes.data_as(ctypes.c_void_p),
        )
        if n < 0:
            raise IOError(f"decode error {n}")
        return out[:n], [int(i) for i in idx[:n]]

    def close(self):
        if self._ctx:
            self._lib.aha_close(self._ctx)
            self._ctx = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def decode_video_native(
    path: str,
    *,
    output_fps: float,
    output_size: int = 384,
    max_frames: int | None = None,
) -> tuple[np.ndarray, list[int]]:
    """Full-video decode with the media.decode_video return contract."""
    with NativeVideo(path) as v:
        total = math.floor(v.duration * output_fps) if v.duration > 0 else 1 << 20
        if max_frames is not None:
            total = min(total, max_frames)
        frames, idx = v.decode(output_fps=output_fps, output_size=output_size,
                               max_frames=total)
        return frames, idx
