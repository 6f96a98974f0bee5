"""ctypes bindings for the native videopack library.

Builds ``native/libvideopack.so`` on first use if a compiler is present
(cached thereafter); every entry point has a numpy fallback so the
framework stays functional without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

LOGGER = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvideopack.so")

_lib = None
_lib_tried = False


def _load() -> ctypes.CDLL | None:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "videopack.cpp")
        if os.path.exists(src):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR], check=True,
                    capture_output=True, timeout=120,
                )
            except Exception as e:  # no toolchain — numpy fallback
                LOGGER.debug("native build unavailable: %s", e)
                return None
    if os.path.exists(_LIB_PATH):
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.vdpp_rgb_to_yuv420.restype = ctypes.c_int
            lib.vdpp_rgb_to_yuv420.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.vdpp_write_y4m.restype = ctypes.c_int
            lib.vdpp_write_y4m.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
            ]
            if hasattr(lib, "vdpp_write_gif"):  # older cached builds lack it
                lib.vdpp_write_gif.restype = ctypes.c_int
                lib.vdpp_write_gif.argtypes = [
                    ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ]
            if hasattr(lib, "vdpp_write_avi_mjpeg"):
                lib.vdpp_write_avi_mjpeg.restype = ctypes.c_int
                lib.vdpp_write_avi_mjpeg.argtypes = [
                    ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ]
            if hasattr(lib, "vdpp_write_mp4_mjpeg"):
                lib.vdpp_write_mp4_mjpeg.restype = ctypes.c_int
                lib.vdpp_write_mp4_mjpeg.argtypes = [
                    ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ]
            if hasattr(lib, "vdpp_write_jpeg"):
                lib.vdpp_write_jpeg.restype = ctypes.c_int
                lib.vdpp_write_jpeg.argtypes = [
                    ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ]
            _lib = lib
        except OSError as e:
            LOGGER.debug("native load failed: %s", e)
    return _lib


def native_available() -> bool:
    return _load() is not None


def _rgb_to_yuv420_numpy(frame: np.ndarray) -> np.ndarray:
    """BT.601 studio-swing RGB888 -> planar YUV420 (numpy fallback)."""
    h, w, _ = frame.shape
    f = frame.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 16.0 + 0.257 * r + 0.504 * g + 0.098 * b
    u = 128.0 - 0.148 * r - 0.291 * g + 0.439 * b
    v = 128.0 + 0.439 * r - 0.368 * g - 0.071 * b
    u = u.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    v = v.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    out = np.concatenate(
        [np.clip(y + 0.5, 0, 255).astype(np.uint8).ravel(),
         np.clip(u + 0.5, 0, 255).astype(np.uint8).ravel(),
         np.clip(v + 0.5, 0, 255).astype(np.uint8).ravel()]
    )
    return out


def write_gif_native(path: str, frames_uint8: np.ndarray, fps: int = 7) -> str | None:
    """Write (F, H, W, 3) uint8 frames as an animated GIF via the native
    encoder (median-cut palette + parallel LZW). Returns None when the
    native library is unavailable (caller falls back to imageio)."""
    lib = _load()
    if lib is None or not hasattr(lib, "vdpp_write_gif"):
        return None
    frames_uint8 = np.ascontiguousarray(frames_uint8, np.uint8)
    f, h, w, _ = frames_uint8.shape
    rc = lib.vdpp_write_gif(
        path.encode(),
        frames_uint8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        f, h, w, int(fps),
    )
    if rc != 0:
        LOGGER.warning("native gif writer failed rc=%d; imageio fallback", rc)
        return None
    return path


def write_avi_mjpeg(
    path: str, frames_uint8: np.ndarray, fps: int = 7, quality: int = 90
) -> str | None:
    """Write (F, H, W, 3) uint8 frames as a PLAYABLE compressed video:
    baseline JFIF JPEGs (encoded in parallel C++ threads) in a RIFF AVI
    'MJPG' stream — decodable by VLC/mpv/ffmpeg/browsers with no
    external dependency. The dependency-free stand-in for the
    reference's imageio/ffmpeg MP4 leg
    (reference: scripts/generate_video_demo.py:425-443). Returns None
    when the native library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "vdpp_write_avi_mjpeg"):
        return None
    frames_uint8 = np.ascontiguousarray(frames_uint8, np.uint8)
    f, h, w, _ = frames_uint8.shape
    rc = lib.vdpp_write_avi_mjpeg(
        path.encode(),
        frames_uint8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        f, h, w, int(fps), 1, int(quality),
    )
    if rc != 0:
        LOGGER.warning("native avi writer failed rc=%d", rc)
        return None
    return path


def write_mp4_mjpeg(
    path: str, frames_uint8: np.ndarray, fps: int = 7, quality: int = 90
) -> str | None:
    """Write (F, H, W, 3) uint8 frames as a true ISO BMFF ``.mp4``: one
    all-keyframe MJPEG track (esds objectTypeIndication 0x6C = ISO/IEC
    10918-1 JPEG) whose samples are baseline JFIF JPEGs encoded in
    parallel C++ threads — ffmpeg/mpv/VLC decode it natively. Completes
    the reference's literal MP4 output leg
    (reference: scripts/generate_video_demo.py:425-443) with zero
    Python-side dependencies. Returns None when the native library is
    unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "vdpp_write_mp4_mjpeg"):
        return None
    frames_uint8 = np.ascontiguousarray(frames_uint8, np.uint8)
    f, h, w, _ = frames_uint8.shape
    rc = lib.vdpp_write_mp4_mjpeg(
        path.encode(),
        frames_uint8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        f, h, w, int(fps), 1, int(quality),
    )
    if rc != 0:
        LOGGER.warning("native mp4 writer failed rc=%d", rc)
        return None
    return path


def write_jpeg_native(
    path: str, frame_uint8: np.ndarray, quality: int = 90
) -> str | None:
    """Write one (H, W, 3) uint8 frame as a baseline JPEG. Returns None
    when the native library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "vdpp_write_jpeg"):
        return None
    frame_uint8 = np.ascontiguousarray(frame_uint8, np.uint8)
    h, w, _ = frame_uint8.shape
    rc = lib.vdpp_write_jpeg(
        path.encode(),
        frame_uint8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, int(quality),
    )
    return path if rc == 0 else None


def write_y4m(path: str, frames_uint8: np.ndarray, fps: int = 7) -> str:
    """Write (F, H, W, 3) uint8 frames as YUV4MPEG2.

    Uses the threaded C++ path when available; numpy otherwise.
    """
    frames_uint8 = np.ascontiguousarray(frames_uint8, np.uint8)
    f, h, w, _ = frames_uint8.shape
    if h % 2 or w % 2:
        frames_uint8 = frames_uint8[:, : h - h % 2, : w - w % 2]
        f, h, w, _ = frames_uint8.shape
    lib = _load()
    if lib is not None:
        rc = lib.vdpp_write_y4m(
            path.encode(),
            frames_uint8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            f, h, w, int(fps), 1,
        )
        if rc == 0:
            return path
        LOGGER.warning("native y4m writer failed rc=%d; numpy fallback", rc)
    with open(path, "wb") as fp:
        fp.write(f"YUV4MPEG2 W{w} H{h} F{int(fps)}:1 Ip A1:1 C420jpeg\n".encode())
        for i in range(f):
            fp.write(b"FRAME\n")
            fp.write(_rgb_to_yuv420_numpy(frames_uint8[i]).tobytes())
    return path
