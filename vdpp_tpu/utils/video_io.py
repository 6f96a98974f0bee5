"""Video/image output: MP4 + GIF with self-describing filenames.

Counterpart of the reference's imageio-based savers with metadata-rich
names (reference: scripts/generate_video_demo.py:198-222, 425-443).
"""

from __future__ import annotations

import logging
import os
from datetime import datetime

import numpy as np

LOGGER = logging.getLogger(__name__)


def frames_to_uint8(video: np.ndarray) -> np.ndarray:
    """(F, H, W, 3) float in [-1, 1] -> uint8 [0, 255]."""
    video = np.asarray(video, np.float32)
    video = (video / 2.0 + 0.5).clip(0.0, 1.0)
    return (video * 255.0 + 0.5).astype(np.uint8)


def build_output_name(
    prefix: str,
    *,
    num_frames: int,
    steps: int,
    stages: int,
    fps: int,
    seed: int,
    ext: str,
) -> str:
    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    return f"{prefix}_{ts}_f{num_frames}_s{steps}_st{stages}_fps{fps}_seed{seed}.{ext}"


def _try_write_y4m(path: str, frames_uint8: np.ndarray, fps: int) -> str | None:
    """Best-effort lossless Y4M next to ``path``; None on failure."""
    try:
        from vdpp_tpu.utils.native import write_y4m

        y4m_path = os.path.splitext(path)[0] + ".y4m"
        write_y4m(y4m_path, frames_uint8, fps=fps)
        LOGGER.info("wrote %s (%d frames)", y4m_path, len(frames_uint8))
        return y4m_path
    except Exception as e:
        LOGGER.warning("y4m write failed: %s", e)
        return None


def save_video_mp4(frames_uint8: np.ndarray, path: str, fps: int = 7) -> str:
    """Write (F, H, W, 3) uint8 frames as the best available PLAYABLE
    container: H.264 MP4 when an ffmpeg backend exists; else a native
    MJPEG-in-MP4 (ISO BMFF, C++ baseline-JPEG samples — a real ``.mp4``,
    no dependencies) plus a lossless Y4M alongside; else MJPEG-AVI; else
    Y4M; else GIF."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import imageio.v3 as iio

        iio.imwrite(path, frames_uint8, fps=fps, extension=".mp4")
        LOGGER.info("wrote %s (%d frames)", path, len(frames_uint8))
        return path
    except Exception as e:  # pragma: no cover - backend-dependent
        LOGGER.warning("mp4 write failed (%s); native fallback", e)
        from vdpp_tpu.utils.native import write_avi_mjpeg, write_mp4_mjpeg

        if write_mp4_mjpeg(path, frames_uint8, fps=fps):
            LOGGER.info(
                "wrote %s (%d frames, native MJPEG-in-MP4)", path,
                len(frames_uint8),
            )
            # keep the LOSSLESS leg alongside the playable one (JPEG is
            # lossy; y4m converts losslessly to mp4 on any ffmpeg host)
            _try_write_y4m(path, frames_uint8, fps)
            return path
        avi_path = os.path.splitext(path)[0] + ".avi"
        if write_avi_mjpeg(avi_path, frames_uint8, fps=fps):
            LOGGER.info(
                "wrote %s (%d frames, native MJPEG)", avi_path,
                len(frames_uint8),
            )
            _try_write_y4m(path, frames_uint8, fps)
            return avi_path
        y4m_path = _try_write_y4m(path, frames_uint8, fps)
        if y4m_path:
            return y4m_path
        gif_path = os.path.splitext(path)[0] + ".gif"
        return save_video_gif(frames_uint8, gif_path, fps=fps)


def save_video_gif(frames_uint8: np.ndarray, path: str, fps: int = 7) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    from vdpp_tpu.utils.native import write_gif_native

    if write_gif_native(path, frames_uint8, fps=fps):
        LOGGER.info("wrote %s (%d frames, native encoder)", path, len(frames_uint8))
        return path
    import imageio.v3 as iio

    iio.imwrite(path, frames_uint8, duration=int(1000 / fps), loop=0)
    LOGGER.info("wrote %s (%d frames)", path, len(frames_uint8))
    return path


def save_image_png(image_uint8: np.ndarray, path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    import imageio.v3 as iio

    iio.imwrite(path, image_uint8)
    return path
