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


def read_y4m(path: str) -> tuple[np.ndarray, int]:
    """Read a YUV4MPEG2 4:2:0 file -> (uint8 RGB frames (F, H, W, 3), fps).

    The input leg of the native output leg (native/videopack.cpp writes
    ``C420jpeg`` via BT.601 studio-swing RGB->YUV with 2x2 box chroma);
    this reader inverts that conversion (nearest chroma upsample +
    inverse BT.601), accepting the common C420 siting variants. Feeds
    the video-to-video restyle app (scripts/restyle_video.py) — the
    reference has no video-input path at all.
    """
    with open(path, "rb") as f:
        header = f.readline().decode("ascii", "replace").strip()
        if not header.startswith("YUV4MPEG2"):
            raise ValueError(f"{path}: not a YUV4MPEG2 file ({header[:20]!r})")
        w = h = 0
        fps = 30
        colorspace = "C420jpeg"
        for tok in header.split()[1:]:
            if tok[0] == "W":
                w = int(tok[1:])
            elif tok[0] == "H":
                h = int(tok[1:])
            elif tok[0] == "F":
                num, den = tok[1:].split(":")
                fps = max(1, round(int(num) / max(int(den), 1)))
            elif tok[0] == "C":
                colorspace = tok
        if not w or not h:
            raise ValueError(f"{path}: header missing W/H: {header!r}")
        # Accept only the 8-bit 4:2:0 siting variants: a bare startswith
        # check would pass C420p10/C420p16 (2 bytes/sample) and then
        # miscompute frame_bytes as 8-bit, failing mid-file with a
        # misleading "bad frame marker" (or yielding garbage frames).
        if colorspace not in ("C420", "C420jpeg", "C420mpeg2", "C420paldv"):
            raise ValueError(
                f"{path}: only 8-bit 4:2:0 colorspaces supported "
                f"(C420/C420jpeg/C420mpeg2/C420paldv), got {colorspace}"
            )
        ch, cw = h // 2, w // 2
        frame_bytes = h * w + 2 * ch * cw
        frames = []
        while True:
            line = f.readline()
            if not line:
                break
            if not line.startswith(b"FRAME"):
                raise ValueError(f"{path}: bad frame marker {line[:20]!r}")
            raw = f.read(frame_bytes)
            if len(raw) != frame_bytes:
                raise ValueError(f"{path}: truncated frame {len(frames)}")
            planes = np.frombuffer(raw, np.uint8)
            y = planes[: h * w].reshape(h, w).astype(np.float32)
            u = planes[h * w: h * w + ch * cw].reshape(ch, cw).astype(np.float32)
            v = planes[h * w + ch * cw:].reshape(ch, cw).astype(np.float32)
            # Nearest 2x upsample of the box-averaged chroma.
            u = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)
            v = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)
            # Inverse BT.601 studio swing (videopack.cpp:rgb_to_yuv).
            yp = (y - 16.0) * 1.164
            up, vp = u - 128.0, v - 128.0
            r = yp + 1.596 * vp
            g = yp - 0.813 * vp - 0.391 * up
            b = yp + 2.018 * up
            rgb = np.stack([r, g, b], axis=-1)
            frames.append(np.clip(rgb + 0.5, 0.0, 255.0).astype(np.uint8))
    if not frames:
        raise ValueError(f"{path}: no frames")
    return np.stack(frames), fps


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
