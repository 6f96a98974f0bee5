"""Native videopack tests: C++ path vs numpy reference, y4m structure."""

import ctypes
import os

import numpy as np
import pytest

from vdpp_tpu.utils import native
from vdpp_tpu.utils.native import _rgb_to_yuv420_numpy, write_y4m


def test_numpy_yuv_conversion_known_values():
    # Pure gray 128: Y = 16 + 0.859*128 ~= 125.9; U = V = 128.
    frame = np.full((4, 4, 3), 128, np.uint8)
    out = _rgb_to_yuv420_numpy(frame)
    y, u, v = out[:16], out[16:20], out[20:24]
    assert abs(int(y[0]) - 126) <= 1
    assert np.all(u == 128) and np.all(v == 128)


def test_write_y4m_structure(tmp_path):
    frames = (np.random.default_rng(0).random((3, 8, 10, 3)) * 255).astype(np.uint8)
    path = os.path.join(tmp_path, "out.y4m")
    write_y4m(path, frames, fps=7)
    data = open(path, "rb").read()
    assert data.startswith(b"YUV4MPEG2 W10 H8 F7:1")
    # 3 FRAME markers, each followed by 8*10*1.5 bytes.
    assert data.count(b"FRAME\n") == 3
    header_end = data.index(b"\n") + 1
    frame_size = 8 * 10 + 2 * (4 * 5)
    assert len(data) == header_end + 3 * (len(b"FRAME\n") + frame_size)


@pytest.mark.skipif(not native.native_available(), reason="no native toolchain")
def test_native_matches_numpy():
    rng = np.random.default_rng(1)
    frame = (rng.random((16, 20, 3)) * 255).astype(np.uint8)
    lib = native._load()
    out = np.empty(16 * 20 + 2 * 8 * 10, np.uint8)
    rc = lib.vdpp_rgb_to_yuv420(
        np.ascontiguousarray(frame).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)
        ),
        16, 20,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    assert rc == 0
    ref = _rgb_to_yuv420_numpy(frame)
    # float rounding path differs by at most 1 LSB
    assert np.max(np.abs(out.astype(int) - ref.astype(int))) <= 1


def test_odd_dims_cropped(tmp_path):
    frames = np.zeros((2, 7, 9, 3), np.uint8)
    path = os.path.join(tmp_path, "odd.y4m")
    write_y4m(path, frames, fps=5)
    assert open(path, "rb").read().startswith(b"YUV4MPEG2 W8 H6")


@pytest.mark.skipif(not native.native_available(), reason="no native toolchain")
def test_native_gif_roundtrip(tmp_path):
    """The native GIF89a encoder's output decodes with PIL (independent
    decoder) frame-for-frame, within palette-quantization error."""
    from PIL import Image, ImageSequence

    from vdpp_tpu.utils.native import write_gif_native

    rng = np.random.default_rng(3)
    f, h, w = 5, 32, 48
    frames = (rng.random((f, h, w, 3)) * 255).astype(np.uint8)
    # structured content so palette quality matters
    frames[:, 8:16, 8:24] = [250, 30, 90]
    path = os.path.join(tmp_path, "anim.gif")
    assert write_gif_native(path, frames, fps=10) == path

    im = Image.open(path)
    decoded = [
        np.asarray(fr.convert("RGB")) for fr in ImageSequence.Iterator(im)
    ]
    assert len(decoded) == f
    assert decoded[0].shape == (h, w, 3)
    err = np.abs(np.stack(decoded).astype(int) - frames.astype(int)).mean()
    assert err < 20, err  # random noise quantizes worst-case; bounded
