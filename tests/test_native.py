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


def _smooth_frames(f, h, w, seed=0):
    """JPEG-friendly smooth test content (gradients + low-freq sines)."""
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(f):
        frames.append(np.stack([
            128 + 100 * np.sin(xx / 17.0 + i),
            128 + 100 * np.cos(yy / 13.0 + 0.5 * i),
            (xx + yy + 7 * i) % 256,
        ], axis=-1))
    return np.clip(np.stack(frames), 0, 255).astype(np.uint8)


def test_native_jpeg_decodes_with_pil(tmp_path):
    """The baseline JPEG encoder must produce spec-conformant files: an
    independent decoder (PIL) reads them back at high fidelity."""
    from vdpp_tpu.utils.native import write_jpeg_native

    frame = _smooth_frames(1, 96, 130)[0]  # odd-of-16 dims on purpose
    path = str(tmp_path / "f.jpg")
    if write_jpeg_native(path, frame, quality=90) is None:
        pytest.skip("native library unavailable")
    from PIL import Image

    dec = np.asarray(Image.open(path).convert("RGB"), np.float64)
    assert dec.shape == frame.shape
    mse = ((dec - frame.astype(np.float64)) ** 2).mean()
    psnr = 10 * np.log10(255.0 ** 2 / mse)
    assert psnr > 38.0, f"PSNR {psnr:.1f} dB too low for q90"


def test_native_avi_mjpeg_structure_and_frames(tmp_path):
    """RIFF/AVI structure: header chunks present, one 00dc JPEG per
    frame, idx1 index consistent — and every extracted JPEG decodes with
    PIL back to its source frame."""
    import io
    import struct

    from vdpp_tpu.utils.native import write_avi_mjpeg

    frames = _smooth_frames(3, 64, 80)
    path = str(tmp_path / "v.avi")
    if write_avi_mjpeg(path, frames, fps=7, quality=90) is None:
        pytest.skip("native library unavailable")
    data = open(path, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    assert b"MJPG" in data[:400] and b"vids" in data[:400]

    # walk the movi list for 00dc chunks
    movi = data.index(b"movi")
    pos = movi + 4
    jpegs = []
    while data[pos:pos + 4] == b"00dc":
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        jpegs.append(data[pos + 8:pos + 8 + size])
        pos += 8 + size + (size & 1)
    assert len(jpegs) == len(frames)
    assert data[pos:pos + 4] == b"idx1"
    n_idx = struct.unpack("<I", data[pos + 4:pos + 8])[0] // 16
    assert n_idx == len(frames)

    from PIL import Image

    for i, j in enumerate(jpegs):
        assert j[:2] == b"\xff\xd8" and j[-2:] == b"\xff\xd9"
        dec = np.asarray(Image.open(io.BytesIO(j)).convert("RGB"), np.float64)
        mse = ((dec - frames[i].astype(np.float64)) ** 2).mean()
        assert 10 * np.log10(255.0 ** 2 / mse) > 38.0


def test_native_mp4_structure_and_frames(tmp_path):
    """ISO BMFF structure: ftyp/mdat/moov box tree with consistent sizes,
    an esds declaring OTI 0x6C (JPEG), stsz/stco tables locating one
    sample per frame — and every located sample decodes with PIL back to
    its source frame."""
    import io
    import struct

    from vdpp_tpu.utils.native import write_mp4_mjpeg

    frames = _smooth_frames(4, 64, 80)
    path = str(tmp_path / "v.mp4")
    if write_mp4_mjpeg(path, frames, fps=7, quality=90) is None:
        pytest.skip("native library unavailable")
    data = open(path, "rb").read()

    # top-level box walk must tile the file exactly
    tops = {}
    pos = 0
    while pos < len(data):
        size, typ = struct.unpack(">I4s", data[pos:pos + 8])
        tops[typ] = (pos, size)
        pos += size
    assert pos == len(data)
    assert set(tops) == {b"ftyp", b"mdat", b"moov"}
    assert data[tops[b"ftyp"][0] + 8:tops[b"ftyp"][0] + 12] == b"isom"

    # esds: mp4v sample entry declares MJPEG via objectTypeIndication
    esds = data.index(b"esds")
    assert data[esds + 8:esds + 10] == b"\x03\x15"  # ES_Descriptor len 21
    assert data[esds + 13:esds + 16] == b"\x04\x0d\x6c"  # DCD, OTI 0x6C

    # sample tables locate one decodable JPEG per frame
    i = data.index(b"stsz")
    n = struct.unpack(">I", data[i + 12:i + 16])[0]
    sizes = struct.unpack(f">{n}I", data[i + 16:i + 16 + 4 * n])
    i = data.index(b"stco")
    n2 = struct.unpack(">I", data[i + 8:i + 12])[0]
    offsets = struct.unpack(f">{n2}I", data[i + 12:i + 12 + 4 * n2])
    assert n == n2 == len(frames)

    from PIL import Image

    for k in range(n):
        j = data[offsets[k]:offsets[k] + sizes[k]]
        assert j[:2] == b"\xff\xd8" and j[-2:] == b"\xff\xd9"
        dec = np.asarray(Image.open(io.BytesIO(j)).convert("RGB"), np.float64)
        mse = ((dec - frames[k].astype(np.float64)) ** 2).mean()
        assert 10 * np.log10(255.0 ** 2 / mse) > 38.0


def test_save_video_mp4_native_fallback_is_playable(tmp_path):
    """Without an ffmpeg backend, save_video_mp4 must still deliver a
    PLAYABLE compressed container — the native MJPEG-in-MP4 when the
    library is present (plus the lossless Y4M alongside), AVI next."""
    from vdpp_tpu.utils.video_io import save_video_mp4

    frames = _smooth_frames(2, 32, 48)
    out = save_video_mp4(frames, str(tmp_path / "v.mp4"), fps=7)
    assert os.path.exists(out)
    head = open(out, "rb").read(12)
    if out.endswith(".mp4") and head[4:8] == b"ftyp":  # native MP4 taken
        assert os.path.exists(str(tmp_path / "v.y4m"))
    elif out.endswith(".avi"):
        assert head[:4] == b"RIFF"
        assert os.path.exists(str(tmp_path / "v.y4m"))


def test_read_y4m_roundtrips_the_writer(tmp_path):
    """read_y4m inverts the native writer's BT.601/4:2:0 encode: gray
    content (chroma-neutral) survives within 1 LSB; smooth color within
    the 4:2:0 box-filter bound; header fps round-trips."""
    from vdpp_tpu.utils.video_io import read_y4m

    h, w = 32, 48
    yy, xx = np.mgrid[0:h, 0:w]
    g = ((yy * 255 / h + xx * 255 / w) / 2).astype(np.uint8)
    gray = np.stack([g, g, g], -1)
    color = np.stack([g, np.flipud(g), np.fliplr(g)], -1)
    frames = np.stack([gray, color])
    path = os.path.join(tmp_path, "rt.y4m")
    write_y4m(path, frames, fps=9)
    out, fps = read_y4m(path)
    assert fps == 9 and out.shape == frames.shape
    assert np.abs(out[0].astype(int) - gray.astype(int)).max() <= 1
    err = np.abs(out[1].astype(int) - color.astype(int))
    assert err.mean() < 4 and err.max() <= 16, (err.mean(), err.max())


def test_read_y4m_rejects_garbage(tmp_path):
    from vdpp_tpu.utils.video_io import read_y4m

    bad = os.path.join(tmp_path, "bad.y4m")
    with open(bad, "wb") as f:
        f.write(b"RIFFnot-a-y4m")
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        read_y4m(bad)
    trunc = os.path.join(tmp_path, "trunc.y4m")
    with open(trunc, "wb") as f:
        f.write(b"YUV4MPEG2 W4 H4 F7:1 Ip A1:1 C420jpeg\nFRAME\n\x00\x00")
    with pytest.raises(ValueError, match="truncated"):
        read_y4m(trunc)
    # 10/16-bit 4:2:0 variants carry 2 bytes/sample: a bare C420 prefix
    # match would read half a frame and fail later with a misleading
    # error — they must be rejected up front by exact colorspace name.
    deep = os.path.join(tmp_path, "deep.y4m")
    with open(deep, "wb") as f:
        f.write(b"YUV4MPEG2 W4 H4 F7:1 Ip A1:1 C420p10\nFRAME\n" + b"\x00" * 48)
    with pytest.raises(ValueError, match="8-bit"):
        read_y4m(deep)
