// videopack — native video packing for vdpp-tpu.
//
// The reference's video output path leans on imageio+ffmpeg CUDA-side
// (reference: scripts/generate_video_demo.py:198-222, saves MP4+GIF).
// On TPU hosts without an ffmpeg backend this library provides
// dependency-free output formats:
//   * threaded RGB -> YUV420 (BT.601) conversion and a YUV4MPEG2 (.y4m)
//     container writer — playable by mpv/vlc/ffmpeg and losslessly
//     convertible to mp4;
//   * an animated GIF89a encoder (median-cut adaptive palette + LZW,
//     frames quantized and compressed in parallel) — the GIF leg of the
//     reference's MP4+GIF output contract, ~an order of magnitude faster
//     than the Python imageio path on multi-core hosts.
//
// Built as a small shared library, bound from Python via ctypes
// (vdpp_tpu/utils/native.py); a numpy/imageio fallback exists when the
// library is unavailable.

#include <array>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

inline uint8_t clamp_u8(float v) {
    return static_cast<uint8_t>(std::min(255.0f, std::max(0.0f, v + 0.5f)));
}

// BT.601 "studio swing" RGB -> YUV, the YUV4MPEG2 default.
inline void rgb_to_yuv(float r, float g, float b, float* y, float* u, float* v) {
    *y = 16.0f + 0.257f * r + 0.504f * g + 0.098f * b;
    *u = 128.0f - 0.148f * r - 0.291f * g + 0.439f * b;
    *v = 128.0f + 0.439f * r - 0.368f * g - 0.071f * b;
}

void convert_rows(const uint8_t* rgb, int h, int w, int row_begin, int row_end,
                  uint8_t* yp, float* usum, float* vsum) {
    for (int row = row_begin; row < row_end; ++row) {
        const uint8_t* src = rgb + static_cast<size_t>(row) * w * 3;
        uint8_t* ydst = yp + static_cast<size_t>(row) * w;
        const int cw = w / 2;
        float* urow = usum + static_cast<size_t>(row / 2) * cw;
        float* vrow = vsum + static_cast<size_t>(row / 2) * cw;
        for (int col = 0; col < w; ++col) {
            float y, u, v;
            rgb_to_yuv(src[col * 3], src[col * 3 + 1], src[col * 3 + 2], &y, &u, &v);
            ydst[col] = clamp_u8(y);
            // 2x2 box accumulate for 4:2:0 chroma (each contributes 1/4).
            urow[col / 2] += 0.25f * u;
            vrow[col / 2] += 0.25f * v;
        }
    }
}

}  // namespace

extern "C" {

// Convert one RGB888 frame (h*w*3) to planar YUV420 (y: h*w, u/v: h/2*w/2).
// h and w must be even. Threaded across rows. Returns 0 on success.
int vdpp_rgb_to_yuv420(const uint8_t* rgb, int h, int w, uint8_t* out) {
    if (h % 2 || w % 2) return 1;
    const int ch = h / 2, cw = w / 2;
    uint8_t* yp = out;
    uint8_t* up = out + static_cast<size_t>(h) * w;
    uint8_t* vp = up + static_cast<size_t>(ch) * cw;

    std::vector<float> usum(static_cast<size_t>(ch) * cw, 0.0f);
    std::vector<float> vsum(static_cast<size_t>(ch) * cw, 0.0f);

    unsigned n_threads = std::max(1u, std::thread::hardware_concurrency());
    n_threads = std::min<unsigned>(n_threads, 16);
    // Chroma rows are shared between two luma rows; split on even rows.
    std::vector<std::thread> threads;
    int rows_per = ((h / 2) + n_threads - 1) / n_threads * 2;
    for (unsigned t = 0; t < n_threads; ++t) {
        int begin = static_cast<int>(t) * rows_per;
        int end = std::min(h, begin + rows_per);
        if (begin >= end) break;
        threads.emplace_back(convert_rows, rgb, h, w, begin, end, yp,
                             usum.data(), vsum.data());
    }
    for (auto& th : threads) th.join();

    for (size_t i = 0; i < usum.size(); ++i) up[i] = clamp_u8(usum[i]);
    for (size_t i = 0; i < vsum.size(); ++i) vp[i] = clamp_u8(vsum[i]);
    return 0;
}

// Write an entire video (f frames of RGB888) as a YUV4MPEG2 file.
// Returns 0 on success, negative on IO error, positive on bad args.
int vdpp_write_y4m(const char* path, const uint8_t* rgb, int f, int h, int w,
                   int fps_num, int fps_den) {
    if (h % 2 || w % 2 || f <= 0) return 1;
    FILE* fp = std::fopen(path, "wb");
    if (!fp) return -1;
    std::fprintf(fp, "YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420jpeg\n", w, h,
                 fps_num, fps_den);
    const size_t ysz = static_cast<size_t>(h) * w;
    const size_t csz = ysz / 4;
    std::vector<uint8_t> buf(ysz + 2 * csz);
    for (int i = 0; i < f; ++i) {
        if (vdpp_rgb_to_yuv420(rgb + static_cast<size_t>(i) * ysz * 3, h, w,
                               buf.data()) != 0) {
            std::fclose(fp);
            return 2;
        }
        std::fprintf(fp, "FRAME\n");
        if (std::fwrite(buf.data(), 1, buf.size(), fp) != buf.size()) {
            std::fclose(fp);
            return -2;
        }
    }
    std::fclose(fp);
    return 0;
}

}  // extern "C"

// ------------------------- GIF89a encoder --------------------------- //

namespace gif {

// Median-cut palette over subsampled pixels: split the box with the
// widest channel range at its median until 256 boxes remain; palette
// entry = box mean.
void median_cut_palette(const uint8_t* rgb, size_t n_px, size_t stride_px,
                        uint8_t palette[256][3]) {
    std::vector<std::array<uint8_t, 3>> samples;
    samples.reserve(n_px / stride_px + 1);
    for (size_t i = 0; i < n_px; i += stride_px) {
        const uint8_t* p = rgb + i * 3;
        samples.push_back({p[0], p[1], p[2]});
    }
    // Each box caches its widest channel range: a split creates exactly
    // two new boxes, so only those are re-scanned — without the cache
    // every one of the 255 split iterations re-scanned ALL samples in
    // ALL boxes (~255 full passes over the subsampled image).
    struct Box { size_t begin, end; int range, ch; };
    auto compute_stats = [&](Box& bx) {
        bx.range = 0;
        bx.ch = 0;
        if (bx.end - bx.begin < 2) return;  // unsplittable
        int lo[3] = {255, 255, 255}, hi[3] = {0, 0, 0};
        for (size_t i = bx.begin; i < bx.end; ++i)
            for (int c = 0; c < 3; ++c) {
                lo[c] = std::min<int>(lo[c], samples[i][c]);
                hi[c] = std::max<int>(hi[c], samples[i][c]);
            }
        for (int c = 0; c < 3; ++c)
            if (hi[c] - lo[c] > bx.range) {
                bx.range = hi[c] - lo[c];
                bx.ch = c;
            }
    };
    std::vector<Box> boxes{{0, samples.size(), 0, 0}};
    compute_stats(boxes[0]);
    while (boxes.size() < 256) {
        // pick the box with the widest cached channel range
        int best = -1, best_range = 0;
        for (size_t b = 0; b < boxes.size(); ++b)
            if (boxes[b].range > best_range) {
                best_range = boxes[b].range;
                best = static_cast<int>(b);
            }
        if (best < 0) break;  // nothing splittable
        Box bx = boxes[best];
        int best_ch = bx.ch;
        size_t mid = (bx.begin + bx.end) / 2;
        std::nth_element(
            samples.begin() + bx.begin, samples.begin() + mid,
            samples.begin() + bx.end,
            [best_ch](const std::array<uint8_t, 3>& a,
                      const std::array<uint8_t, 3>& b) {
                return a[best_ch] < b[best_ch];
            });
        Box left{bx.begin, mid, 0, 0}, right{mid, bx.end, 0, 0};
        compute_stats(left);
        compute_stats(right);
        boxes[best] = left;
        boxes.push_back(right);
    }
    for (size_t b = 0; b < 256; ++b) {
        if (b < boxes.size() && boxes[b].end > boxes[b].begin) {
            uint64_t s[3] = {0, 0, 0};
            for (size_t i = boxes[b].begin; i < boxes[b].end; ++i)
                for (int c = 0; c < 3; ++c) s[c] += samples[i][c];
            size_t n = boxes[b].end - boxes[b].begin;
            for (int c = 0; c < 3; ++c)
                palette[b][c] = static_cast<uint8_t>(s[c] / n);
        } else {
            palette[b][0] = palette[b][1] = palette[b][2] = 0;
        }
    }
}

// 5-bit/channel nearest-palette lookup cube (32768 cells).
void build_lookup(const uint8_t palette[256][3], uint8_t* cube) {
    for (int r = 0; r < 32; ++r)
        for (int g = 0; g < 32; ++g)
            for (int b = 0; b < 32; ++b) {
                int rc = r * 8 + 4, gc = g * 8 + 4, bc = b * 8 + 4;
                int best = 0, best_d = 1 << 30;
                for (int p = 0; p < 256; ++p) {
                    int dr = rc - palette[p][0], dg = gc - palette[p][1],
                        db = bc - palette[p][2];
                    int d = dr * dr + dg * dg + db * db;
                    if (d < best_d) { best_d = d; best = p; }
                }
                cube[(r << 10) | (g << 5) | b] = static_cast<uint8_t>(best);
            }
}

// LZW-compress one frame of palette indices into GIF sub-block format.
void lzw_frame(const uint8_t* idx, size_t n, std::vector<uint8_t>& out) {
    constexpr int kMinCode = 8;              // 256-color table
    constexpr int kClear = 1 << kMinCode;    // 256
    constexpr int kEoi = kClear + 1;         // 257
    std::vector<int16_t> table(4096 * 256);

    uint32_t bitbuf = 0;
    int bitcnt = 0;
    std::vector<uint8_t> bytes;
    bytes.reserve(n / 2);
    int code_width = kMinCode + 1;
    auto emit = [&](int code) {
        bitbuf |= static_cast<uint32_t>(code) << bitcnt;
        bitcnt += code_width;
        while (bitcnt >= 8) {
            bytes.push_back(static_cast<uint8_t>(bitbuf & 0xFF));
            bitbuf >>= 8;
            bitcnt -= 8;
        }
    };

    std::fill(table.begin(), table.end(), -1);
    int next_code = kEoi + 1;
    emit(kClear);
    int prefix = idx[0];
    for (size_t i = 1; i < n; ++i) {
        int sym = idx[i];
        int32_t key = prefix * 256 + sym;
        if (table[key] >= 0) {
            prefix = table[key];
            continue;
        }
        emit(prefix);
        table[key] = static_cast<int16_t>(next_code++);
        // Decoder pairing: the decoder (one entry behind) bumps its code
        // size after its slot counter reaches 1<<width, which is the
        // stream position where our just-assigned code == 1<<width.
        if (next_code - 1 == (1 << code_width) && code_width < 12)
            ++code_width;
        if (next_code >= 4096) {
            emit(kClear);
            std::fill(table.begin(), table.end(), -1);
            next_code = kEoi + 1;
            code_width = kMinCode + 1;
        }
        prefix = sym;
    }
    emit(prefix);
    emit(kEoi);
    if (bitcnt > 0) bytes.push_back(static_cast<uint8_t>(bitbuf & 0xFF));

    // chunk into <=255-byte sub-blocks
    out.push_back(kMinCode);
    size_t pos = 0;
    while (pos < bytes.size()) {
        size_t len = std::min<size_t>(255, bytes.size() - pos);
        out.push_back(static_cast<uint8_t>(len));
        out.insert(out.end(), bytes.begin() + pos, bytes.begin() + pos + len);
        pos += len;
    }
    out.push_back(0);  // block terminator
}

void put_u16(std::vector<uint8_t>& v, uint16_t x) {
    v.push_back(x & 0xFF);
    v.push_back(x >> 8);
}

}  // namespace gif

extern "C" {

// Write an animated GIF89a (f frames of RGB888, looped). Adaptive
// 256-color median-cut palette shared across frames; per-frame
// quantization + LZW run in parallel. Returns 0 on success.
int vdpp_write_gif(const char* path, const uint8_t* rgb, int f, int h, int w,
                   int fps) {
    if (f <= 0 || h <= 0 || w <= 0) return 1;
    const size_t frame_px = static_cast<size_t>(h) * w;
    const size_t total_px = frame_px * f;

    uint8_t palette[256][3];
    // subsample to ~1M pixels for the palette build
    size_t stride = std::max<size_t>(1, total_px / (1 << 20));
    gif::median_cut_palette(rgb, total_px, stride, palette);
    std::vector<uint8_t> cube(32 * 32 * 32);
    gif::build_lookup(palette, cube.data());

    // quantize + LZW each frame in parallel
    std::vector<std::vector<uint8_t>> frame_data(f);
    unsigned n_threads = std::min<unsigned>(
        std::max(1u, std::thread::hardware_concurrency()), 16);
    std::vector<std::thread> threads;
    for (unsigned t = 0; t < n_threads; ++t) {
        threads.emplace_back([&, t]() {
            std::vector<uint8_t> idx(frame_px);
            for (int i = static_cast<int>(t); i < f;
                 i += static_cast<int>(n_threads)) {
                const uint8_t* src = rgb + static_cast<size_t>(i) * frame_px * 3;
                for (size_t p = 0; p < frame_px; ++p) {
                    int r = src[p * 3] >> 3, g = src[p * 3 + 1] >> 3,
                        b = src[p * 3 + 2] >> 3;
                    idx[p] = cube[(r << 10) | (g << 5) | b];
                }
                gif::lzw_frame(idx.data(), frame_px, frame_data[i]);
            }
        });
    }
    for (auto& th : threads) th.join();

    // assemble the container
    std::vector<uint8_t> out;
    out.reserve(total_px / 2);
    const char* hdr = "GIF89a";
    out.insert(out.end(), hdr, hdr + 6);
    gif::put_u16(out, static_cast<uint16_t>(w));
    gif::put_u16(out, static_cast<uint16_t>(h));
    out.push_back(0xF7);  // global table, 8-bit, 256 entries
    out.push_back(0);     // background
    out.push_back(0);     // aspect
    for (auto& entry : palette)
        out.insert(out.end(), entry, entry + 3);
    // NETSCAPE2.0 infinite loop
    const uint8_t loop_ext[] = {0x21, 0xFF, 0x0B, 'N', 'E', 'T', 'S', 'C',
                                'A',  'P',  'E',  '2', '.', '0', 0x03, 0x01,
                                0x00, 0x00, 0x00};
    out.insert(out.end(), loop_ext, loop_ext + sizeof(loop_ext));

    uint16_t delay_cs = static_cast<uint16_t>(fps > 0 ? 100 / fps : 10);
    for (int i = 0; i < f; ++i) {
        const uint8_t gce[] = {0x21, 0xF9, 0x04, 0x04,
                               static_cast<uint8_t>(delay_cs & 0xFF),
                               static_cast<uint8_t>(delay_cs >> 8), 0x00, 0x00};
        out.insert(out.end(), gce, gce + sizeof(gce));
        out.push_back(0x2C);  // image descriptor
        gif::put_u16(out, 0);
        gif::put_u16(out, 0);
        gif::put_u16(out, static_cast<uint16_t>(w));
        gif::put_u16(out, static_cast<uint16_t>(h));
        out.push_back(0x00);  // no local table
        out.insert(out.end(), frame_data[i].begin(), frame_data[i].end());
    }
    out.push_back(0x3B);  // trailer

    FILE* fp = std::fopen(path, "wb");
    if (!fp) return -1;
    size_t written = std::fwrite(out.data(), 1, out.size(), fp);
    std::fclose(fp);
    return written == out.size() ? 0 : -2;
}

}  // extern "C"

// ------------------ baseline JPEG encoder + MJPEG AVI ---------------- //
//
// Closes the reference's MP4 output leg (scripts/generate_video_demo.py
// saves MP4 via imageio/ffmpeg) with a dependency-free PLAYABLE
// compressed container: baseline JFIF JPEG (Annex K tables, 4:2:0) per
// frame inside a RIFF AVI 'MJPG' stream — decoded by VLC/mpv/ffmpeg/
// browsers everywhere. Frames encode in parallel threads.

namespace jpg {

const uint8_t kZigzag[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

const uint8_t kQLum[64] = {
    16, 11, 10, 16, 24,  40,  51,  61,  12, 12, 14, 19, 26,  58,  60,  55,
    14, 13, 16, 24, 40,  57,  69,  56,  14, 17, 22, 29, 51,  87,  80,  62,
    18, 22, 37, 56, 68,  109, 103, 77,  24, 35, 55, 64, 81,  104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99};

const uint8_t kQChr[64] = {
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99};

// Annex K Huffman specifications: {BITS[16]} + HUFFVAL.
const uint8_t kDcLumBits[16] = {0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0};
const uint8_t kDcVals[12] = {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11};
const uint8_t kDcChrBits[16] = {0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0};

const uint8_t kAcLumBits[16] = {0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d};
const uint8_t kAcLumVals[162] = {
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa};

const uint8_t kAcChrBits[16] = {0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77};
const uint8_t kAcChrVals[162] = {
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa};

struct Huff {
    uint16_t code[256];
    uint8_t len[256];
};

Huff build_huff(const uint8_t bits[16], const uint8_t* vals) {
    Huff h{};
    int code = 0, k = 0;
    for (int l = 1; l <= 16; ++l) {
        for (int i = 0; i < bits[l - 1]; ++i) {
            h.code[vals[k]] = static_cast<uint16_t>(code);
            h.len[vals[k]] = static_cast<uint8_t>(l);
            ++code;
            ++k;
        }
        code <<= 1;
    }
    return h;
}

struct BitWriter {
    std::vector<uint8_t>& out;
    uint32_t acc = 0;
    int nbits = 0;
    explicit BitWriter(std::vector<uint8_t>& o) : out(o) {}
    void put(uint32_t code, int n) {
        acc = (acc << n) | (code & ((1u << n) - 1));
        nbits += n;
        while (nbits >= 8) {
            uint8_t b = static_cast<uint8_t>(acc >> (nbits - 8));
            out.push_back(b);
            if (b == 0xFF) out.push_back(0x00);  // byte stuffing
            nbits -= 8;
        }
    }
    void flush() {  // pad with 1s per the spec
        if (nbits > 0) {
            uint8_t b = static_cast<uint8_t>(
                (acc << (8 - nbits)) | ((1u << (8 - nbits)) - 1));
            out.push_back(b);
            if (b == 0xFF) out.push_back(0x00);
            nbits = 0;
        }
        acc = 0;
    }
};

struct DctTable {
    float a[8][8];
    DctTable() {
        for (int u = 0; u < 8; ++u)
            for (int x = 0; x < 8; ++x)
                a[u][x] = 0.5f *
                          (u == 0 ? 0.70710678f : 1.0f) *
                          std::cos((2 * x + 1) * u * 3.14159265358979f / 16.0f);
    }
};

void fdct8x8(const float in[64], float out[64]) {
    // C++11 magic static: thread-safe init (frames encode in parallel;
    // a hand-rolled lazy-init bool would race)
    static const DctTable tbl;
    const auto& a = tbl.a;
    float tmp[64];
    for (int u = 0; u < 8; ++u)
        for (int x = 0; x < 8; ++x) {
            float s = 0;
            for (int k = 0; k < 8; ++k) s += a[u][k] * in[x * 8 + k];
            tmp[x * 8 + u] = s;  // row DCT
        }
    for (int v = 0; v < 8; ++v)
        for (int u = 0; u < 8; ++u) {
            float s = 0;
            for (int k = 0; k < 8; ++k) s += a[v][k] * tmp[k * 8 + u];
            out[v * 8 + u] = s;
        }
}

inline int bitcat(int v) {
    int a = v < 0 ? -v : v, n = 0;
    while (a) { a >>= 1; ++n; }
    return n;
}

void encode_block(BitWriter& bw, const float blk[64], const uint8_t qt[64],
                  const Huff& dc, const Huff& ac, int& pred) {
    float coef[64];
    fdct8x8(blk, coef);
    int z[64];
    for (int i = 0; i < 64; ++i) {
        float q = coef[kZigzag[i]] / qt[kZigzag[i]];
        z[i] = static_cast<int>(q < 0 ? q - 0.5f : q + 0.5f);
    }
    int diff = z[0] - pred;
    pred = z[0];
    int c = bitcat(diff);
    bw.put(dc.code[c], dc.len[c]);
    if (c) bw.put(diff < 0 ? diff + (1 << c) - 1 : diff, c);
    int run = 0;
    for (int i = 1; i < 64; ++i) {
        if (z[i] == 0) { ++run; continue; }
        while (run > 15) { bw.put(ac.code[0xf0], ac.len[0xf0]); run -= 16; }
        int cc = bitcat(z[i]);
        int sym = (run << 4) | cc;
        bw.put(ac.code[sym], ac.len[sym]);
        bw.put(z[i] < 0 ? z[i] + (1 << cc) - 1 : z[i], cc);
        run = 0;
    }
    if (run) bw.put(ac.code[0x00], ac.len[0x00]);  // EOB
}

inline void be16(std::vector<uint8_t>& o, uint16_t v) {
    o.push_back(v >> 8);
    o.push_back(v & 0xff);
}

void scale_qt(const uint8_t* base, int quality, uint8_t out[64]) {
    if (quality < 1) quality = 1;
    if (quality > 100) quality = 100;
    int scale = quality < 50 ? 5000 / quality : 200 - 2 * quality;
    for (int i = 0; i < 64; ++i) {
        int v = (base[i] * scale + 50) / 100;
        out[i] = static_cast<uint8_t>(v < 1 ? 1 : (v > 255 ? 255 : v));
    }
}

// Encode one RGB frame as a baseline JFIF JPEG into ``out``.
void encode_frame(const uint8_t* rgb, int h, int w, int quality,
                  std::vector<uint8_t>& out) {
    uint8_t qlum[64], qchr[64];
    scale_qt(kQLum, quality, qlum);
    scale_qt(kQChr, quality, qchr);
    static const Huff dcl = build_huff(kDcLumBits, kDcVals);
    static const Huff dcc = build_huff(kDcChrBits, kDcVals);
    static const Huff acl = build_huff(kAcLumBits, kAcLumVals);
    static const Huff acc = build_huff(kAcChrBits, kAcChrVals);

    // full-range JFIF YCbCr planes; chroma 2x2 box-subsampled
    const int ch = (h + 1) / 2, cw = (w + 1) / 2;
    std::vector<float> Y(static_cast<size_t>(h) * w);
    std::vector<float> Cb(static_cast<size_t>(ch) * cw);
    std::vector<float> Cr(static_cast<size_t>(ch) * cw);
    for (int y = 0; y < h; ++y)
        for (int x = 0; x < w; ++x) {
            const uint8_t* p = rgb + (static_cast<size_t>(y) * w + x) * 3;
            float r = p[0], g = p[1], b = p[2];
            Y[static_cast<size_t>(y) * w + x] =
                0.299f * r + 0.587f * g + 0.114f * b - 128.0f;
        }
    for (int y = 0; y < ch; ++y)
        for (int x = 0; x < cw; ++x) {
            float r = 0, g = 0, b = 0;
            int n = 0;
            for (int dy = 0; dy < 2; ++dy)
                for (int dx = 0; dx < 2; ++dx) {
                    int yy = 2 * y + dy, xx = 2 * x + dx;
                    if (yy >= h || xx >= w) continue;
                    const uint8_t* p =
                        rgb + (static_cast<size_t>(yy) * w + xx) * 3;
                    r += p[0]; g += p[1]; b += p[2];
                    ++n;
                }
            r /= n; g /= n; b /= n;
            Cb[static_cast<size_t>(y) * cw + x] =
                -0.168736f * r - 0.331264f * g + 0.5f * b;
            Cr[static_cast<size_t>(y) * cw + x] =
                0.5f * r - 0.418688f * g - 0.081312f * b;
        }

    // headers
    out.push_back(0xFF); out.push_back(0xD8);              // SOI
    static const uint8_t app0[] = {0xFF, 0xE0, 0x00, 0x10, 'J', 'F', 'I',
                                   'F', 0x00, 0x01, 0x01, 0x00, 0x00, 0x01,
                                   0x00, 0x01, 0x00, 0x00};
    out.insert(out.end(), app0, app0 + sizeof(app0));
    for (int t = 0; t < 2; ++t) {                          // DQT x2
        out.push_back(0xFF); out.push_back(0xDB);
        be16(out, 67);
        out.push_back(static_cast<uint8_t>(t));
        const uint8_t* q = t == 0 ? qlum : qchr;
        for (int i = 0; i < 64; ++i) out.push_back(q[kZigzag[i]]);
    }
    out.push_back(0xFF); out.push_back(0xC0);              // SOF0
    be16(out, 17);
    out.push_back(8);
    be16(out, static_cast<uint16_t>(h));
    be16(out, static_cast<uint16_t>(w));
    out.push_back(3);
    out.push_back(1); out.push_back(0x22); out.push_back(0);  // Y 2x2, qt0
    out.push_back(2); out.push_back(0x11); out.push_back(1);  // Cb
    out.push_back(3); out.push_back(0x11); out.push_back(1);  // Cr
    struct { uint8_t cls_id; const uint8_t* bits; const uint8_t* vals; int n; }
        tables[4] = {{0x00, kDcLumBits, kDcVals, 12},
                     {0x10, kAcLumBits, kAcLumVals, 162},
                     {0x01, kDcChrBits, kDcVals, 12},
                     {0x11, kAcChrBits, kAcChrVals, 162}};
    for (auto& t : tables) {                               // DHT x4
        out.push_back(0xFF); out.push_back(0xC4);
        be16(out, static_cast<uint16_t>(19 + t.n));
        out.push_back(t.cls_id);
        for (int i = 0; i < 16; ++i) out.push_back(t.bits[i]);
        for (int i = 0; i < t.n; ++i) out.push_back(t.vals[i]);
    }
    out.push_back(0xFF); out.push_back(0xDA);              // SOS
    be16(out, 12);
    out.push_back(3);
    out.push_back(1); out.push_back(0x00);
    out.push_back(2); out.push_back(0x11);
    out.push_back(3); out.push_back(0x11);
    out.push_back(0); out.push_back(63); out.push_back(0);

    // entropy-coded MCUs (16x16): 4 Y + Cb + Cr, edge-replicated
    BitWriter bw(out);
    int predY = 0, predCb = 0, predCr = 0;
    auto grab = [](const std::vector<float>& plane, int ph, int pw, int y0,
                   int x0, float blk[64]) {
        for (int y = 0; y < 8; ++y)
            for (int x = 0; x < 8; ++x) {
                int yy = y0 + y, xx = x0 + x;
                if (yy >= ph) yy = ph - 1;
                if (xx >= pw) xx = pw - 1;
                blk[y * 8 + x] = plane[static_cast<size_t>(yy) * pw + xx];
            }
    };
    float blk[64];
    for (int my = 0; my < h; my += 16)
        for (int mx = 0; mx < w; mx += 16) {
            for (int sy = 0; sy < 2; ++sy)
                for (int sx = 0; sx < 2; ++sx) {
                    grab(Y, h, w, my + 8 * sy, mx + 8 * sx, blk);
                    encode_block(bw, blk, qlum, dcl, acl, predY);
                }
            grab(Cb, ch, cw, my / 2, mx / 2, blk);
            encode_block(bw, blk, qchr, dcc, acc, predCb);
            grab(Cr, ch, cw, my / 2, mx / 2, blk);
            encode_block(bw, blk, qchr, dcc, acc, predCr);
        }
    bw.flush();
    out.push_back(0xFF); out.push_back(0xD9);              // EOI
}

// Encode every frame to a standalone JFIF JPEG, striped across threads.
std::vector<std::vector<uint8_t>> encode_parallel(const uint8_t* rgb, int f,
                                                  int h, int w, int quality) {
    std::vector<std::vector<uint8_t>> jpegs(f);
    unsigned n_threads = std::max(1u, std::thread::hardware_concurrency());
    n_threads = std::min<unsigned>(n_threads, static_cast<unsigned>(f));
    std::vector<std::thread> ts;
    std::size_t frame_px = static_cast<size_t>(h) * w * 3;
    for (unsigned t = 0; t < n_threads; ++t)
        ts.emplace_back([&, t] {
            for (int i = static_cast<int>(t); i < f;
                 i += static_cast<int>(n_threads))
                encode_frame(rgb + frame_px * i, h, w, quality, jpegs[i]);
        });
    for (auto& th : ts) th.join();
    return jpegs;
}

}  // namespace jpg

namespace avi {

inline void u32(std::vector<uint8_t>& o, uint32_t v) {
    o.push_back(v & 0xff); o.push_back((v >> 8) & 0xff);
    o.push_back((v >> 16) & 0xff); o.push_back((v >> 24) & 0xff);
}
inline void u16(std::vector<uint8_t>& o, uint16_t v) {
    o.push_back(v & 0xff); o.push_back((v >> 8) & 0xff);
}
inline void fourcc(std::vector<uint8_t>& o, const char* s) {
    o.insert(o.end(), s, s + 4);
}

}  // namespace avi

extern "C" {

// Encode one RGB frame (H, W, 3, uint8, row-major) as a baseline JPEG
// file. Returns 0 on success.
int vdpp_write_jpeg(const char* path, const uint8_t* rgb, int h, int w,
                    int quality) {
    if (h <= 0 || w <= 0) return 1;
    std::vector<uint8_t> buf;
    buf.reserve(static_cast<size_t>(h) * w / 2);
    jpg::encode_frame(rgb, h, w, quality, buf);
    FILE* fp = std::fopen(path, "wb");
    if (!fp) return -1;
    size_t written = std::fwrite(buf.data(), 1, buf.size(), fp);
    std::fclose(fp);
    return written == buf.size() ? 0 : -2;
}

// (F, H, W, 3) uint8 frames -> RIFF AVI with an MJPG video stream
// (one baseline JPEG per frame, frames encoded in parallel threads).
// Playable by VLC/mpv/ffmpeg/browsers without any external dependency.
int vdpp_write_avi_mjpeg(const char* path, const uint8_t* rgb, int f, int h,
                         int w, int fps_num, int fps_den, int quality) {
    if (f <= 0 || h <= 0 || w <= 0 || fps_num <= 0 || fps_den <= 0) return 1;

    std::vector<std::vector<uint8_t>> jpegs =
        jpg::encode_parallel(rgb, f, h, w, quality);

    size_t max_jpeg = 0, total = 0;
    for (auto& j : jpegs) {
        max_jpeg = std::max(max_jpeg, j.size());
        total += j.size() + (j.size() & 1);
    }

    std::vector<uint8_t> out;
    out.reserve(total + 4096);
    using avi::u32; using avi::u16; using avi::fourcc;

    fourcc(out, "RIFF");
    size_t riff_size_at = out.size(); u32(out, 0);         // patched
    fourcc(out, "AVI ");

    fourcc(out, "LIST"); u32(out, 4 + 8 + 56 + 8 + (4 + 8 + 56 + 8 + 40));
    fourcc(out, "hdrl");
    fourcc(out, "avih"); u32(out, 56);
    u32(out, static_cast<uint32_t>(1000000ull * fps_den / fps_num));  // us/frame
    u32(out, 0);                                            // max bytes/sec
    u32(out, 0);                                            // padding
    u32(out, 0x10);                                         // HASINDEX
    u32(out, static_cast<uint32_t>(f));
    u32(out, 0);                                            // initial frames
    u32(out, 1);                                            // streams
    u32(out, static_cast<uint32_t>(max_jpeg));
    u32(out, static_cast<uint32_t>(w));
    u32(out, static_cast<uint32_t>(h));
    u32(out, 0); u32(out, 0); u32(out, 0); u32(out, 0);     // reserved

    fourcc(out, "LIST"); u32(out, 4 + 8 + 56 + 8 + 40);
    fourcc(out, "strl");
    fourcc(out, "strh"); u32(out, 56);
    fourcc(out, "vids"); fourcc(out, "MJPG");
    u32(out, 0); u16(out, 0); u16(out, 0);                  // flags, prio, lang
    u32(out, 0);                                            // initial frames
    u32(out, static_cast<uint32_t>(fps_den));               // scale
    u32(out, static_cast<uint32_t>(fps_num));               // rate
    u32(out, 0);                                            // start
    u32(out, static_cast<uint32_t>(f));                     // length
    u32(out, static_cast<uint32_t>(max_jpeg));              // bufsize
    u32(out, 0xFFFFFFFFu);                                  // quality
    u32(out, 0);                                            // samplesize
    u16(out, 0); u16(out, 0);                               // rcFrame
    u16(out, static_cast<uint16_t>(w)); u16(out, static_cast<uint16_t>(h));

    fourcc(out, "strf"); u32(out, 40);                      // BITMAPINFOHEADER
    u32(out, 40);
    u32(out, static_cast<uint32_t>(w));
    u32(out, static_cast<uint32_t>(h));
    u16(out, 1); u16(out, 24);
    fourcc(out, "MJPG");
    u32(out, static_cast<uint32_t>(h) * w * 3);
    u32(out, 0); u32(out, 0); u32(out, 0); u32(out, 0);

    fourcc(out, "LIST");
    size_t movi_size_at = out.size(); u32(out, 0);          // patched
    size_t movi_start = out.size();
    fourcc(out, "movi");
    std::vector<uint32_t> offsets(f), sizes(f);
    for (int i = 0; i < f; ++i) {
        offsets[i] = static_cast<uint32_t>(out.size() - movi_start);
        fourcc(out, "00dc");
        u32(out, static_cast<uint32_t>(jpegs[i].size()));
        sizes[i] = static_cast<uint32_t>(jpegs[i].size());
        out.insert(out.end(), jpegs[i].begin(), jpegs[i].end());
        if (out.size() & 1) out.push_back(0);               // even padding
    }
    uint32_t movi_size = static_cast<uint32_t>(out.size() - movi_start);
    out[movi_size_at] = movi_size & 0xff;
    out[movi_size_at + 1] = (movi_size >> 8) & 0xff;
    out[movi_size_at + 2] = (movi_size >> 16) & 0xff;
    out[movi_size_at + 3] = (movi_size >> 24) & 0xff;

    fourcc(out, "idx1"); u32(out, static_cast<uint32_t>(16 * f));
    for (int i = 0; i < f; ++i) {
        fourcc(out, "00dc");
        u32(out, 0x10);                                     // KEYFRAME
        u32(out, offsets[i]);
        u32(out, sizes[i]);
    }

    uint32_t riff_size = static_cast<uint32_t>(out.size() - 8);
    out[riff_size_at] = riff_size & 0xff;
    out[riff_size_at + 1] = (riff_size >> 8) & 0xff;
    out[riff_size_at + 2] = (riff_size >> 16) & 0xff;
    out[riff_size_at + 3] = (riff_size >> 24) & 0xff;

    FILE* fp = std::fopen(path, "wb");
    if (!fp) return -1;
    size_t written = std::fwrite(out.data(), 1, out.size(), fp);
    std::fclose(fp);
    return written == out.size() ? 0 : -2;
}

}  // extern "C"

// --------------------- MJPEG-in-MP4 (ISO BMFF) muxer ----------------- //
//
// A true .mp4 container, completing the reference's literal MP4 output
// contract (scripts/generate_video_demo.py:425-443 saves MP4 via
// imageio/ffmpeg). Samples are the same baseline JPEGs as the AVI leg,
// carried in an 'mp4v' track whose esds declares
// objectTypeIndication 0x6C (ISO/IEC 10918-1 JPEG, per the MP4RA
// registry) — ffmpeg/mpv/VLC map that OTI to their MJPEG decoder, so
// the file plays without any re-encode.

namespace mp4 {

inline void u8(std::vector<uint8_t>& o, uint8_t v) { o.push_back(v); }
inline void u16(std::vector<uint8_t>& o, uint16_t v) {
    o.push_back(v >> 8); o.push_back(v & 0xff);
}
inline void u32(std::vector<uint8_t>& o, uint32_t v) {
    o.push_back(v >> 24); o.push_back((v >> 16) & 0xff);
    o.push_back((v >> 8) & 0xff); o.push_back(v & 0xff);
}
inline void tag(std::vector<uint8_t>& o, const char* s) {
    o.insert(o.end(), s, s + 4);
}

// Explicit box framing: reserve a 32-bit size slot, patch on end().
struct Box {
    std::vector<uint8_t>& o;
    size_t at;
    Box(std::vector<uint8_t>& out, const char* type) : o(out), at(out.size()) {
        u32(o, 0);
        tag(o, type);
    }
    void end() const {
        uint32_t sz = static_cast<uint32_t>(o.size() - at);
        o[at] = sz >> 24; o[at + 1] = (sz >> 16) & 0xff;
        o[at + 2] = (sz >> 8) & 0xff; o[at + 3] = sz & 0xff;
    }
};

// Identity transform matrix (16.16 / 2.30 fixed point).
inline void matrix(std::vector<uint8_t>& o) {
    u32(o, 0x00010000); u32(o, 0); u32(o, 0);
    u32(o, 0); u32(o, 0x00010000); u32(o, 0);
    u32(o, 0); u32(o, 0); u32(o, 0x40000000);
}

}  // namespace mp4

extern "C" {

// (F, H, W, 3) uint8 frames -> ISO BMFF .mp4 with one all-keyframe
// MJPEG video track (esds OTI 0x6C). Returns 0 on success.
int vdpp_write_mp4_mjpeg(const char* path, const uint8_t* rgb, int f, int h,
                         int w, int fps_num, int fps_den, int quality) {
    if (f <= 0 || h <= 0 || w <= 0 || fps_num <= 0 || fps_den <= 0) return 1;

    std::vector<std::vector<uint8_t>> jpegs =
        jpg::encode_parallel(rgb, f, h, w, quality);

    uint64_t payload = 0, max_jpeg = 0;
    for (auto& j : jpegs) {
        payload += j.size();
        max_jpeg = std::max<uint64_t>(max_jpeg, j.size());
    }
    // stco/box sizes here are 32-bit; refuse instead of wrapping.
    if (payload > 0xF0000000ull) return 3;

    using mp4::u8; using mp4::u16; using mp4::u32; using mp4::tag;
    using mp4::Box;
    std::vector<uint8_t> out;
    out.reserve(static_cast<size_t>(payload) + 4096);

    {   // ftyp
        Box b(out, "ftyp");
        tag(out, "isom"); u32(out, 0x200);
        tag(out, "isom"); tag(out, "iso2"); tag(out, "mp41");
        b.end();
    }

    // mdat before moov: chunk offsets are absolute file offsets, and the
    // whole file is assembled in one buffer, so buffer offset == file
    // offset at the time each sample lands.
    std::vector<uint32_t> offsets(f);
    {
        Box b(out, "mdat");
        for (int i = 0; i < f; ++i) {
            offsets[i] = static_cast<uint32_t>(out.size());
            out.insert(out.end(), jpegs[i].begin(), jpegs[i].end());
        }
        b.end();
    }

    const uint32_t timescale = static_cast<uint32_t>(fps_num);
    const uint32_t delta = static_cast<uint32_t>(fps_den);
    const uint32_t duration = delta * static_cast<uint32_t>(f);
    const uint32_t fps_round =
        static_cast<uint32_t>((fps_num + fps_den - 1) / fps_den);
    const uint32_t peak_bps =
        static_cast<uint32_t>(std::min<uint64_t>(0xFFFFFFFFull,
                                                 max_jpeg * 8 * fps_round));
    const uint32_t avg_bps = static_cast<uint32_t>(std::min<uint64_t>(
        0xFFFFFFFFull, payload / static_cast<uint64_t>(f) * 8 * fps_round));

    Box moov(out, "moov");
    {   // mvhd
        Box b(out, "mvhd");
        u32(out, 0);                       // version 0 + flags
        u32(out, 0); u32(out, 0);          // creation / modification
        u32(out, timescale);
        u32(out, duration);
        u32(out, 0x00010000);              // rate 1.0
        u16(out, 0x0100);                  // volume 1.0
        u16(out, 0); u32(out, 0); u32(out, 0);  // reserved
        mp4::matrix(out);
        for (int i = 0; i < 6; ++i) u32(out, 0);  // pre_defined
        u32(out, 2);                       // next track id
        b.end();
    }
    Box trak(out, "trak");
    {   // tkhd: flags = enabled | in-movie
        Box b(out, "tkhd");
        u32(out, 0x000003);
        u32(out, 0); u32(out, 0);
        u32(out, 1);                       // track id
        u32(out, 0);                       // reserved
        u32(out, duration);
        u32(out, 0); u32(out, 0);          // reserved
        u16(out, 0); u16(out, 0);          // layer, alternate group
        u16(out, 0); u16(out, 0);          // volume, reserved
        mp4::matrix(out);
        u32(out, static_cast<uint32_t>(w) << 16);
        u32(out, static_cast<uint32_t>(h) << 16);
        b.end();
    }
    Box mdia(out, "mdia");
    {   // mdhd, language 'und'
        Box b(out, "mdhd");
        u32(out, 0);
        u32(out, 0); u32(out, 0);
        u32(out, timescale);
        u32(out, duration);
        u16(out, 0x55C4);
        u16(out, 0);
        b.end();
    }
    {   // hdlr
        Box b(out, "hdlr");
        u32(out, 0);
        u32(out, 0);
        tag(out, "vide");
        u32(out, 0); u32(out, 0); u32(out, 0);
        const char* name = "VideoHandler";
        out.insert(out.end(), name, name + 13);  // incl. NUL
        b.end();
    }
    Box minf(out, "minf");
    {   // vmhd
        Box b(out, "vmhd");
        u32(out, 0x000001);
        u16(out, 0);                       // graphics mode: copy
        u16(out, 0); u16(out, 0); u16(out, 0);  // opcolor
        b.end();
    }
    {   // dinf > dref > url (self-contained flag)
        Box b(out, "dinf");
        Box d(out, "dref");
        u32(out, 0);
        u32(out, 1);
        Box u(out, "url ");
        u32(out, 0x000001);
        u.end();
        d.end();
        b.end();
    }
    Box stbl(out, "stbl");
    {   // stsd > mp4v > esds
        Box b(out, "stsd");
        u32(out, 0);
        u32(out, 1);
        Box v(out, "mp4v");
        for (int i = 0; i < 6; ++i) u8(out, 0);  // reserved
        u16(out, 1);                             // data ref index
        u16(out, 0); u16(out, 0);                // pre_defined, reserved
        u32(out, 0); u32(out, 0); u32(out, 0);   // pre_defined
        u16(out, static_cast<uint16_t>(w));
        u16(out, static_cast<uint16_t>(h));
        u32(out, 0x00480000);                    // 72 dpi horizontal
        u32(out, 0x00480000);                    // 72 dpi vertical
        u32(out, 0);                             // reserved
        u16(out, 1);                             // frames per sample
        u8(out, 10);                             // compressor name (pascal)
        const char* cname = "vdpp mjpeg";
        out.insert(out.end(), cname, cname + 10);
        for (int i = 0; i < 21; ++i) u8(out, 0); // pad name field to 32
        u16(out, 24);                            // depth
        u16(out, 0xFFFF);                        // pre_defined -1
        {
            Box e(out, "esds");
            u32(out, 0);
            // ES_Descriptor: 3 bytes own payload + DCD(15) + SLConfig(3)
            u8(out, 0x03); u8(out, 21);
            u16(out, 1);                         // ES_ID
            u8(out, 0);                          // no deps/URL/OCR
            // DecoderConfigDescriptor: OTI 0x6C = JPEG (ISO 10918-1)
            u8(out, 0x04); u8(out, 13);
            u8(out, 0x6C);
            u8(out, 0x11);                       // visual stream
            u8(out, static_cast<uint8_t>((max_jpeg >> 16) & 0xff));
            u8(out, static_cast<uint8_t>((max_jpeg >> 8) & 0xff));
            u8(out, static_cast<uint8_t>(max_jpeg & 0xff));
            u32(out, peak_bps);
            u32(out, avg_bps);
            // SLConfigDescriptor: predefined 2 (MP4 file)
            u8(out, 0x06); u8(out, 1); u8(out, 0x02);
            e.end();
        }
        v.end();
        b.end();
    }
    {   // stts: every sample lasts `delta` ticks
        Box b(out, "stts");
        u32(out, 0);
        u32(out, 1);
        u32(out, static_cast<uint32_t>(f));
        u32(out, delta);
        b.end();
    }
    {   // stsc: one sample per chunk
        Box b(out, "stsc");
        u32(out, 0);
        u32(out, 1);
        u32(out, 1); u32(out, 1); u32(out, 1);
        b.end();
    }
    {   // stsz: per-sample sizes
        Box b(out, "stsz");
        u32(out, 0);
        u32(out, 0);
        u32(out, static_cast<uint32_t>(f));
        for (int i = 0; i < f; ++i)
            u32(out, static_cast<uint32_t>(jpegs[i].size()));
        b.end();
    }
    {   // stco: absolute chunk offsets (no stss box: all sync samples)
        Box b(out, "stco");
        u32(out, 0);
        u32(out, static_cast<uint32_t>(f));
        for (int i = 0; i < f; ++i) u32(out, offsets[i]);
        b.end();
    }
    stbl.end();
    minf.end();
    mdia.end();
    trak.end();
    moov.end();

    FILE* fp = std::fopen(path, "wb");
    if (!fp) return -1;
    size_t written = std::fwrite(out.data(), 1, out.size(), fp);
    std::fclose(fp);
    return written == out.size() ? 0 : -2;
}

}  // extern "C"
