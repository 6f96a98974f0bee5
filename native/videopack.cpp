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
