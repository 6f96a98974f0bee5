// videopack — native video packing for vdpp-tpu.
//
// The reference's video output path leans on imageio+ffmpeg CUDA-side
// (reference: scripts/generate_video_demo.py:198-222). On TPU hosts
// without an ffmpeg backend this library provides a dependency-free
// output format: threaded RGB -> YUV420 (BT.601) conversion and a
// YUV4MPEG2 (.y4m) container writer — playable by mpv/vlc/ffmpeg and
// losslessly convertible to mp4.
//
// Built as a small shared library, bound from Python via ctypes
// (vdpp_tpu/utils/native.py); a numpy fallback exists when the library
// is unavailable.

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
