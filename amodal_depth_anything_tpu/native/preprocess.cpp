// Native host-side preprocessing for the data pipeline.
//
// The reference leans on torch DataLoader worker processes + torchvision
// resizes for its host preprocessing (SURVEY.md L3). Our TPU input
// pipeline is thread-based (data/loader.py); this module moves the hot
// per-sample work — NEAREST_EXACT resize of uint8/uint16 rasters and
// fused uint->float normalization — into C (OpenMP-parallel across rows),
// so the single Python host thread is not the bottleneck feeding the chip.
//
// Index semantics match torch NEAREST_EXACT (and ops/resize.py):
//   src = clamp(floor((dst + 0.5) * in/out), 0, in-1), computed in float32.
//
// Exposed via ctypes (see native/__init__.py). Build:
//   g++ -O3 -fopenmp -shared -fPIC preprocess.cpp -o libpreprocess.so

#include <cstdint>
#include <cmath>
#include <algorithm>

extern "C" {

static inline void nearest_indices(int in_size, int out_size, int32_t* idx) {
    const float scale = static_cast<float>(in_size) /
                        static_cast<float>(out_size);
    for (int i = 0; i < out_size; ++i) {
        float src = (static_cast<float>(i) + 0.5f) * scale;
        int v = static_cast<int>(std::floor(src));
        idx[i] = std::min(std::max(v, 0), in_size - 1);
    }
}

// uint8 HWC image -> float32 HWC, resized NEAREST_EXACT, value*scale+shift.
void resize_u8_to_f32(const uint8_t* src, int in_h, int in_w, int ch,
                      float* dst, int out_h, int out_w,
                      float scale, float shift) {
    int32_t* rows = new int32_t[out_h];
    int32_t* cols = new int32_t[out_w];
    nearest_indices(in_h, out_h, rows);
    nearest_indices(in_w, out_w, cols);
#pragma omp parallel for schedule(static)
    for (int y = 0; y < out_h; ++y) {
        const uint8_t* src_row = src + static_cast<int64_t>(rows[y]) * in_w * ch;
        float* dst_row = dst + static_cast<int64_t>(y) * out_w * ch;
        for (int x = 0; x < out_w; ++x) {
            const uint8_t* p = src_row + static_cast<int64_t>(cols[x]) * ch;
            float* q = dst_row + static_cast<int64_t>(x) * ch;
            for (int c = 0; c < ch; ++c) {
                q[c] = static_cast<float>(p[c]) * scale + shift;
            }
        }
    }
    delete[] rows;
    delete[] cols;
}

// uint16 single-channel raster (SAM pseudo-depth) -> float32, /65535.
void resize_u16_to_f32(const uint16_t* src, int in_h, int in_w,
                       float* dst, int out_h, int out_w, float scale) {
    int32_t* rows = new int32_t[out_h];
    int32_t* cols = new int32_t[out_w];
    nearest_indices(in_h, out_h, rows);
    nearest_indices(in_w, out_w, cols);
#pragma omp parallel for schedule(static)
    for (int y = 0; y < out_h; ++y) {
        const uint16_t* src_row = src + static_cast<int64_t>(rows[y]) * in_w;
        float* dst_row = dst + static_cast<int64_t>(y) * out_w;
        for (int x = 0; x < out_w; ++x) {
            dst_row[x] = static_cast<float>(src_row[cols[x]]) * scale;
        }
    }
    delete[] rows;
    delete[] cols;
}

// float32 HWC -> float32 HWC resize (already-decoded rasters).
void resize_f32(const float* src, int in_h, int in_w, int ch,
                float* dst, int out_h, int out_w) {
    int32_t* rows = new int32_t[out_h];
    int32_t* cols = new int32_t[out_w];
    nearest_indices(in_h, out_h, rows);
    nearest_indices(in_w, out_w, cols);
#pragma omp parallel for schedule(static)
    for (int y = 0; y < out_h; ++y) {
        const float* src_row = src + static_cast<int64_t>(rows[y]) * in_w * ch;
        float* dst_row = dst + static_cast<int64_t>(y) * out_w * ch;
        for (int x = 0; x < out_w; ++x) {
            const float* p = src_row + static_cast<int64_t>(cols[x]) * ch;
            float* q = dst_row + static_cast<int64_t>(x) * ch;
            for (int c = 0; c < ch; ++c) q[c] = p[c];
        }
    }
    delete[] rows;
    delete[] cols;
}

}  // extern "C"
