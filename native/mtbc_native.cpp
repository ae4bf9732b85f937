// mtbc_native — native data-path kernels for the TPU framework's host side.
//
// The reference pipeline leans on OpenCV/scipy C++ internals for its
// preprocessing hot spots (nearest resize, mask merging, per-image stats —
// src/dataset/Curated_BUSI_preprocessing.py:67-141). This library provides the
// same operations as a standalone C++ core with C linkage, consumed from
// Python via ctypes (no pybind11 in the image). All functions operate on
// caller-allocated buffers; batch entry points are OpenMP-parallel so host
// preprocessing keeps up with the TPU input pipeline.

#include <cstdint>
#include <cstring>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Nearest-neighbour resize with cv2.INTER_NEAREST index semantics:
// src_x = floor(dst_x * src_w / dst_w).
void nearest_resize_u8(const uint8_t* src, int sh, int sw,
                       uint8_t* dst, int dh, int dw) {
    const double sy = static_cast<double>(sh) / dh;
    const double sx = static_cast<double>(sw) / dw;
    for (int y = 0; y < dh; ++y) {
        const int src_y = std::min(static_cast<int>(y * sy), sh - 1);
        const uint8_t* row = src + static_cast<size_t>(src_y) * sw;
        uint8_t* out = dst + static_cast<size_t>(y) * dw;
        for (int x = 0; x < dw; ++x) {
            out[x] = row[std::min(static_cast<int>(x * sx), sw - 1)];
        }
    }
}

// Batched resize: (n, sh, sw) -> (n, dh, dw).
void nearest_resize_u8_batch(const uint8_t* src, int n, int sh, int sw,
                             uint8_t* dst, int dh, int dw) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int i = 0; i < n; ++i) {
        nearest_resize_u8(src + static_cast<size_t>(i) * sh * sw, sh, sw,
                          dst + static_cast<size_t>(i) * dh * dw, dh, dw);
    }
}

// Saturating accumulate: a := min(a + b, 255)  (cv2.add semantics, used when
// merging multi-tumor masks _mask.png + _mask_1.png).
void add_saturate_u8(uint8_t* a, const uint8_t* b, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        const int v = static_cast<int>(a[i]) + static_cast<int>(b[i]);
        a[i] = static_cast<uint8_t>(v > 255 ? 255 : v);
    }
}

// In-place binarize: m := (m >= thresh) ? 1 : 0.
void binarize_u8(uint8_t* m, int64_t n, uint8_t thresh) {
    for (int64_t i = 0; i < n; ++i) m[i] = m[i] >= thresh ? 1 : 0;
}

// Mask statistics: out7 = {tumor_pixels, ymax, ymin, xmax, xmin, ysize, xsize}
// with the preprocessing tool's bbox conventions (zeros when empty,
// max-exclusive upper bounds).
void mask_stats(const uint8_t* mask, int h, int w, int64_t* out7) {
    int64_t count = 0;
    int ymin = h, ymax = -1, xmin = w, xmax = -1;
    for (int y = 0; y < h; ++y) {
        const uint8_t* row = mask + static_cast<size_t>(y) * w;
        for (int x = 0; x < w; ++x) {
            if (row[x]) {
                ++count;
                if (y < ymin) ymin = y;
                if (y > ymax) ymax = y;
                if (x < xmin) xmin = x;
                if (x > xmax) xmax = x;
            }
        }
    }
    if (count == 0) {
        for (int i = 0; i < 7; ++i) out7[i] = 0;
        return;
    }
    out7[0] = count;
    out7[1] = ymax + 1;
    out7[2] = ymin;
    out7[3] = xmax + 1;
    out7[4] = xmin;
    out7[5] = (ymax + 1) - ymin;
    out7[6] = (xmax + 1) - xmin;
}

// uint8 -> float32 image conversion with optional min-max normalisation and
// channel stacking — the dataset-build inner loop.
void u8_to_f32(const uint8_t* src, float* dst, int64_t n, int normalize) {
    if (!normalize) {
        for (int64_t i = 0; i < n; ++i) dst[i] = static_cast<float>(src[i]);
        return;
    }
    uint8_t lo = 255, hi = 0;
    for (int64_t i = 0; i < n; ++i) {
        lo = std::min(lo, src[i]);
        hi = std::max(hi, src[i]);
    }
    const float scale = (hi > lo) ? 1.0f / (hi - lo) : 0.0f;
    for (int64_t i = 0; i < n; ++i) {
        dst[i] = (static_cast<float>(src[i]) - lo) * scale;
    }
}

}  // extern "C"
