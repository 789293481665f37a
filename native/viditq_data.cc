// Native data-preprocessing kernels for the loader hot path.
//
// The reference's data pipeline leans on torchvision's C++ kernels
// (reference t2v/opensora/datasets/video_transforms.py + torchvision io);
// this library provides the TPU-host equivalents — batched uint8 bilinear
// resize, center crop, and fused normalize([-1,1]) + HWC->CHW pack — callable
// from python via ctypes (viditq_tpu/data/native.py), with a numpy fallback
// when the shared object hasn't been built.
//
// Build: make -C native   (g++ -O3 -fopenmp-simd, no external deps)

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Bilinear resize uint8 HWC -> uint8 HWC.
void viditq_resize_bilinear_u8(const uint8_t* src, int sh, int sw, int c,
                               uint8_t* dst, int dh, int dw) {
  const float ys = static_cast<float>(sh) / dh;
  const float xs = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * ys - 0.5f;
    int y0 = std::max(0, std::min(sh - 1, static_cast<int>(fy)));
    int y1 = std::min(sh - 1, y0 + 1);
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * xs - 0.5f;
      int x0 = std::max(0, std::min(sw - 1, static_cast<int>(fx)));
      int x1 = std::min(sw - 1, x0 + 1);
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      const uint8_t* p00 = src + (y0 * sw + x0) * c;
      const uint8_t* p01 = src + (y0 * sw + x1) * c;
      const uint8_t* p10 = src + (y1 * sw + x0) * c;
      const uint8_t* p11 = src + (y1 * sw + x1) * c;
      uint8_t* out = dst + (y * dw + x) * c;
      for (int ch = 0; ch < c; ++ch) {
        float top = p00[ch] * (1 - wx) + p01[ch] * wx;
        float bot = p10[ch] * (1 - wx) + p11[ch] * wx;
        float v = top * (1 - wy) + bot * wy;
        out[ch] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// Center crop uint8 HWC.
void viditq_center_crop_u8(const uint8_t* src, int sh, int sw, int c,
                           uint8_t* dst, int th, int tw) {
  int top = (sh - th) / 2;
  int left = (sw - tw) / 2;
  for (int y = 0; y < th; ++y) {
    std::memcpy(dst + y * tw * c,
                src + ((top + y) * sw + left) * c,
                static_cast<size_t>(tw) * c);
  }
}

// Fused: uint8 [T, H, W, C] -> float32 [C, T, H, W] normalized to [-1, 1].
void viditq_normalize_pack_chw(const uint8_t* src, int t, int h, int w, int c,
                               float* dst) {
  const float scale = 1.0f / 127.5f;
  const int64_t thw = static_cast<int64_t>(t) * h * w;
  for (int64_t i = 0; i < thw; ++i) {
    const uint8_t* px = src + i * c;
    for (int ch = 0; ch < c; ++ch) {
      dst[ch * thw + i] = px[ch] * scale - 1.0f;
    }
  }
}

// One-call pipeline per frame batch: resize -> crop -> normalize+pack.
// src: [T, sh, sw, C]; dst: [C, T, th, tw] float32.
void viditq_preprocess_frames(const uint8_t* src, int t, int sh, int sw,
                              int c, float* dst, int th, int tw,
                              uint8_t* scratch /* [2 * rh * rw * c] */) {
  // scale preserving aspect so the short side covers the target, then crop
  float scale = std::max(static_cast<float>(th) / sh,
                         static_cast<float>(tw) / sw);
  int rh = static_cast<int>(sh * scale + 0.5f);
  int rw = static_cast<int>(sw * scale + 0.5f);
  uint8_t* resized = scratch;
  uint8_t* cropped = scratch + static_cast<int64_t>(rh) * rw * c;
  const int64_t thw = static_cast<int64_t>(t) * th * tw;
  const float nscale = 1.0f / 127.5f;
  for (int f = 0; f < t; ++f) {
    viditq_resize_bilinear_u8(src + static_cast<int64_t>(f) * sh * sw * c,
                              sh, sw, c, resized, rh, rw);
    viditq_center_crop_u8(resized, rh, rw, c, cropped, th, tw);
    const int64_t hw = static_cast<int64_t>(th) * tw;
    for (int64_t i = 0; i < hw; ++i) {
      const uint8_t* px = cropped + i * c;
      for (int ch = 0; ch < c; ++ch) {
        dst[ch * thw + static_cast<int64_t>(f) * hw + i] =
            px[ch] * nscale - 1.0f;
      }
    }
  }
}

}  // extern "C"
