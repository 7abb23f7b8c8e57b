// spatialvae_native — host-side data-path accelerators.
//
// The reference has no native layer (SURVEY.md section 2.2); this library is
// the TPU build's host runtime: the operations that sit between disk and
// HBM and between device output and PNG, which in the reference run as
// single-threaded numpy/PIL Python:
//
//  - mrc_decode_f32: MRC2000 stack -> float32, all modes, multithreaded
//    (reference: np.frombuffer + copy, spatial_vae/mrc.py:108-140)
//  - u8_to_f32_scale: uint8 image stacks -> float32/255 (train_mnist.py:310)
//  - f32_normalize_whole: per-image (x-mu)/sigma (train_particles.py:339-347)
//  - grid_tile_u8: compose the save_image grid canvas (misc_tools.py:31-39)
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 4;
}

// Run fn(begin, end) over [0, total) split across threads.
template <typename F>
void parallel_for(int64_t total, F fn) {
  int nt = std::min<int64_t>(hw_threads(), std::max<int64_t>(total, 1));
  if (nt <= 1 || total < (1 << 15)) {
    fn(0, total);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (total + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(total, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// MRC decoding
// ---------------------------------------------------------------------------

// Reads nx, ny, nz, mode, next (ext header bytes) from a 1024-byte header.
// Returns 0 on success.
int mrc_header_info(const uint8_t* buf, int64_t len, int32_t* nx, int32_t* ny,
                    int32_t* nz, int32_t* mode, int32_t* extbytes) {
  if (len < 1024) return -1;
  std::memcpy(nx, buf + 0, 4);
  std::memcpy(ny, buf + 4, 4);
  std::memcpy(nz, buf + 8, 4);
  std::memcpy(mode, buf + 12, 4);
  std::memcpy(extbytes, buf + 92, 4);  // word 24 'next'
  return 0;
}

// Decode the data section (already offset past header+ext) into float32.
// Supported modes: 0 int8, 1 int16, 2 float32, 6 uint16.  Returns 0 on
// success, -2 on unsupported mode.
int mrc_decode_f32(const uint8_t* data, int64_t count, int32_t mode,
                   float* out) {
  switch (mode) {
    case 0:
      parallel_for(count, [&](int64_t lo, int64_t hi) {
        const int8_t* p = reinterpret_cast<const int8_t*>(data);
        for (int64_t i = lo; i < hi; ++i) out[i] = static_cast<float>(p[i]);
      });
      return 0;
    case 1:
      parallel_for(count, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
          int16_t v;
          std::memcpy(&v, data + 2 * i, 2);
          out[i] = static_cast<float>(v);
        }
      });
      return 0;
    case 2:
      parallel_for(count, [&](int64_t lo, int64_t hi) {
        std::memcpy(out + lo, data + 4 * lo, 4 * (hi - lo));
      });
      return 0;
    case 6:
      parallel_for(count, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
          uint16_t v;
          std::memcpy(&v, data + 2 * i, 2);
          out[i] = static_cast<float>(v);
        }
      });
      return 0;
    default:
      return -2;
  }
}

// ---------------------------------------------------------------------------
// Preprocessing
// ---------------------------------------------------------------------------

void u8_to_f32_scale(const uint8_t* in, int64_t count, float scale,
                     float* out) {
  parallel_for(count, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i)
      out[i] = static_cast<float>(in[i]) * scale;
  });
}

// Per-image whole-image standardisation over an (n_images, pixels) stack.
void f32_normalize_whole(float* data, int64_t n_images, int64_t pixels) {
  parallel_for(n_images, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      float* img = data + i * pixels;
      double sum = 0.0, sq = 0.0;
      for (int64_t j = 0; j < pixels; ++j) {
        sum += img[j];
        sq += static_cast<double>(img[j]) * img[j];
      }
      double mu = sum / pixels;
      double var = sq / pixels - mu * mu;
      float inv = 1.0f / static_cast<float>(std::sqrt(std::max(var, 1e-30)));
      float mean = static_cast<float>(mu);
      for (int64_t j = 0; j < pixels; ++j) img[j] = (img[j] - mean) * inv;
    }
  });
}

// ---------------------------------------------------------------------------
// PNG grid composition (geometry of torchvision save_image)
// ---------------------------------------------------------------------------

// images: (b, n, m, c) float32 in [0,1]; canvas: (H, W, c) uint8
// preinitialised by caller size: H = (n+pad)*ymaps+pad, W = (m+pad)*xmaps+pad.
void grid_tile_u8(const float* images, int64_t b, int64_t n, int64_t m,
                  int64_t c, int64_t xmaps, int64_t ymaps, int64_t pad,
                  float pad_value, uint8_t* canvas) {
  int64_t W = (m + pad) * xmaps + pad;
  int64_t H = (n + pad) * ymaps + pad;
  uint8_t fill = static_cast<uint8_t>(
      std::clamp(pad_value * 255.0f + 0.5f, 0.0f, 255.0f));
  std::memset(canvas, fill, H * W * c);
  parallel_for(b, [&](int64_t lo, int64_t hi) {
    for (int64_t k = lo; k < hi; ++k) {
      int64_t gy = k / xmaps;
      int64_t gx = k % xmaps;
      int64_t top = gy * (n + pad) + pad;
      int64_t left = gx * (m + pad) + pad;
      const float* img = images + k * n * m * c;
      for (int64_t r = 0; r < n; ++r) {
        uint8_t* dst = canvas + ((top + r) * W + left) * c;
        const float* src = img + r * m * c;
        for (int64_t j = 0; j < m * c; ++j) {
          dst[j] = static_cast<uint8_t>(
              std::clamp(src[j] * 255.0f + 0.5f, 0.0f, 255.0f));
        }
      }
    }
  });
}

}  // extern "C"
