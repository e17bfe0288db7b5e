// saspa_host: native host-side image kernels for the input pipelines.
//
// The reference outsources its host image work to OpenCV's C++ (cv2.Canny,
// cv2.resize — all_utils/utils.py:78,83) and torchvision's C++ transform ops
// inside DataLoader workers.  This library is the framework's own native
// equivalent: the hot host-side loops (batched resize, normalize, canny for
// side-file generation) as vectorizable C++ with a thread pool, bound via
// ctypes (saspa_tpu/native/host_ops.py).  Device-side Canny/augment stay in
// JAX/Pallas; this covers the host half of the pipeline (decode -> batch).
//
// Build: python -m saspa_tpu.native.build  (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// resize, uint8 HWC -> uint8 HWC: area-average on downscale (antialiased,
// matches PIL/cv2.INTER_AREA closely), half-pixel bilinear on upscale
// ---------------------------------------------------------------------------
static void resize_area(const uint8_t* src, int sh, int sw, int c,
                        uint8_t* dst, int dh, int dw) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  std::vector<float> acc(c);
  for (int y = 0; y < dh; ++y) {
    float fy0 = y * sy, fy1 = (y + 1) * sy;
    int iy0 = static_cast<int>(std::floor(fy0));
    int iy1 = std::min(sh, static_cast<int>(std::ceil(fy1)));
    for (int x = 0; x < dw; ++x) {
      float fx0 = x * sx, fx1 = (x + 1) * sx;
      int ix0 = static_cast<int>(std::floor(fx0));
      int ix1 = std::min(sw, static_cast<int>(std::ceil(fx1)));
      std::fill(acc.begin(), acc.end(), 0.0f);
      float total_w = 0.0f;
      for (int yy = iy0; yy < iy1; ++yy) {
        float wy = std::min(fy1, static_cast<float>(yy + 1)) - std::max(fy0, static_cast<float>(yy));
        for (int xx = ix0; xx < ix1; ++xx) {
          float wx = std::min(fx1, static_cast<float>(xx + 1)) - std::max(fx0, static_cast<float>(xx));
          float wgt = wy * wx;
          total_w += wgt;
          const uint8_t* p = src + (yy * sw + xx) * c;
          for (int ch = 0; ch < c; ++ch) acc[ch] += wgt * p[ch];
        }
      }
      uint8_t* out = dst + (y * dw + x) * c;
      for (int ch = 0; ch < c; ++ch)
        out[ch] = static_cast<uint8_t>(acc[ch] / std::max(total_w, 1e-9f) + 0.5f);
    }
  }
}

static void resize_one(const uint8_t* src, int sh, int sw, int c,
                       uint8_t* dst, int dh, int dw) {
  if (dh < sh && dw < sw) {
    resize_area(src, sh, sw, c, dst, dh, dw);
    return;
  }
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = std::max(0, std::min(sh - 1, static_cast<int>(std::floor(fy))));
    int y1 = std::min(sh - 1, y0 + 1);
    float wy = std::min(1.0f, std::max(0.0f, fy - y0));
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = std::max(0, std::min(sw - 1, static_cast<int>(std::floor(fx))));
      int x1 = std::min(sw - 1, x0 + 1);
      float wx = std::min(1.0f, std::max(0.0f, fx - x0));
      for (int ch = 0; ch < c; ++ch) {
        float top = src[(y0 * sw + x0) * c + ch] * (1 - wx) +
                    src[(y0 * sw + x1) * c + ch] * wx;
        float bot = src[(y1 * sw + x0) * c + ch] * (1 - wx) +
                    src[(y1 * sw + x1) * c + ch] * wx;
        float v = top * (1 - wy) + bot * wy;
        dst[(y * dw + x) * c + ch] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

void resize_bilinear_u8(const uint8_t* src, int sh, int sw, int c,
                        uint8_t* dst, int dh, int dw) {
  resize_one(src, sh, sw, c, dst, dh, dw);
}

// Batched resize over a thread pool: srcs is a packed array of N images of
// identical source shape; dst is N x dh x dw x c.
void resize_batch_u8(const uint8_t* srcs, int n, int sh, int sw, int c,
                     uint8_t* dst, int dh, int dw, int num_threads) {
  const size_t src_stride = static_cast<size_t>(sh) * sw * c;
  const size_t dst_stride = static_cast<size_t>(dh) * dw * c;
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      resize_one(srcs + i * src_stride, sh, sw, c, dst + i * dst_stride, dh, dw);
    }
  };
  int t = std::max(1, num_threads);
  std::vector<std::thread> pool;
  for (int i = 0; i < t - 1; ++i) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
}

// ---------------------------------------------------------------------------
// fused crop + normalize: uint8 HWC -> float32 HWC, (x/255 - mean) / std
// ---------------------------------------------------------------------------
void normalize_crop_f32(const uint8_t* src, int sh, int sw, int c,
                        int y0, int x0, int th, int tw,
                        const float* mean, const float* stddev, float* dst) {
  for (int y = 0; y < th; ++y) {
    const uint8_t* row = src + ((y0 + y) * sw + x0) * c;
    float* out = dst + y * tw * c;
    for (int x = 0; x < tw; ++x) {
      for (int ch = 0; ch < c; ++ch) {
        out[x * c + ch] = (row[x * c + ch] * (1.0f / 255.0f) - mean[ch]) / stddev[ch];
      }
    }
  }
}

void normalize_crop_batch_f32(const uint8_t* srcs, int n, int sh, int sw, int c,
                              int y0, int x0, int th, int tw,
                              const float* mean, const float* stddev,
                              float* dst, int num_threads) {
  const size_t src_stride = static_cast<size_t>(sh) * sw * c;
  const size_t dst_stride = static_cast<size_t>(th) * tw * c;
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      normalize_crop_f32(srcs + i * src_stride, sh, sw, c, y0, x0, th, tw,
                         mean, stddev, dst + i * dst_stride);
    }
  };
  int t = std::max(1, num_threads);
  std::vector<std::thread> pool;
  for (int i = 0; i < t - 1; ++i) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
}

// ---------------------------------------------------------------------------
// Canny (host fallback; device Pallas/JAX version is primary).
// Matches cv2 semantics: 3x3 Sobel, L1 magnitude, per-pixel max channel,
// sector NMS, double threshold + 8-connected hysteresis (BFS).
// ---------------------------------------------------------------------------
void canny_u8(const uint8_t* src, int h, int w, int c,
              float low, float high, uint8_t* dst) {
  std::vector<float> gx(h * w), gy(h * w), mag(h * w, 0.0f);
  auto px = [&](int y, int x, int ch) -> float {
    y = std::max(0, std::min(h - 1, y));
    x = std::max(0, std::min(w - 1, x));
    return static_cast<float>(src[(y * w + x) * c + ch]);
  };
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      float best = -1.0f, bgx = 0.0f, bgy = 0.0f;
      for (int ch = 0; ch < c; ++ch) {
        float sx = (px(y - 1, x + 1, ch) + 2 * px(y, x + 1, ch) + px(y + 1, x + 1, ch)) -
                   (px(y - 1, x - 1, ch) + 2 * px(y, x - 1, ch) + px(y + 1, x - 1, ch));
        float sy = (px(y + 1, x - 1, ch) + 2 * px(y + 1, x, ch) + px(y + 1, x + 1, ch)) -
                   (px(y - 1, x - 1, ch) + 2 * px(y - 1, x, ch) + px(y - 1, x + 1, ch));
        float m = std::fabs(sx) + std::fabs(sy);
        if (m > best) { best = m; bgx = sx; bgy = sy; }
      }
      gx[y * w + x] = bgx;
      gy[y * w + x] = bgy;
      mag[y * w + x] = best;
    }
  }
  const float TG22 = 0.4142135623730951f;
  std::vector<uint8_t> strong(h * w, 0), weak(h * w, 0);
  auto m_at = [&](int y, int x) -> float {
    if (y < 0 || y >= h || x < 0 || x >= w) return 0.0f;
    return mag[y * w + x];
  };
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      float m = mag[y * w + x];
      if (m <= low) continue;
      float ax = std::fabs(gx[y * w + x]), ay = std::fabs(gy[y * w + x]);
      float n1, n2;
      if (ay < TG22 * ax) { n1 = m_at(y, x - 1); n2 = m_at(y, x + 1); }
      else if (ay > ax / TG22) { n1 = m_at(y - 1, x); n2 = m_at(y + 1, x); }
      else if (gx[y * w + x] * gy[y * w + x] >= 0) { n1 = m_at(y - 1, x - 1); n2 = m_at(y + 1, x + 1); }
      else { n1 = m_at(y - 1, x + 1); n2 = m_at(y + 1, x - 1); }
      if (m > n1 && m >= n2) {
        weak[y * w + x] = 1;
        if (m > high) strong[y * w + x] = 1;
      }
    }
  }
  // hysteresis BFS from strong pixels
  std::vector<int> stack;
  std::memset(dst, 0, static_cast<size_t>(h) * w);
  for (int i = 0; i < h * w; ++i) {
    if (strong[i]) { dst[i] = 255; stack.push_back(i); }
  }
  while (!stack.empty()) {
    int i = stack.back();
    stack.pop_back();
    int y = i / w, x = i % w;
    for (int dy = -1; dy <= 1; ++dy) {
      for (int dx = -1; dx <= 1; ++dx) {
        int ny = y + dy, nx = x + dx;
        if (ny < 0 || ny >= h || nx < 0 || nx >= w) continue;
        int j = ny * w + nx;
        if (weak[j] && !dst[j]) { dst[j] = 255; stack.push_back(j); }
      }
    }
  }
}

}  // extern "C"
