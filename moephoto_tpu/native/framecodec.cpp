// Host-side frame codec: the video pipe's per-frame hot path.
//
// The reference converts raw bgr48le frames with numpy
// (frombuffer/astype, python/imageProcess.py:216-236) — single threaded
// and allocation heavy at 6 B/px * fps.  This native codec does the
// uint16<->float32 conversion (with optional BGR<->RGB swizzle) in
// parallel chunks, feeding pinned staging buffers for device_put.
//
// Built as a plain shared library; bound via ctypes (no pybind11 in
// this image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kMaxThreads = 8;
constexpr int64_t kMinChunk = 1 << 16;  // pixels per thread minimum

template <typename F>
void parallel_for(int64_t n, F f) {
  int threads = static_cast<int>(
      std::min<int64_t>(kMaxThreads, (n + kMinChunk - 1) / kMinChunk));
  if (threads <= 1) {
    f(0, n);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back([=] { f(lo, hi); });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// uint16 interleaved (npx, 3) -> float32 (npx, 3), scale 1/65536,
// optionally swapping channels 0<->2 (BGR -> RGB).
void u16x3_to_f32(const uint16_t* src, float* dst, int64_t npx, int swap) {
  const float k = 1.0f / 65536.0f;
  parallel_for(npx, [=](int64_t lo, int64_t hi) {
    if (swap) {
      for (int64_t i = lo; i < hi; ++i) {
        dst[i * 3 + 0] = src[i * 3 + 2] * k;
        dst[i * 3 + 1] = src[i * 3 + 1] * k;
        dst[i * 3 + 2] = src[i * 3 + 0] * k;
      }
    } else {
      for (int64_t i = lo; i < hi; ++i) {
        dst[i * 3 + 0] = src[i * 3 + 0] * k;
        dst[i * 3 + 1] = src[i * 3 + 1] * k;
        dst[i * 3 + 2] = src[i * 3 + 2] * k;
      }
    }
  });
}

// float32 (npx, 3) in [0,1] -> uint16 interleaved, scale 65536 clamped
// to 65535 (reference toOutput semantics, imageProcess.py:245-257),
// optional channel swap.
void f32x3_to_u16(const float* src, uint16_t* dst, int64_t npx, int swap) {
  parallel_for(npx, [=](int64_t lo, int64_t hi) {
    auto conv = [](float v) -> uint16_t {
      float x = v * 65536.0f;
      if (x < 0.0f) x = 0.0f;
      if (x > 65535.0f) x = 65535.0f;
      return static_cast<uint16_t>(x);
    };
    if (swap) {
      for (int64_t i = lo; i < hi; ++i) {
        dst[i * 3 + 0] = conv(src[i * 3 + 2]);
        dst[i * 3 + 1] = conv(src[i * 3 + 1]);
        dst[i * 3 + 2] = conv(src[i * 3 + 0]);
      }
    } else {
      for (int64_t i = lo; i < hi; ++i) {
        dst[i * 3 + 0] = conv(src[i * 3 + 0]);
        dst[i * 3 + 1] = conv(src[i * 3 + 1]);
        dst[i * 3 + 2] = conv(src[i * 3 + 2]);
      }
    }
  });
}

// uint8 interleaved (npx, c) -> float32, scale 1/255 (image path).
void u8_to_f32(const uint8_t* src, float* dst, int64_t n) {
  const float k = 1.0f / 255.0f;
  parallel_for(n, [=](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) dst[i] = src[i] * k;
  });
}

// float32 in [0,1] -> uint8, scale 256 clamped to 255.
void f32_to_u8(const float* src, uint8_t* dst, int64_t n) {
  parallel_for(n, [=](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      float x = src[i] * 256.0f;
      if (x < 0.0f) x = 0.0f;
      if (x > 255.0f) x = 255.0f;
      dst[i] = static_cast<uint8_t>(x);
    }
  });
}

}  // extern "C"
