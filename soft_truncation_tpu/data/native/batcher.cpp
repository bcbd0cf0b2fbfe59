// Native batch assembler: fused gather + random-flip + uniform
// dequantization + scaling from a resident uint8 dataset into a float32
// NHWC batch, multi-threaded over batch items.
//
// TPU-native counterpart of the reference's host-side input work
// (datasets.py tf.data map/batch + run_lib.py:73-75 dequant/scaler +
// datasets.py:115-128 torch conversions): everything the host must do per
// batch happens here in one cache-friendly pass, keeping the input
// pipeline off the Python interpreter so it overlaps device steps.
//
// C ABI only (ctypes-friendly). Build: tools/build_native.sh or the
// auto-builder in soft_truncation_tpu/data/native/__init__.py.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// xorshift128+ — deterministic, per-item seeded
struct Rng {
  uint64_t s0, s1;
  explicit Rng(uint64_t seed) {
    // splitmix64 init
    uint64_t z = (seed + 0x9E3779B97F4A7C15ULL);
    auto mix = [](uint64_t z) {
      z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
      z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
      return z ^ (z >> 31);
    };
    s0 = mix(z);
    s1 = mix(z + 0x9E3779B97F4A7C15ULL);
  }
  inline uint64_t next() {
    uint64_t x = s0, y = s1;
    s0 = y;
    x ^= x << 23;
    s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s1 + y;
  }
  inline float uniform() {  // [0, 1)
    return (next() >> 40) * (1.0f / 16777216.0f);
  }
};

constexpr int kFlagRandomFlip = 1;
constexpr int kFlagUniformDequant = 2;
constexpr int kFlagCentered = 4;

void assemble_item(const uint8_t* data, int64_t h, int64_t w, int64_t c,
                   int64_t src_idx, int flags, uint64_t seed, float* out) {
  const uint8_t* src = data + src_idx * h * w * c;
  Rng rng(seed ^ (0xD1B54A32D192ED03ULL * (uint64_t)(src_idx + 1)));
  const bool flip = (flags & kFlagRandomFlip) && (rng.next() & 1);
  const bool dequant = flags & kFlagUniformDequant;
  const bool centered = flags & kFlagCentered;

  for (int64_t y = 0; y < h; ++y) {
    for (int64_t x = 0; x < w; ++x) {
      const int64_t sx = flip ? (w - 1 - x) : x;
      const uint8_t* px = src + (y * w + sx) * c;
      float* dst = out + (y * w + x) * c;
      for (int64_t k = 0; k < c; ++k) {
        float v = (float)px[k] / 255.0f;  // convert_image_dtype semantics
        if (dequant) v = (255.0f * v + rng.uniform()) / 256.0f;
        if (centered) v = v * 2.0f - 1.0f;
        dst[k] = v;
      }
    }
  }
}

}  // namespace

extern "C" {

// Gather `batch` items by `indices` from a [n, h, w, c] uint8 array into a
// float32 [batch, h, w, c] buffer with fused augment/dequant/scale.
void st_assemble_batch(const uint8_t* data, int64_t n, int64_t h, int64_t w,
                       int64_t c, const int64_t* indices, int64_t batch,
                       int flags, uint64_t seed, float* out,
                       int num_threads) {
  if (num_threads <= 1 || batch == 1) {
    for (int64_t i = 0; i < batch; ++i)
      assemble_item(data, h, w, c, indices[i], flags, seed + i,
                    out + i * h * w * c);
    return;
  }
  std::atomic<int64_t> counter{0};
  auto worker = [&]() {
    while (true) {
      int64_t i = counter.fetch_add(1);
      if (i >= batch) return;
      assemble_item(data, h, w, c, indices[i], flags, seed + i,
                    out + i * h * w * c);
    }
  };
  std::vector<std::thread> threads;
  int nt = num_threads < (int)batch ? num_threads : (int)batch;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// Fisher-Yates shuffle of an index buffer (epoch permutation).
void st_shuffle_indices(int64_t* indices, int64_t n, uint64_t seed) {
  Rng rng(seed);
  for (int64_t i = n - 1; i > 0; --i) {
    int64_t j = (int64_t)(rng.next() % (uint64_t)(i + 1));
    int64_t tmp = indices[i];
    indices[i] = indices[j];
    indices[j] = tmp;
  }
}

}  // extern "C"
