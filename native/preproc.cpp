// Native host-side mask preprocessing for the ACFM-TPU input pipeline.
//
// Replaces the per-step scipy/skimage work the reference does on the host
// (multiframe/main.py:364-377: distance transforms, barrier DT, boundary
// point extraction per mask per batch — its known CPU bottleneck) with a
// vectorizable C++ implementation, exposed via a C ABI for ctypes
// (data/native.py). Exact Euclidean DT: Felzenszwalb & Huttenlocher's
// two-pass lower-envelope algorithm (squared distances, then sqrt).
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC [-fopenmp]).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();

// 1-D squared-distance transform of a sampled function f (lower envelope of
// parabolas). Output d[q] = min_p (q - p)^2 + f[p].
void edt_1d(const float* f, int n, float* d, int* v, float* z) {
  int k = 0;
  v[0] = 0;
  z[0] = -kInf;
  z[1] = kInf;
  for (int q = 1; q < n; q++) {
    if (f[q] == kInf) continue;
    float s;
    while (true) {
      if (f[v[k]] == kInf) {
        // previous parabola is absent; replace it
        if (k > 0) { k--; continue; }
        v[k] = q;
        z[k] = -kInf;
        z[k + 1] = kInf;
        break;
      }
      s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) / (2.f * q - 2.f * v[k]);
      if (s <= z[k]) {
        k--;
        if (k < 0) { k = 0; v[0] = q; z[0] = -kInf; z[1] = kInf; break; }
        continue;
      }
      k++;
      v[k] = q;
      z[k] = s;
      z[k + 1] = kInf;
      break;
    }
  }
  k = 0;
  for (int q = 0; q < n; q++) {
    while (z[k + 1] < q) k++;
    float dp = q - v[k];
    d[q] = (f[v[k]] == kInf) ? kInf : dp * dp + f[v[k]];
  }
}

// 2-D squared EDT of the zero-set given an indicator (nonzero = "inside the
// set", distance 0 there).
void edt_2d(const uint8_t* indicator, int h, int w, float* out) {
  std::vector<float> f(std::max(h, w));
  std::vector<float> d(std::max(h, w));
  std::vector<int> v(std::max(h, w));
  std::vector<float> z(std::max(h, w) + 1);

  // columns first
  for (int x = 0; x < w; x++) {
    for (int y = 0; y < h; y++) f[y] = indicator[y * w + x] ? 0.f : kInf;
    edt_1d(f.data(), h, d.data(), v.data(), z.data());
    for (int y = 0; y < h; y++) out[y * w + x] = d[y];
  }
  // then rows
  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++) f[x] = out[y * w + x];
    edt_1d(f.data(), w, d.data(), v.data(), z.data());
    for (int x = 0; x < w; x++) out[y * w + x] = d[x];
  }
}

}  // namespace

extern "C" {

// DT of the mask complement: distance from each pixel to the mask. norm=1
// divides by max(h, w). Matches utils/image.py compute_dt.
void acfm_compute_dt(const uint8_t* mask, int h, int w, int norm, float* out) {
  edt_2d(mask, h, w, out);
  float scale = norm ? 1.0f / float(h > w ? h : w) : 1.0f;
  for (int i = 0; i < h * w; i++)
    out[i] = (out[i] == kInf) ? kInf : std::sqrt(out[i]) * scale;
}

// Barrier DT: sigmoid(k * (dist_out - dist_in) / max(h, w)).
// Matches utils/image.py compute_dt_barrier.
void acfm_compute_dt_barrier(const uint8_t* mask, int h, int w, float k,
                             float* out) {
  std::vector<float> din(h * w), dout(h * w);
  std::vector<uint8_t> inv(h * w);
  for (int i = 0; i < h * w; i++) inv[i] = mask[i] ? 0 : 1;
  edt_2d(mask, h, w, dout.data());     // distance to mask (0 inside)
  edt_2d(inv.data(), h, w, din.data()); // distance to complement
  float m = float(h > w ? h : w);
  for (int i = 0; i < h * w; i++) {
    float o = (dout[i] == kInf) ? 0.f : std::sqrt(dout[i]);
    float in = (din[i] == kInf) ? 0.f : std::sqrt(din[i]);
    float diff = (o - in) / m;
    out[i] = 1.0f / (1.0f + std::exp(-k * diff));
  }
}

// 'Thick' boundary points (4-neighborhood): pixels where dilation(mask) !=
// erosion(mask). Writes up to max_pts (row, col) int32 pairs; returns count.
int acfm_compute_boundaries(const uint8_t* mask, int h, int w,
                            int32_t* out_rowcol, int max_pts) {
  int count = 0;
  auto at = [&](int y, int x) -> uint8_t {
    if (y < 0 || y >= h || x < 0 || x >= w) return 0;
    return mask[y * w + x] ? 1 : 0;
  };
  for (int y = 0; y < h && count < max_pts; y++) {
    for (int x = 0; x < w && count < max_pts; x++) {
      uint8_t c = at(y, x);
      uint8_t up = at(y - 1, x), dn = at(y + 1, x), lf = at(y, x - 1),
              rt = at(y, x + 1);
      // dilation: any of the cross set; erosion: all of the cross set
      // (border treated as outside for dilation, as in binary_erosion with
      // border_value handled by find_boundaries' padding semantics)
      uint8_t dil = c | up | dn | lf | rt;
      uint8_t ero = c & up & dn & lf & rt;
      if (dil != ero) {
        out_rowcol[2 * count] = y;
        out_rowcol[2 * count + 1] = x;
        count++;
      }
    }
  }
  return count;
}

// Batched all-in-one: for B masks compute edt (unnormalized), barrier dt and
// padded boundary lists ([-1,1] x,y,valid triples).
void acfm_preprocess_masks(const uint8_t* masks, int b, int h, int w,
                           float barrier_k, int max_pts, float* edt_out,
                           float* bdt_out, float* boundaries_out) {
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int i = 0; i < b; i++) {
    const uint8_t* m = masks + (size_t)i * h * w;
    acfm_compute_dt(m, h, w, /*norm=*/0, edt_out + (size_t)i * h * w);
    // bdt_out may be null: the training path skips the barrier DT (the
    // reference computes it per step but never consumes it)
    if (bdt_out != nullptr)
      acfm_compute_dt_barrier(m, h, w, barrier_k, bdt_out + (size_t)i * h * w);
    std::vector<int32_t> pts(2 * max_pts);
    int n = acfm_compute_boundaries(m, h, w, pts.data(), max_pts);
    float* out = boundaries_out + (size_t)i * max_pts * 3;
    for (int p = 0; p < max_pts; p++) {
      if (p < n) {
        out[3 * p + 0] = (pts[2 * p + 1] / float(w) - 0.5f) * 2.0f;  // x
        out[3 * p + 1] = (pts[2 * p + 0] / float(h) - 0.5f) * 2.0f;  // y
        out[3 * p + 2] = 1.0f;
      } else {
        out[3 * p + 0] = 0.f;
        out[3 * p + 1] = 0.f;
        out[3 * p + 2] = 0.f;
      }
    }
  }
}

}  // extern "C"
