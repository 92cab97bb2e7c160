// Native surface-distance kernels (HD percentile / MSD) for eval.
//
// TPU-native equivalent of the reference's vendored C++/CUDA extension layer
// (SURVEY.md 2.8): the hot *host-side* path in evaluation is the
// surface-distance metric over 99 thresholds per image
// (/root/reference/model/engine/inference.py:293-336), each needing two
// exact EDTs. This library computes the whole (B, T) bank with
// Felzenszwalb-Huttenlocher exact EDT and marching-squares contour lengths,
// parallelised over (image, threshold) pairs with std::thread.
//
// Exposed C ABI (ctypes):
//   csbsr_surface_metrics(preds BxTxHxW u8, gts Bx1xHxW u8, B, T, H, W,
//                         percentile, hd_out BxT f64, msd_out BxT f64,
//                         n_threads)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

// 1-D squared EDT lower envelope (Felzenszwalb & Huttenlocher 2012).
void edt_1d(const double* f, int n, double* d, int* v, double* z) {
  int k = 0;
  v[0] = 0;
  z[0] = -kInf;
  z[1] = kInf;
  for (int q = 1; q < n; ++q) {
    if (f[q] == kInf) continue;
    double s;
    while (true) {
      if (f[v[k]] == kInf) {
        // previous parabola is absent: replace it
        if (k > 0) { --k; continue; }
        v[0] = q; z[0] = -kInf; z[1] = kInf; goto placed;
      }
      s = ((f[q] + q * (double)q) - (f[v[k]] + v[k] * (double)v[k])) /
          (2.0 * q - 2.0 * v[k]);
      if (s <= z[k]) { --k; } else break;
    }
    ++k;
    v[k] = q;
    z[k] = s;
    z[k + 1] = kInf;
  placed:;
  }
  k = 0;
  for (int q = 0; q < n; ++q) {
    while (z[k + 1] < q) ++k;
    if (f[v[k]] == kInf) { d[q] = kInf; continue; }
    double dq = q - (double)v[k];
    d[q] = dq * dq + f[v[k]];
  }
}

// Exact squared EDT of "distance to nearest true pixel" for an H x W mask.
void edt_2d(const uint8_t* mask, int h, int w, double* out) {
  std::vector<double> f(std::max(h, w)), d(std::max(h, w));
  std::vector<int> v(std::max(h, w));
  std::vector<double> z(std::max(h, w) + 1);
  // column pass
  for (int x = 0; x < w; ++x) {
    for (int y = 0; y < h; ++y) f[y] = mask[y * w + x] ? 0.0 : kInf;
    edt_1d(f.data(), h, d.data(), v.data(), z.data());
    for (int y = 0; y < h; ++y) out[y * w + x] = d[y];
  }
  // row pass
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) f[x] = out[y * w + x];
    edt_1d(f.data(), w, d.data(), v.data(), z.data());
    for (int x = 0; x < w; ++x) out[y * w + x] = d[x];
  }
}

// Marching-squares 2x2 neighbourhood code with kernel [[8,4],[2,1]].
// scipy.ndimage.correlate centers an even kernel at index 1, i.e. the window
// is (y-1..y, x-1..x) with zero padding; we match that convention (and the
// reference's DeepMind package) exactly.
inline int neighbour_code(const uint8_t* m, int h, int w, int y, int x) {
  auto at = [&](int yy, int xx) -> int {
    if (yy < 0 || yy >= h || xx < 0 || xx >= w) return 0;
    return m[yy * w + xx] ? 1 : 0;
  };
  return 8 * at(y - 1, x - 1) + 4 * at(y - 1, x) + 2 * at(y, x - 1) + at(y, x);
}

void contour_table(double* table) {
  const double diag = 0.5 * std::sqrt(2.0);
  for (int c = 0; c < 16; ++c) table[c] = 0.0;
  const int singles[] = {1, 2, 4, 8, 7, 11, 13, 14};
  for (int c : singles) table[c] = diag;
  table[0b0101] = 1.0;
  table[0b1010] = 1.0;
  table[0b0011] = 1.0;
  table[0b1100] = 1.0;
  table[0b0110] = 2 * diag;
  table[0b1001] = 2 * diag;
}

struct SurfKit {
  std::vector<uint8_t> border;
  std::vector<double> area;
  std::vector<double> dist;  // EDT of the border (distances in pixels)
  bool any = false;
};

void build_surface(const uint8_t* m, int h, int w, const double* table, SurfKit& kit) {
  // Code grid is (h+1) x (w+1): window (y-1..y, x-1..x) for y in 0..h - the
  // extra row/col covers the transition windows just past objects touching
  // the bottom/right image edge (the DeepMind package's zero-padded crop).
  const int gh = h + 1, gw = w + 1;
  kit.border.assign(gh * gw, 0);
  kit.area.assign(gh * gw, 0.0);
  kit.any = false;
  for (int y = 0; y < gh; ++y) {
    for (int x = 0; x < gw; ++x) {
      int code = neighbour_code(m, h, w, y, x);
      if (code != 0 && code != 15) {
        kit.border[y * gw + x] = 1;
        kit.any = true;
      }
      kit.area[y * gw + x] = table[code];
    }
  }
  kit.dist.assign(gh * gw, kInf);
  if (kit.any) {
    edt_2d(kit.border.data(), gh, gw, kit.dist.data());
    for (auto& d : kit.dist) d = std::sqrt(d);
  }
}

struct DistArea {
  double d, a;
};

void metrics_pair(const uint8_t* gt, const uint8_t* pred, int h, int w,
                  double percentile, double outlier, double* hd, double* msd) {
  double table[16];
  contour_table(table);
  SurfKit kg, kp;
  build_surface(gt, h, w, table, kg);
  build_surface(pred, h, w, table, kp);

  if (!kg.any && !kp.any) {
    *hd = 0.0;
    *msd = 0.0;
    return;
  }
  if (!kg.any || !kp.any) {
    *hd = outlier;
    *msd = outlier;
    return;
  }

  auto collect = [&](const SurfKit& own, const SurfKit& other,
                     std::vector<DistArea>& out, double& area_sum,
                     double& weighted_sum) {
    out.clear();
    area_sum = 0.0;
    weighted_sum = 0.0;
    for (int i = 0; i < (h + 1) * (w + 1); ++i) {
      if (own.border[i]) {
        double a = own.area[i];
        double d = other.dist[i];
        out.push_back({d, a});
        area_sum += a;
        weighted_sum += a * d;
      }
    }
    std::sort(out.begin(), out.end(),
              [](const DistArea& l, const DistArea& r) { return l.d < r.d; });
  };

  std::vector<DistArea> g2p, p2g;
  double ag, wg, ap, wp;
  collect(kg, kp, g2p, ag, wg);
  collect(kp, kg, p2g, ap, wp);

  auto percentile_of = [&](const std::vector<DistArea>& v, double total) {
    if (v.empty()) return outlier;
    double cum = 0.0;
    double target = percentile / 100.0;
    for (size_t i = 0; i < v.size(); ++i) {
      cum += v[i].a / total;
      if (cum >= target) return v[i].d;
    }
    return v.back().d;
  };

  *hd = std::max(percentile_of(g2p, ag), percentile_of(p2g, ap));
  if (ag == 0.0 && ap == 0.0) {
    *msd = 0.0;
  } else if (ag == 0.0 || ap == 0.0) {
    *msd = outlier;
  } else {
    *msd = 0.5 * (wg / ag + wp / ap);
  }
}

}  // namespace

extern "C" {

void csbsr_edt(const uint8_t* mask, int h, int w, double* out) {
  edt_2d(mask, h, w, out);
  for (int i = 0; i < h * w; ++i) out[i] = std::sqrt(out[i]);
}

void csbsr_surface_metrics(const uint8_t* preds, const uint8_t* gts, int b,
                           int t, int h, int w, double percentile,
                           double* hd_out, double* msd_out, int n_threads) {
  const double outlier = (double)std::max(h, w);
  std::atomic<int> next(0);
  int total = b * t;
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  n_threads = std::max(1, std::min(n_threads, total));

  auto worker = [&]() {
    while (true) {
      int job = next.fetch_add(1);
      if (job >= total) break;
      int bi = job / t;
      int ti = job % t;
      const uint8_t* gt = gts + (size_t)bi * h * w;
      const uint8_t* pred = preds + ((size_t)bi * t + ti) * h * w;
      metrics_pair(gt, pred, h, w, percentile, outlier, &hd_out[job],
                   &msd_out[job]);
    }
  };
  std::vector<std::thread> pool;
  for (int i = 0; i < n_threads; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"
