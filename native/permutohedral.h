// Permutohedral lattice for high-dimensional Gaussian filtering.
//
// From-scratch implementation of Adams, Baek & Davis, "Fast
// High-Dimensional Filtering Using the Permutohedral Lattice"
// (Eurographics 2010) — the data structure behind the reference's only
// native algorithmic dependency (pydensecrf's densecrf C++ core, used at
// 03c_hsn/utilities.py:399-445 and the SEC/DSRG/IRNet CRF call sites).
//
// This is the CPU-native counterpart of wsss_tpu/ops/crf/meanfield.py's
// on-TPU structures; tests validate both against the same exact O(N^2)
// spec (wsss_tpu/ops/crf/reference.py).
#pragma once

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace wsss {

// Hash for a lattice key of `kd` int16 coordinates.
struct KeyHash {
  size_t operator()(const std::vector<int16_t>& k) const {
    size_t h = 14695981039346656037ull;
    for (int16_t v : k) {
      h ^= static_cast<size_t>(static_cast<uint16_t>(v));
      h *= 1099511628211ull;
    }
    return h;
  }
};

class Permutohedral {
 public:
  // positions: n x fd feature vectors (already divided by their sigmas).
  void init(const float* positions, int n, int fd) {
    n_ = n;
    fd_ = fd;
    const int d1 = fd + 1;
    offsets_.assign(static_cast<size_t>(n) * d1, 0);
    barycentric_.assign(static_cast<size_t>(n) * d1, 0.f);

    std::vector<float> scale_factor(fd);
    // Scale features so that the blur over the lattice approximates a
    // unit-variance Gaussian (Adams et al. eq. 6 normalization).
    const float inv_std_dev = std::sqrt(2.0f / 3.0f) * d1;
    for (int i = 0; i < fd; ++i)
      scale_factor[i] = 1.0f / std::sqrt(float(i + 2) * float(i + 1)) *
                        inv_std_dev;

    std::unordered_map<std::vector<int16_t>, int, KeyHash> hash;
    hash.reserve(static_cast<size_t>(n) * 2);

    std::vector<float> elevated(d1), rem0(d1), barycentric(fd + 2);
    std::vector<int> rank(d1);
    std::vector<int16_t> key(fd);

    for (int p = 0; p < n; ++p) {
      const float* f = positions + static_cast<size_t>(p) * fd;
      // --- embed into the hyperplane H_d (sum of coords = 0)
      float sm = 0;
      for (int j = fd; j > 0; --j) {
        float cf = f[j - 1] * scale_factor[j - 1];
        elevated[j] = sm - j * cf;
        sm += cf;
      }
      elevated[0] = sm;

      // --- nearest 0-colored remainder point
      const float down = 1.0f / d1;
      for (int i = 0; i < d1; ++i)
        rem0[i] = std::round(elevated[i] * down) * d1;

      // --- rank differentials to find the simplex permutation
      int sum = 0;
      for (int i = 0; i < d1; ++i) sum += static_cast<int>(rem0[i] * down);
      for (int i = 0; i < d1; ++i) rank[i] = 0;
      for (int i = 0; i < d1; ++i) {
        double di = elevated[i] - rem0[i];
        for (int j = i + 1; j < d1; ++j) {
          double dj = elevated[j] - rem0[j];
          if (di < dj)
            ++rank[i];
          else
            ++rank[j];
        }
      }
      // fix points that round outside the canonical simplex
      for (int i = 0; i < d1; ++i) {
        rank[i] += sum;
        if (rank[i] < 0) {
          rank[i] += d1;
          rem0[i] += d1;
        } else if (rank[i] > fd) {
          rank[i] -= d1;
          rem0[i] -= d1;
        }
      }

      // --- barycentric coordinates
      std::fill(barycentric.begin(), barycentric.end(), 0.f);
      for (int i = 0; i < d1; ++i) {
        float v = (elevated[i] - rem0[i]) * down;
        barycentric[fd - rank[i]] += v;
        barycentric[fd + 1 - rank[i]] -= v;
      }
      barycentric[0] += 1.0f + barycentric[d1];

      // --- register the d+1 simplex vertices
      for (int remainder = 0; remainder < d1; ++remainder) {
        for (int i = 0; i < fd; ++i) {
          int16_t ki = static_cast<int16_t>(rem0[i] + remainder);
          if (rank[i] > fd - remainder) ki -= static_cast<int16_t>(d1);
          key[i] = ki;
        }
        auto it = hash.find(key);
        int idx;
        if (it == hash.end()) {
          idx = static_cast<int>(keys_.size());
          hash.emplace(key, idx);
          keys_.push_back(key);
        } else {
          idx = it->second;
        }
        offsets_[static_cast<size_t>(p) * d1 + remainder] = idx;
        barycentric_[static_cast<size_t>(p) * d1 + remainder] =
            barycentric[remainder];
      }
    }
    m_ = static_cast<int>(keys_.size());

    // --- precompute blur neighbors along each lattice direction
    blur_n1_.assign(static_cast<size_t>(m_) * d1, -1);
    blur_n2_.assign(static_cast<size_t>(m_) * d1, -1);
    std::vector<int16_t> np(fd), nm(fd);
    for (int j = 0; j < d1; ++j) {
      for (int i = 0; i < m_; ++i) {
        const auto& k = keys_[i];
        for (int c = 0; c < fd; ++c) {
          np[c] = static_cast<int16_t>(k[c] + 1);
          nm[c] = static_cast<int16_t>(k[c] - 1);
        }
        if (j < fd) {
          np[j] = static_cast<int16_t>(k[j] - fd);
          nm[j] = static_cast<int16_t>(k[j] + fd);
        }
        auto itp = hash.find(np);
        auto itm = hash.find(nm);
        blur_n1_[static_cast<size_t>(i) * d1 + j] =
            itm == hash.end() ? -1 : itm->second;
        blur_n2_[static_cast<size_t>(i) * d1 + j] =
            itp == hash.end() ? -1 : itp->second;
      }
    }
  }

  // out = K @ values (vd channels), including the self term.
  void compute(const float* values, int vd, float* out,
               bool reverse_unused = false) const {
    const int d1 = fd_ + 1;
    std::vector<float> data(static_cast<size_t>(m_ + 1) * vd, 0.f);
    std::vector<float> buf(static_cast<size_t>(m_ + 1) * vd, 0.f);

    // splat
    for (int p = 0; p < n_; ++p) {
      for (int r = 0; r < d1; ++r) {
        int o = offsets_[static_cast<size_t>(p) * d1 + r];
        float w = barycentric_[static_cast<size_t>(p) * d1 + r];
        float* dst = data.data() + static_cast<size_t>(o) * vd;
        const float* src = values + static_cast<size_t>(p) * vd;
        for (int c = 0; c < vd; ++c) dst[c] += w * src[c];
      }
    }

    // blur: [1,2,1]/2 along each of the d+1 lattice directions
    for (int j = 0; j < d1; ++j) {
      for (int i = 0; i < m_; ++i) {
        const float* self = data.data() + static_cast<size_t>(i) * vd;
        int i1 = blur_n1_[static_cast<size_t>(i) * d1 + j];
        int i2 = blur_n2_[static_cast<size_t>(i) * d1 + j];
        const float* v1 =
            data.data() + static_cast<size_t>(i1 < 0 ? m_ : i1) * vd;
        const float* v2 =
            data.data() + static_cast<size_t>(i2 < 0 ? m_ : i2) * vd;
        float* dst = buf.data() + static_cast<size_t>(i) * vd;
        for (int c = 0; c < vd; ++c)
          dst[c] = self[c] + 0.5f * (v1[c] + v2[c]);
      }
      std::swap(data, buf);
    }

    // slice (alpha corrects the blur gain, Adams et al. §5)
    const float alpha = 1.0f / (1.0f + std::pow(2.0f, -fd_));
    for (int p = 0; p < n_; ++p) {
      float* dst = out + static_cast<size_t>(p) * vd;
      for (int c = 0; c < vd; ++c) dst[c] = 0.f;
      for (int r = 0; r < d1; ++r) {
        int o = offsets_[static_cast<size_t>(p) * d1 + r];
        float w = barycentric_[static_cast<size_t>(p) * d1 + r];
        const float* src = data.data() + static_cast<size_t>(o) * vd;
        for (int c = 0; c < vd; ++c) dst[c] += w * src[c] * alpha;
      }
    }
  }

  int lattice_size() const { return m_; }

 private:
  int n_ = 0, fd_ = 0, m_ = 0;
  std::vector<std::vector<int16_t>> keys_;
  std::vector<int> offsets_;
  std::vector<float> barycentric_;
  std::vector<int> blur_n1_, blur_n2_;
};

}  // namespace wsss
