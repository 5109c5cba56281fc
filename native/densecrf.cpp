// CPU-native dense-CRF mean field over permutohedral lattices.
//
// The native runtime counterpart of the reference's pydensecrf dependency
// (03c_hsn/utilities.py:399-445; SEC/DSRG lib/crf; IRNet
// misc.imutils.crf_inference_label) and of wsss_tpu's on-TPU mean field:
// same update rule (Potts compatibility, symmetric normalization,
// optional self-exclusion), exposed via a C ABI for ctypes.
//
// Build: make -C native   (produces libwsssnative.so)

#include <cmath>
#include <cstring>
#include <vector>

#include "permutohedral.h"

namespace {

using wsss::Permutohedral;

void build_positions_spatial(int H, int W, float sxy,
                             std::vector<float>* pos) {
  pos->resize(static_cast<size_t>(H) * W * 2);
  for (int y = 0; y < H; ++y)
    for (int x = 0; x < W; ++x) {
      (*pos)[(static_cast<size_t>(y) * W + x) * 2 + 0] = x / sxy;
      (*pos)[(static_cast<size_t>(y) * W + x) * 2 + 1] = y / sxy;
    }
}

void build_positions_bilateral(const float* img, int H, int W, float sxy,
                               float srgb, std::vector<float>* pos) {
  pos->resize(static_cast<size_t>(H) * W * 5);
  for (int y = 0; y < H; ++y)
    for (int x = 0; x < W; ++x) {
      size_t p = static_cast<size_t>(y) * W + x;
      (*pos)[p * 5 + 0] = x / sxy;
      (*pos)[p * 5 + 1] = y / sxy;
      for (int c = 0; c < 3; ++c)
        (*pos)[p * 5 + 2 + c] = img[p * 3 + c] / srgb;
    }
}

// Symmetric-normalized message with optional self-exclusion:
//   m = n * K(n*Q) [- n^2 Q],   n = 1/sqrt(K 1)
struct Kernel {
  Permutohedral lattice;
  std::vector<float> norm;  // n_i

  void init_norm(int n) {
    std::vector<float> ones(n, 1.f), filtered(n);
    lattice.compute(ones.data(), 1, filtered.data());
    norm.resize(n);
    for (int i = 0; i < n; ++i)
      norm[i] = 1.0f / std::sqrt(std::max(filtered[i], 1e-20f));
  }

  void message(const float* Q, int n, int C, bool exclude_self,
               float* out, std::vector<float>* tmp) const {
    tmp->resize(static_cast<size_t>(n) * C);
    for (int i = 0; i < n; ++i)
      for (int c = 0; c < C; ++c)
        (*tmp)[static_cast<size_t>(i) * C + c] =
            norm[i] * Q[static_cast<size_t>(i) * C + c];
    lattice.compute(tmp->data(), C, out);
    for (int i = 0; i < n; ++i) {
      float ni = norm[i];
      for (int c = 0; c < C; ++c) {
        float v = out[static_cast<size_t>(i) * C + c] * ni;
        if (exclude_self)
          v -= ni * ni * Q[static_cast<size_t>(i) * C + c];
        out[static_cast<size_t>(i) * C + c] = v;
      }
    }
  }
};

void softmax_rows(float* logits, int n, int C) {
  for (int i = 0; i < n; ++i) {
    float* row = logits + static_cast<size_t>(i) * C;
    float mx = row[0];
    for (int c = 1; c < C; ++c) mx = std::max(mx, row[c]);
    float s = 0;
    for (int c = 0; c < C; ++c) {
      row[c] = std::exp(row[c] - mx);
      s += row[c];
    }
    for (int c = 0; c < C; ++c) row[c] /= s;
  }
}

}  // namespace

extern "C" {

// Gaussian filter through the lattice: out = K @ values.
// positions: n x fd (pre-scaled); values: n x vd.
void wsss_permutohedral_filter(const float* positions, const float* values,
                               int n, int fd, int vd, float* out) {
  Permutohedral lattice;
  lattice.init(positions, n, fd);
  lattice.compute(values, vd, out);
}

// Full mean-field inference.
// probs/img: HxWxC / HxWx3 row-major; out: HxWxC posterior.
void wsss_dense_crf(const float* probs, const float* img, int H, int W,
                    int C, float g_sxy, float g_compat, float bi_sxy,
                    float bi_srgb, float bi_compat, int iterations,
                    int exclude_self, float* out) {
  const int n = H * W;
  std::vector<float> U(static_cast<size_t>(n) * C);
  for (size_t i = 0; i < U.size(); ++i)
    U[i] = -std::log(std::max(probs[i], 1e-10f));

  std::vector<float> Q(U.size());
  for (size_t i = 0; i < U.size(); ++i) Q[i] = -U[i];
  softmax_rows(Q.data(), n, C);

  Kernel gk, bk;
  std::vector<float> pos;
  if (g_compat != 0.f) {
    build_positions_spatial(H, W, g_sxy, &pos);
    gk.lattice.init(pos.data(), n, 2);
    gk.init_norm(n);
  }
  if (bi_compat != 0.f) {
    build_positions_bilateral(img, H, W, bi_sxy, bi_srgb, &pos);
    bk.lattice.init(pos.data(), n, 5);
    bk.init_norm(n);
  }

  std::vector<float> msg(U.size()), tmp, logits(U.size());
  for (int it = 0; it < iterations; ++it) {
    std::fill(logits.begin(), logits.end(), 0.f);
    if (g_compat != 0.f) {
      gk.message(Q.data(), n, C, exclude_self != 0, msg.data(), &tmp);
      for (size_t i = 0; i < U.size(); ++i) logits[i] += g_compat * msg[i];
    }
    if (bi_compat != 0.f) {
      bk.message(Q.data(), n, C, exclude_self != 0, msg.data(), &tmp);
      for (size_t i = 0; i < U.size(); ++i)
        logits[i] += bi_compat * msg[i];
    }
    for (size_t i = 0; i < U.size(); ++i) logits[i] -= U[i];
    softmax_rows(logits.data(), n, C);
    Q.swap(logits);
  }
  std::memcpy(out, Q.data(), U.size() * sizeof(float));
}

}  // extern "C"
