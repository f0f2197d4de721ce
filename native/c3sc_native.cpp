// Native runtime components for c3sc_tpu.
//
// TPU-native framework policy: the compute path is JAX/XLA (device code),
// but host-side runtime pieces mirror the reference's native implementation
// language. The reference is C throughout (SURVEY.md §2); the two pieces
// re-implemented natively here are the ones its host runtime actually owns:
//
//  1. maxvol pivot selection (reference: C3 qmarray_maxvol1d,
//     src/lib_clinalg — line n/a, empty mount): greedy determinant-volume
//     maximization used by the host cross-approximation path.
//  2. Compact binary tensor-train (de)serialization (reference:
//     function_train_save / valuef_save, C3 src/lib_clinalg/ft.c): active
//     rank blocks only — much smaller than padded npz for checkpoints.
//
// Built as a plain C ABI shared library consumed via ctypes
// (pybind11 unavailable in this environment).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- maxvol ---

// Greedy maxvol: choose r rows of A (m x r, row-major) maximizing |det| of
// the selected submatrix. Seeded by partial-pivoted LU, refined by swap
// iterations on B = A * inv(A[rows]) until max |B_ij| <= 1 + tol or
// max_iters. Returns the number of refinement swaps performed, or -1 on a
// singular submatrix.
int c3sc_maxvol(const double* A, int64_t m, int64_t r, int64_t* rows,
                double tol, int max_iters) {
  if (m < r || r <= 0) return -1;
  std::vector<double> lu(A, A + m * r);
  std::vector<int64_t> perm(m);
  for (int64_t i = 0; i < m; ++i) perm[i] = i;
  // partial-pivoted LU on the m x r matrix -> first r entries of perm
  for (int64_t k = 0; k < r; ++k) {
    int64_t p = k;
    double best = std::fabs(lu[perm[k] * r + k]);
    for (int64_t i = k + 1; i < m; ++i) {
      double v = std::fabs(lu[perm[i] * r + k]);
      if (v > best) { best = v; p = i; }
    }
    if (best == 0.0) return -1;
    std::swap(perm[k], perm[p]);
    const double piv = lu[perm[k] * r + k];
    for (int64_t i = k + 1; i < m; ++i) {
      const double f = lu[perm[i] * r + k] / piv;
      lu[perm[i] * r + k] = f;
      for (int64_t j = k + 1; j < r; ++j)
        lu[perm[i] * r + j] -= f * lu[perm[k] * r + j];
    }
  }
  for (int64_t k = 0; k < r; ++k) rows[k] = perm[k];

  // refinement: B = A * inv(A[rows]); swap (i*, j*) while |B| > 1 + tol.
  // inv via Gauss-Jordan on the r x r submatrix each round (r is small).
  std::vector<double> sub(r * r), inv(r * r), B(m * r);
  int swaps = 0;
  for (int it = 0; it < max_iters; ++it) {
    for (int64_t i = 0; i < r; ++i)
      std::memcpy(&sub[i * r], &A[rows[i] * r], r * sizeof(double));
    // Gauss-Jordan inverse
    for (int64_t i = 0; i < r * r; ++i) inv[i] = 0.0;
    for (int64_t i = 0; i < r; ++i) inv[i * r + i] = 1.0;
    std::vector<double> w(sub);
    for (int64_t c = 0; c < r; ++c) {
      int64_t p = c;
      double best = std::fabs(w[c * r + c]);
      for (int64_t i = c + 1; i < r; ++i) {
        double v = std::fabs(w[i * r + c]);
        if (v > best) { best = v; p = i; }
      }
      if (best < 1e-300) return -1;
      if (p != c) {
        for (int64_t j = 0; j < r; ++j) {
          std::swap(w[c * r + j], w[p * r + j]);
          std::swap(inv[c * r + j], inv[p * r + j]);
        }
      }
      const double piv = w[c * r + c];
      for (int64_t j = 0; j < r; ++j) { w[c * r + j] /= piv; inv[c * r + j] /= piv; }
      for (int64_t i = 0; i < r; ++i) {
        if (i == c) continue;
        const double f = w[i * r + c];
        if (f == 0.0) continue;
        for (int64_t j = 0; j < r; ++j) {
          w[i * r + j] -= f * w[c * r + j];
          inv[i * r + j] -= f * inv[c * r + j];
        }
      }
    }
    // B = A * inv
    double bmax = 0.0;
    int64_t bi = 0, bj = 0;
    for (int64_t i = 0; i < m; ++i) {
      for (int64_t j = 0; j < r; ++j) {
        double acc = 0.0;
        for (int64_t k = 0; k < r; ++k) acc += A[i * r + k] * inv[k * r + j];
        B[i * r + j] = acc;
        const double v = std::fabs(acc);
        if (v > bmax) { bmax = v; bi = i; bj = j; }
      }
    }
    if (bmax <= 1.0 + tol) break;
    rows[bj] = bi;
    ++swaps;
  }
  return swaps;
}

// ------------------------------------------------------- TT serialization ---

// Format: magic "C3TT" | uint32 version | uint32 dtype (0=f32,1=f64) |
// int64 d | int64 ranks[d+1] | int64 n[d] | cores (active blocks,
// row-major [ranks[k], n[k], ranks[k+1]], concatenated).

static const char kMagic[4] = {'C', '3', 'T', 'T'};

int c3sc_tt_save(const char* path, int64_t d, const int64_t* ranks,
                 const int64_t* n, const float** cores) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  uint32_t version = 1, dtype = 0;
  std::fwrite(kMagic, 1, 4, f);
  std::fwrite(&version, 4, 1, f);
  std::fwrite(&dtype, 4, 1, f);
  std::fwrite(&d, 8, 1, f);
  std::fwrite(ranks, 8, d + 1, f);
  std::fwrite(n, 8, d, f);
  for (int64_t k = 0; k < d; ++k) {
    const int64_t sz = ranks[k] * n[k] * ranks[k + 1];
    if ((int64_t)std::fwrite(cores[k], 4, sz, f) != sz) { std::fclose(f); return -2; }
  }
  std::fclose(f);
  return 0;
}

// Reads the header: caller allocates, then calls c3sc_tt_load_cores.
int c3sc_tt_load_header(const char* path, int64_t* d, int64_t* ranks_out,
                        int64_t* n_out, int64_t max_d) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char magic[4];
  uint32_t version, dtype;
  if (std::fread(magic, 1, 4, f) != 4 || std::memcmp(magic, kMagic, 4) != 0) {
    std::fclose(f); return -2;
  }
  if (std::fread(&version, 4, 1, f) != 1 || std::fread(&dtype, 4, 1, f) != 1 ||
      std::fread(d, 8, 1, f) != 1 || *d > max_d) {
    std::fclose(f); return -3;
  }
  if ((int64_t)std::fread(ranks_out, 8, *d + 1, f) != *d + 1 ||
      (int64_t)std::fread(n_out, 8, *d, f) != *d) {
    std::fclose(f); return -4;
  }
  std::fclose(f);
  return 0;
}

int c3sc_tt_load_cores(const char* path, int64_t d, const int64_t* ranks,
                       const int64_t* n, float** cores_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 4 + 4 + 4 + 8 + 8 * (d + 1) + 8 * d, SEEK_SET);
  for (int64_t k = 0; k < d; ++k) {
    const int64_t sz = ranks[k] * n[k] * ranks[k + 1];
    if ((int64_t)std::fread(cores_out[k], 4, sz, f) != sz) {
      std::fclose(f); return -2;
    }
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"
