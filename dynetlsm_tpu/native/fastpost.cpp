// Native posterior post-processing kernels.
//
// The reference's Cython tier accelerates the likelihood inner loops; here
// the device (XLA/Pallas) owns the likelihoods, so the native tier instead
// accelerates the host-side posterior reductions that scan every stored
// sample: occupied-cluster counts (reference approx_bic.py:27-53) and
// co-clustering accumulation (reference label_utils.py:40-62).  These are
// O(S * T * n) / O(S * n^2) passes over trace arrays that can hold millions
// of samples once chains are vmapped.
//
// Plain C ABI (extern "C") loaded through ctypes; no CPython API needed.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Occupied distinct labels per sample.
// z: (S, m) int32 labels flattened per sample, values in [0, K).
// out: (S,) int32 occupied-cluster counts.
void cluster_counts(const int32_t* z, int64_t S, int64_t m, int64_t K,
                    int32_t* out) {
    std::vector<uint8_t> seen(static_cast<size_t>(K));
    for (int64_t s = 0; s < S; ++s) {
        std::memset(seen.data(), 0, static_cast<size_t>(K));
        const int32_t* row = z + s * m;
        int32_t count = 0;
        for (int64_t i = 0; i < m; ++i) {
            int32_t v = row[i];
            if (v >= 0 && v < K && !seen[v]) {
                seen[v] = 1;
                ++count;
            }
        }
        out[s] = count;
    }
}

// Occupied distinct labels per (time, sample).
// z: (S, T, n) int32; out: (T, S) int32.
void cluster_counts_t(const int32_t* z, int64_t S, int64_t T, int64_t n,
                      int64_t K, int32_t* out) {
    std::vector<uint8_t> seen(static_cast<size_t>(K));
    for (int64_t s = 0; s < S; ++s) {
        for (int64_t t = 0; t < T; ++t) {
            std::memset(seen.data(), 0, static_cast<size_t>(K));
            const int32_t* row = z + (s * T + t) * n;
            int32_t count = 0;
            for (int64_t i = 0; i < n; ++i) {
                int32_t v = row[i];
                if (v >= 0 && v < K && !seen[v]) {
                    seen[v] = 1;
                    ++count;
                }
            }
            out[t * S + s] = count;
        }
    }
}

// Posterior co-clustering accumulation at one time step.
// z: (S, n) int32; out: (n, n) float64 accumulated counts (caller divides
// by S).  Group-bucketing makes this O(S * (n + sum_k n_k^2)) instead of
// the dense O(S * n * K + n^2 K) one-hot einsum.
void cooccurrence(const int32_t* z, int64_t S, int64_t n, int64_t K,
                  double* out) {
    std::memset(out, 0, sizeof(double) * static_cast<size_t>(n * n));
    std::vector<std::vector<int32_t>> buckets(static_cast<size_t>(K));
    for (int64_t s = 0; s < S; ++s) {
        const int32_t* row = z + s * n;
        for (auto& b : buckets) b.clear();
        for (int64_t i = 0; i < n; ++i) {
            int32_t v = row[i];
            if (v >= 0 && v < K) buckets[v].push_back(static_cast<int32_t>(i));
        }
        for (const auto& b : buckets) {
            for (size_t a = 0; a < b.size(); ++a) {
                double* row_out = out + static_cast<int64_t>(b[a]) * n;
                for (size_t c = 0; c < b.size(); ++c) {
                    row_out[b[c]] += 1.0;
                }
            }
        }
    }
}

}  // extern "C"
