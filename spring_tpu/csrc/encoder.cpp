// Native consensus / noise / reconstruction kernels (encoder heart).
//
// Reference analog: buildcontig's majority vote (src/encoder.cpp:32-74),
// writecontig's per-read noise emission (src/encoder.cpp:76-109) and the
// decoder's seq.substr + noise-patch reconstruction
// (src/decompress.cpp:230-319). Redesign: the contigs are laid out in one
// concatenated coordinate space with globally nondecreasing read starts
// (encode/consensus.py builds that layout), so the consensus is an
// embarrassingly parallel span-owned counting pass and noise extraction is
// a flat parallel-for over reads — no per-contig serial walk.
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

inline int threads_or_default(int num_threads) {
#ifdef _OPENMP
  return num_threads > 0 ? num_threads : omp_get_max_threads();
#else
  (void)num_threads;
  return 1;
#endif
}

// oriented base k of read row (codes 0-3 = ACGT, 4 = N; complement of N = N)
inline uint8_t oriented_base(const uint8_t* row, int32_t len, uint8_t rc,
                             int32_t k) {
  if (!rc) return row[k];
  uint8_t c = row[len - 1 - k];
  return c < 4 ? (uint8_t)(3 - c) : c;
}

}  // namespace

extern "C" {

// Majority-vote consensus over the concatenated contig space.
//   codes:  (nrows, L) uint8 code rows, indexed by rids
//   rids/gpos/rc: layout arrays (M,), gpos nondecreasing
//   out:    (seq_len,) uint8 consensus codes
// Each thread owns a disjoint output span; reads overlapping the span are
// found by binary search (read starts are sorted, window width <= L).
void stpu_consensus(const uint8_t* codes, int64_t L, const int32_t* lengths,
                    const int32_t* rids, const int64_t* gpos,
                    const uint8_t* rc, int64_t M, int64_t seq_len,
                    uint8_t* out, int num_threads) {
  if (seq_len <= 0) return;
  int T = threads_or_default(num_threads);
  if (M < 4096) T = 1;
#ifdef _OPENMP
#pragma omp parallel num_threads(T)
#endif
  {
#ifdef _OPENMP
    int t = omp_get_thread_num();
    int nt = omp_get_num_threads();
#else
    int t = 0, nt = 1;
#endif
    int64_t lo = seq_len * t / nt;
    int64_t hi = seq_len * (t + 1) / nt;
    if (hi > lo) {
      // first read that can reach into [lo, hi): gpos > lo - L
      int64_t j0 = std::upper_bound(gpos, gpos + M, lo - L) - gpos;
      // first read starting at or past hi
      int64_t j1 = std::lower_bound(gpos, gpos + M, hi) - gpos;
      std::vector<uint32_t> counts((size_t)(hi - lo) * 4, 0);
      for (int64_t j = j0; j < j1; ++j) {
        const uint8_t* row = codes + (int64_t)rids[j] * L;
        int32_t len = lengths[rids[j]];
        int64_t g = gpos[j];
        int32_t k0 = g < lo ? (int32_t)(lo - g) : 0;
        int32_t k1 = g + len > hi ? (int32_t)(hi - g) : len;
        uint8_t r = rc[j];
        uint32_t* cbase = counts.data() + (size_t)(g - lo) * 4;
        if (!r) {
          for (int32_t k = k0; k < k1; ++k) {
            uint8_t c = row[k];
            if (c < 4) cbase[(size_t)k * 4 + c]++;
          }
        } else {
          for (int32_t k = k0; k < k1; ++k) {
            uint8_t c = row[len - 1 - k];
            if (c < 4) cbase[(size_t)k * 4 + (3 - c)]++;
          }
        }
      }
      for (int64_t p = 0; p < hi - lo; ++p) {
        const uint32_t* c = counts.data() + (size_t)p * 4;
        uint8_t best = 0;
        uint32_t bc = c[0];
        for (uint8_t b = 1; b < 4; ++b)
          if (c[b] > bc) { bc = c[b]; best = b; }
        out[lo + p] = best;  // all-zero -> 0 (A), matching np.argmax
      }
    }
  }
}

// consensus base at window position k, clipped to [0, seq_len-1] like the
// numpy path (second-chance placements may touch the boundary)
inline uint8_t cons_at(const uint8_t* consensus, int64_t seq_len, int64_t g,
                       int32_t k) {
  int64_t p = g + k;
  return consensus[p < 0 ? 0 : (p >= seq_len ? seq_len - 1 : p)];
}

// Pass 1: per-read mismatch count vs the consensus window.
void stpu_noise_count(const uint8_t* codes, int64_t L, const int32_t* lengths,
                      const int32_t* rids, const int64_t* gpos,
                      const uint8_t* rc, int64_t M, const uint8_t* consensus,
                      int64_t seq_len, int32_t* out_nn, int num_threads) {
  int T = threads_or_default(num_threads);
#ifdef _OPENMP
#pragma omp parallel for schedule(static) num_threads(T)
#endif
  for (int64_t j = 0; j < M; ++j) {
    const uint8_t* row = codes + (int64_t)rids[j] * L;
    int32_t len = lengths[rids[j]];
    int64_t g = gpos[j];
    int32_t nn = 0;
    uint8_t r = rc[j];
    if (g >= 0 && g + len <= seq_len) {
      const uint8_t* cons = consensus + g;
      for (int32_t k = 0; k < len; ++k)
        nn += oriented_base(row, len, r, k) != cons[k];
    } else {
      for (int32_t k = 0; k < len; ++k)
        nn += oriented_base(row, len, r, k) != cons_at(consensus, seq_len, g, k);
    }
    out_nn[j] = nn;
  }
}

// Pass 2: fill noisepos (position within the oriented read, ascending) and
// noisechar (rank of the read base among bases != consensus base; N -> 3 —
// reference enc_noise substitution table, src/encoder.h:517-537).
void stpu_noise_fill(const uint8_t* codes, int64_t L, const int32_t* lengths,
                     const int32_t* rids, const int64_t* gpos,
                     const uint8_t* rc, int64_t M, const uint8_t* consensus,
                     int64_t seq_len, const int64_t* noise_off,
                     int32_t* out_npos, uint8_t* out_nchar, int num_threads) {
  int T = threads_or_default(num_threads);
#ifdef _OPENMP
#pragma omp parallel for schedule(static) num_threads(T)
#endif
  for (int64_t j = 0; j < M; ++j) {
    const uint8_t* row = codes + (int64_t)rids[j] * L;
    int32_t len = lengths[rids[j]];
    int64_t g = gpos[j];
    int64_t o = noise_off[j];
    uint8_t r = rc[j];
    for (int32_t k = 0; k < len; ++k) {
      uint8_t rd = oriented_base(row, len, r, k);
      uint8_t rf = cons_at(consensus, seq_len, g, k);
      if (rd != rf) {
        out_npos[o] = k;
        out_nchar[o] = rd == 4 ? 3 : (uint8_t)(rd - (rd > rf));
        ++o;
      }
    }
  }
}

// Decoder: rebuild (M, L) oriented code rows from consensus + noise, then
// un-orient RC rows. Inverse of the two kernels above.
//   npos: absolute position within the oriented read (delta already undone)
void stpu_reconstruct(const uint8_t* consensus, int64_t seq_len,
                      const int64_t* gpos, const int32_t* lengths,
                      const uint8_t* rc, const int32_t* nn,
                      const int64_t* noise_off, const int32_t* npos,
                      const uint8_t* nchar, int64_t M, int64_t L,
                      uint8_t* out, int num_threads) {
  int T = threads_or_default(num_threads);
#ifdef _OPENMP
#pragma omp parallel for schedule(static) num_threads(T)
#endif
  for (int64_t j = 0; j < M; ++j) {
    uint8_t* row = out + j * L;
    int32_t len = lengths[j];
    int64_t g = gpos[j];
    // clamp like the numpy path: out-of-range reads as position 0 (the
    // caller treats impossible layouts as corrupt archives downstream)
    for (int32_t k = 0; k < len; ++k) {
      int64_t p = g + k;
      row[k] = consensus[p < 0 ? 0 : (p >= seq_len ? seq_len - 1 : p)];
    }
    for (int32_t k = len; k < L; ++k) row[k] = 0;
    int64_t o = noise_off[j];
    for (int32_t i = 0; i < nn[j]; ++i) {
      int32_t p = npos[o + i];
      if (p < 0 || p >= len) continue;  // corrupt stream: ignore, caller
                                        // validates round-trip elsewhere
      uint8_t rel = nchar[o + i];
      uint8_t rf = row[p];
      row[p] = rel == 3 ? 4 : (uint8_t)(rel + (rel >= rf));
    }
    if (rc[j]) {
      for (int32_t a = 0, b = len - 1; a < b; ++a, --b) {
        uint8_t x = row[a], y = row[b];
        row[a] = y < 4 ? (uint8_t)(3 - y) : y;
        row[b] = x < 4 ? (uint8_t)(3 - x) : x;
      }
      if (len & 1) {
        uint8_t x = row[len / 2];
        row[len / 2] = x < 4 ? (uint8_t)(3 - x) : x;
      }
    }
  }
}

}  // extern "C"
