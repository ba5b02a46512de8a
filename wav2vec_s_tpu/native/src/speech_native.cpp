// Native helpers for the host-side hot paths (C ABI, loaded via ctypes).
//
// Plays the role of the reference's C++/Cython host extensions: libnat's
// Levenshtein (fairseq/clib/libnat), libbleu's n-gram counting
// (fairseq/clib/libbleu), and data_utils_fast.pyx's batch_by_size
// (fairseq/fairseq/data/data_utils_fast.pyx).  Pure compute over plain
// arrays — no Python API — so the same .so works from any loader.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Levenshtein distance between two int-encoded token sequences.
int64_t levenshtein(const int64_t* a, int64_t na,
                    const int64_t* b, int64_t nb) {
  if (na == 0) return nb;
  if (nb == 0) return na;
  std::vector<int64_t> prev(nb + 1), cur(nb + 1);
  for (int64_t j = 0; j <= nb; ++j) prev[j] = j;
  for (int64_t i = 1; i <= na; ++i) {
    cur[0] = i;
    for (int64_t j = 1; j <= nb; ++j) {
      int64_t sub = prev[j - 1] + (a[i - 1] != b[j - 1] ? 1 : 0);
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
    }
    std::swap(prev, cur);
  }
  return prev[nb];
}

// Greedy max_tokens batching over pre-ordered indices.
// sizes: per-index size, in iteration order.  Writes batch end-offsets into
// out_offsets (capacity n) and returns the number of batches.
// Cost model matches fairseq batch_by_size: num_sentences * max_size.
int64_t batch_by_size(const int64_t* sizes, int64_t n, int64_t max_tokens,
                      int64_t max_sentences, int64_t bsz_mult,
                      int64_t* out_offsets) {
  int64_t nb = 0;
  int64_t start = 0;
  int64_t cur_max = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t new_max = std::max(cur_max, sizes[i]);
    int64_t count = i - start + 1;
    bool overflow = (count * new_max > max_tokens && count > 1) ||
                    (max_sentences > 0 && count > max_sentences);
    if (overflow) {
      int64_t bsz = i - start;
      if (bsz_mult > 1 && bsz > bsz_mult) bsz = bsz / bsz_mult * bsz_mult;
      start += bsz;
      out_offsets[nb++] = start;
      cur_max = 0;
      for (int64_t j = start; j <= i; ++j)
        cur_max = std::max(cur_max, sizes[j]);
    } else {
      cur_max = new_max;
    }
  }
  if (start < n) out_offsets[nb++] = n;
  return nb;
}

// BLEU n-gram match counting for one (hyp, ref) pair of int-encoded tokens.
// Fills matches[4] and totals[4] (counts for n = 1..4).
void bleu_counts(const int64_t* hyp, int64_t nh, const int64_t* ref,
                 int64_t nr, int64_t* matches, int64_t* totals) {
  for (int n = 1; n <= 4; ++n) {
    totals[n - 1] = nh - n + 1 > 0 ? nh - n + 1 : 0;
    if (totals[n - 1] == 0) { matches[n - 1] = 0; continue; }
    std::unordered_map<uint64_t, int64_t> ref_ngrams;
    auto key = [&](const int64_t* p) {
      uint64_t h = 1469598103934665603ull;
      for (int i = 0; i < n; ++i) {
        h ^= (uint64_t)p[i];
        h *= 1099511628211ull;
      }
      return h;
    };
    for (int64_t i = 0; i + n <= nr; ++i) ref_ngrams[key(ref + i)] += 1;
    int64_t m = 0;
    for (int64_t i = 0; i + n <= nh; ++i) {
      auto it = ref_ngrams.find(key(hyp + i));
      if (it != ref_ngrams.end() && it->second > 0) {
        ++m;
        --it->second;
      }
    }
    matches[n - 1] = m;
  }
}

}  // extern "C"
