// Native helpers for the host-side hot paths (C ABI, loaded via ctypes).
//
// Plays the role of the reference's C++/Cython host extensions: libnat's
// Levenshtein (fairseq/clib/libnat), libbleu's n-gram counting
// (fairseq/clib/libbleu), and data_utils_fast.pyx's batch_by_size
// (fairseq/fairseq/data/data_utils_fast.pyx).  Pure compute over plain
// arrays — no Python API — so the same .so works from any loader.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
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

// ---------------------------------------------------------------------------
// Batched WAV reader — the data-loader hot path (the role of the reference's
// soundfile/torchaudio C extensions).  Parses RIFF/WAVE PCM16 headers and
// fills a caller-provided [n, stride] float32 buffer in parallel; files it
// cannot handle get lens[i] = -1 and the Python caller falls back per-file.

namespace {

struct WavResult { int64_t len; int64_t rate; };

WavResult read_one_wav(const char* path, float* out, int64_t stride) {
  WavResult bad{-1, 0};
  FILE* f = std::fopen(path, "rb");
  if (!f) return bad;
  unsigned char hdr[12];
  if (std::fread(hdr, 1, 12, f) != 12 || std::memcmp(hdr, "RIFF", 4) != 0 ||
      std::memcmp(hdr + 8, "WAVE", 4) != 0) { std::fclose(f); return bad; }
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  int64_t n_samples = -1;
  // walk chunks: fmt then data (skip others)
  for (;;) {
    unsigned char ch[8];
    if (std::fread(ch, 1, 8, f) != 8) { std::fclose(f); return bad; }
    uint32_t sz;
    std::memcpy(&sz, ch + 4, 4);
    if (std::memcmp(ch, "fmt ", 4) == 0) {
      std::vector<unsigned char> b(sz);
      if (std::fread(b.data(), 1, sz, f) != sz || sz < 16) {
        std::fclose(f); return bad;
      }
      std::memcpy(&fmt, b.data(), 2);
      std::memcpy(&channels, b.data() + 2, 2);
      std::memcpy(&rate, b.data() + 4, 4);
      std::memcpy(&bits, b.data() + 14, 2);
    } else if (std::memcmp(ch, "data", 4) == 0) {
      if (fmt != 1 || bits != 16 || channels == 0) {  // PCM16 only
        std::fclose(f); return bad;
      }
      int64_t frames = (int64_t)sz / (2 * channels);
      if (frames > stride) { std::fclose(f); return bad; }
      std::vector<int16_t> raw((size_t)frames * channels);
      size_t got = std::fread(raw.data(), 2 * channels, frames, f);
      std::fclose(f);
      if ((int64_t)got != frames) return bad;
      const float inv = 1.0f / 32768.0f;
      if (channels == 1) {
        for (int64_t i = 0; i < frames; ++i) out[i] = raw[i] * inv;
      } else {
        const float cinv = inv / channels;
        for (int64_t i = 0; i < frames; ++i) {
          int32_t acc = 0;
          for (int c = 0; c < channels; ++c) acc += raw[i * channels + c];
          out[i] = acc * cinv;
        }
      }
      n_samples = frames;
      return WavResult{n_samples, (int64_t)rate};
    } else {
      if (std::fseek(f, (long)((sz + 1) & ~1u), SEEK_CUR) != 0) {
        std::fclose(f); return bad;
      }
      continue;
    }
  }
}

}  // namespace

extern "C" {

// paths: n C strings; out: [n, stride] float32 (zero-filled by caller);
// lens/rates: [n] outputs (-1 len = unreadable here -> python fallback).
// Returns the number of successfully decoded files.
int64_t read_wav_batch(const char** paths, int64_t n, float* out,
                       int64_t stride, int64_t* lens, int64_t* rates,
                       int64_t n_threads) {
  std::atomic<int64_t> next{0}, ok{0};
  auto work = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n) return;
      WavResult r = read_one_wav(paths[i], out + i * stride, stride);
      lens[i] = r.len;
      rates[i] = r.rate;
      if (r.len >= 0) ok.fetch_add(1);
    }
  };
  int64_t t = std::min<int64_t>(std::max<int64_t>(n_threads, 1), n);
  std::vector<std::thread> pool;
  for (int64_t i = 1; i < t; ++i) pool.emplace_back(work);
  work();
  for (auto& th : pool) th.join();
  return ok.load();
}

}  // extern "C"
