// Native host engine for csv_simd_tpu.
//
// Two roles (mirroring the runtime split of the framework):
//   1. host_stage1        — a complete CPU stage-1 indexer over raw bytes:
//                           uint64 SWAR classify + in-word prefix-XOR quote
//                           parity + offset extraction, multithreaded with
//                           the same two-phase parity stitch the device
//                           shards use (phase A: per-chunk quote parity;
//                           phase B: parallel masked extraction).
//                           This is the fallback/serving-host engine — the
//                           role the whole Rust reference plays
//                           (avx/stage1.rs:193-430), generalized to any
//                           single-byte dialect and actually parallel
//                           (the reference's Chunk layer was never wired
//                           to threads, tape.rs:13-40).
//   2. extract_offsets_v3 — decode the TPU kernel's fold-packed bitmask
//                           words (ops/stage1_v3.py layout) into ascending
//                           absolute byte offsets without expanding to a
//                           byte mask.
//
// Exact SWAR byte-equality (no cross-byte borrows; the naive
// (v-0x0101..)&~v&0x8080.. detector is wrong for 0x01-after-0x00):
//   y = x ^ (C * 0x0101..); t = (y & 0x7f7f..) + 0x7f7f..; t |= y;
//   flags = ~t & 0x8080..
//
// Build: g++ -O3 -march=native -shared -fPIC csvidx.cpp -o _csvidx.so

#include <algorithm>
#include <atomic>
#include <memory>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr uint64_t kLo7 = 0x7f7f7f7f7f7f7f7fULL;
constexpr uint64_t kHi1 = 0x8080808080808080ULL;
constexpr uint64_t kOnes = 0x0101010101010101ULL;

static inline uint64_t swar_eq(uint64_t x, uint64_t byte_bcast) {
  uint64_t y = x ^ byte_bcast;
  uint64_t t = (y & kLo7) + kLo7;
  t |= y;
  return ~t & kHi1;
}

static inline uint64_t prefix_xor_bytes(uint64_t f) {
  f ^= f << 8;
  f ^= f << 16;
  f ^= f << 32;
  return f;
}

struct Dialect64 {
  uint64_t delim, quote, nl0, nl1;
};

// Quote parity of [data, data+n) — the phase-A reduce.
static int chunk_quote_parity(const uint8_t* data, int64_t n, uint64_t quote) {
  int64_t i = 0;
  uint64_t par = 0;
  for (; i + 8 <= n; i += 8) {
    uint64_t x;
    std::memcpy(&x, data + i, 8);
    par ^= prefix_xor_bytes(swar_eq(x, quote)) >> 63;
  }
  int p = static_cast<int>(par & 1);
  for (; i < n; ++i) p ^= (data[i] == (quote & 0xff));
  return p;
}

// Stage-1 over [data, data+n), byte offsets rebased by +base. Returns the
// number of offsets written, or -1 if `cap` would be exceeded;
// *parity_out = quote parity after the chunk.
static int64_t chunk_stage1(const uint8_t* data, int64_t n, int64_t base,
                            const Dialect64& d, int carry_in, int64_t* out,
                            int64_t cap, int* parity_out) {
  int64_t k = 0;
  uint64_t carry = carry_in ? ~0ULL : 0ULL;  // broadcast parity
  int64_t i = 0;
  for (; i + 8 <= n; i += 8) {
    uint64_t x;
    std::memcpy(&x, data + i, 8);
    uint64_t qf = swar_eq(x, d.quote);
    uint64_t sf = swar_eq(x, d.delim) | swar_eq(x, d.nl0) | swar_eq(x, d.nl1);
    uint64_t pin = prefix_xor_bytes(qf);
    uint64_t inq = pin ^ (carry & kHi1);
    uint64_t m = sf & ~inq;
    if (m) {
      if (k + __builtin_popcountll(m) > cap) return -1;
      do {
        out[k++] = base + i + (__builtin_ctzll(m) >> 3);
        m &= m - 1;
      } while (m);
    }
    carry ^= static_cast<uint64_t>(-static_cast<int64_t>(pin >> 63));
  }
  int par = static_cast<int>(carry & 1);
  for (; i < n; ++i) {
    uint8_t b = data[i];
    if (b == (d.quote & 0xff)) par ^= 1;
    else if (!par && (b == (d.delim & 0xff) || b == (d.nl0 & 0xff) ||
                      b == (d.nl1 & 0xff))) {
      if (k >= cap) return -1;
      out[k++] = base + i;
    }
  }
  *parity_out = par;
  return k;
}

static const int kSigma[8] = {7, 3, 5, 1, 6, 2, 4, 0};  // 7 - bitrev3(j)

}  // namespace

extern "C" {

// CPU stage-1: data[n] -> ascending offsets into out[out_cap]. Returns
// the count, or -1 if out_cap would be exceeded (caller grows and
// retries — the reference's len/6 density heuristic applies). Parity
// after the buffer in *parity_out. n_threads <= 1 runs serially.
// Two-phase: chunk parities first, then parallel extraction with carried
// parity and exact offset rebasing — chunk boundaries may cut quoted
// regions.
int64_t host_stage1(const uint8_t* data, int64_t n, int delim, int quote,
                    int nl0, int nl1, int carry_in, int n_threads,
                    int64_t* out, int64_t out_cap, int* parity_out) {
  Dialect64 d{kOnes * static_cast<uint64_t>(delim),
              kOnes * static_cast<uint64_t>(quote),
              kOnes * static_cast<uint64_t>(nl0),
              kOnes * static_cast<uint64_t>(nl1)};
  if (n <= 0) {
    *parity_out = carry_in & 1;
    return 0;
  }
  if (n_threads <= 1 || n < (1 << 20)) {
    return chunk_stage1(data, n, 0, d, carry_in & 1, out, out_cap,
                        parity_out);
  }
  const int t = n_threads;
  const int64_t chunk = (n + t - 1) / t;
  // phase A: per-chunk quote parity
  std::vector<int> par(t, 0);
  {
    std::vector<std::thread> ths;
    for (int i = 0; i < t; ++i) {
      ths.emplace_back([&, i] {
        int64_t lo = i * chunk, hi = std::min<int64_t>(n, lo + chunk);
        par[i] = (hi > lo) ? chunk_quote_parity(data + lo, hi - lo, d.quote)
                           : 0;
      });
    }
    for (auto& th : ths) th.join();
  }
  // exclusive XOR scan of parities (the collective, on host)
  std::vector<int> carry(t, 0);
  int acc = carry_in & 1;
  for (int i = 0; i < t; ++i) {
    carry[i] = acc;
    acc ^= par[i];
  }
  // phase B: parallel extraction into per-chunk scratch (uninitialized
  // new[] — vector::resize would zero the buffer and dominate runtime).
  // Per-chunk capacity is the shared out_cap's per-chunk share times a
  // slack factor; an overflowing chunk retries serially into a chunk-
  // sized buffer (rare: pathologically dense regions).
  std::vector<std::unique_ptr<int64_t[]>> scratch(t);
  std::vector<int64_t> cnt(t, 0);
  const int64_t per_cap =
      std::min<int64_t>(chunk, out_cap / t * 2 + 4096);
  {
    std::vector<std::thread> ths;
    for (int i = 0; i < t; ++i) {
      ths.emplace_back([&, i] {
        int64_t lo = i * chunk, hi = std::min<int64_t>(n, lo + chunk);
        if (hi <= lo) return;
        scratch[i].reset(new int64_t[per_cap]);
        int p;
        cnt[i] = chunk_stage1(data + lo, hi - lo, lo, d, carry[i],
                              scratch[i].get(), per_cap, &p);
        if (cnt[i] < 0) {  // dense chunk: retry with full capacity
          scratch[i].reset(new int64_t[hi - lo]);
          cnt[i] = chunk_stage1(data + lo, hi - lo, lo, d, carry[i],
                                scratch[i].get(), hi - lo, &p);
        }
      });
    }
    for (auto& th : ths) th.join();
  }
  int64_t k = 0;
  for (int i = 0; i < t; ++i) {
    if (k + cnt[i] > out_cap) return -1;
    if (cnt[i])
      std::memcpy(out + k, scratch[i].get(), cnt[i] * sizeof(int64_t));
    k += cnt[i];
  }
  *parity_out = acc;
  return k;
}

// Quote parity only (phase-A as a standalone export, for streaming).
int host_quote_parity(const uint8_t* data, int64_t n, int quote,
                      int carry_in) {
  return (carry_in & 1) ^
         chunk_quote_parity(data, n, kOnes * static_cast<uint64_t>(quote));
}

// Decode the v3 fold-pack layout (ops/stage1_v3.py): packed words
// (g_total, 128) int32; bit (8b + sigma(j)) of word (s*gp + g, lane)
// covers flat byte ((s*tile + j*gp + g)*128 + lane)*4 + b. Emits
// ascending absolute offsets (+base), never past cap entries and never
// an offset >= n_bytes (set bits in padding rows only exist in
// corrupted/foreign packed arrays — the kernel zero-pads — but this
// entry point must not trust its input into a heap overflow).
// Returns count, or -1 if the output would exceed cap.
int64_t extract_offsets_v3(const uint32_t* packed, int64_t g_total,
                           int64_t tile, int64_t n_bytes, int64_t base,
                           int64_t cap, int64_t* out) {
  const int64_t gp = tile / 8;
  const int64_t steps = g_total / gp;
  int64_t k = 0;
  for (int64_t s = 0; s < steps; ++s) {
    const uint32_t* step_words = packed + s * gp * 128;
    const int64_t step_byte0 = s * tile * 512;
    for (int64_t r = 0; r < tile; ++r) {
      const int64_t j = r / gp, g = r % gp;
      const uint32_t row_mask = 0x01010101u << kSigma[j];
      const uint32_t* wrow = step_words + g * 128;
      const int64_t row_byte0 = step_byte0 + r * 512;
      if (row_byte0 >= n_bytes) return k;
      for (int64_t lane = 0; lane < 128; ++lane) {
        uint32_t w = wrow[lane] & row_mask;
        while (w) {
          int bit = __builtin_ctz(w);
          const int64_t off = row_byte0 + lane * 4 + (bit >> 3);
          if (off < n_bytes) {
            if (k >= cap) return -1;
            out[k++] = base + off;
          }
          w &= w - 1;
        }
      }
    }
  }
  return k;
}

}  // extern "C"
