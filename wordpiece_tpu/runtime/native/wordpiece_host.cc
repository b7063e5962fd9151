// Native host runtime for wordpiece_tpu.
//
// TPU-native framework host layer: the pieces that must run on the host
// CPU at memory bandwidth — UTF-8 corpus decode, whitespace-safe shard
// splitting, vocab line parsing, and a scalar reference encoder used as
// the production fallback / golden oracle for big inputs.  Counterpart of
// the reference's src/third_party/utf8.cpp + src/utils.cpp roles, written
// from the semantics (see SURVEY.md §2 C4/C6), not translated.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).
//
// Build: make -C wordpiece_tpu/runtime/native

#include <cstdint>
#include <cstring>
#include <string>
#include <memory>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr uint32_t kInvalid = 0x110000;
constexpr uint32_t kSpaceToken = 9601;

inline bool is_cont(uint8_t b) { return (b & 0xC0u) == 0x80u; }

inline bool ok_cp(uint32_t x) { return x < 0xD800u || (0xDFFFu < x && x < 0x110000u); }

// Decode one codepoint; returns consumed bytes (>=1), INVALID on error.
inline uint32_t decode_one(const uint8_t* p, int64_t size, int64_t* consumed) {
  *consumed = 1;
  uint8_t b0 = p[0];
  if (b0 < 0x80u) return b0;
  if ((b0 & 0xE0u) == 0xC0u) {
    if (size >= 2 && is_cont(p[1])) {
      uint32_t cp = ((b0 & 0x1Fu) << 6) | (p[1] & 0x3Fu);
      if (cp >= 0x80u && ok_cp(cp)) { *consumed = 2; return cp; }
    }
  } else if ((b0 & 0xF0u) == 0xE0u) {
    if (size >= 3 && is_cont(p[1]) && is_cont(p[2])) {
      uint32_t cp = ((b0 & 0x0Fu) << 12) | ((p[1] & 0x3Fu) << 6) | (p[2] & 0x3Fu);
      if (cp >= 0x800u && ok_cp(cp)) { *consumed = 3; return cp; }
    }
  } else if ((b0 & 0xF8u) == 0xF0u) {
    if (size >= 4 && is_cont(p[1]) && is_cont(p[2]) && is_cont(p[3])) {
      uint32_t cp = ((b0 & 0x07u) << 18) | ((p[1] & 0x3Fu) << 12) |
                    ((p[2] & 0x3Fu) << 6) | (p[3] & 0x3Fu);
      if (cp >= 0x10000u && ok_cp(cp)) { *consumed = 4; return cp; }
    }
  }
  return kInvalid;
}

inline bool is_space_cp(uint32_t c) {
  return c == ' ' || (c >= 9 && c <= 13) || c == kSpaceToken;
}

inline bool is_punct_cp(uint32_t c) {
  // NB: 183/171/187 are < 256 but NOT C-locale ispunct; the reference
  // includes them via explicit extra terms (utf8.cpp:14-17), so they must
  // be checked outside the ASCII branch.
  if (c < 256) {
    return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) || (c >= 91 && c <= 96) ||
           (c >= 123 && c <= 126) || c == 183 || c == 171 || c == 187;
  }
  return c == 8249 || c == 8250 || (c >= 8208 && c <= 8248);
}

inline bool is_chinese_cp(uint32_t c) {
  return (c >= 0x4E00 && c <= 0x9FFF) || (c >= 0x3400 && c <= 0x4DBF) ||
         (c >= 0x20000 && c <= 0x2A6DF) || (c >= 0x2A700 && c <= 0x2B73F) ||
         (c >= 0x2B740 && c <= 0x2B81F) || (c >= 0x2B820 && c <= 0x2CEAF) ||
         (c >= 0xF900 && c <= 0xFAFF) || (c >= 0x2F800 && c <= 0x2FA1F);
}

inline bool is_spacing_cp(uint32_t c) {
  return is_space_cp(c) || is_punct_cp(c) || is_chinese_cp(c);
}

struct Key {
  const uint32_t* data;
  int32_t len;
  bool operator==(const Key& o) const {
    return len == o.len && std::memcmp(data, o.data, sizeof(uint32_t) * len) == 0;
  }
};

struct KeyHash {
  size_t operator()(const Key& k) const {
    uint64_t h = 1469598103934665603ull;
    for (int32_t i = 0; i < k.len; i++) {
      h ^= k.data[i];
      h *= 1099511628211ull;
    }
    return static_cast<size_t>(h);
  }
};

}  // namespace

extern "C" {

// bytes -> codepoints; returns count written to out (cap must be >= size).
int64_t wp_decode_utf8(const uint8_t* data, int64_t size, uint32_t* out) {
  int64_t n = 0;
  int64_t i = 0;
  while (i < size) {
    int64_t consumed;
    uint32_t cp = decode_one(data + i, size - i, &consumed);
    if (cp != kInvalid) out[n++] = cp;
    i += consumed;
  }
  return n;
}

// Per-codepoint class flags: 1=space 2=punct 4=chinese (bitmask).
void wp_char_classes(const uint32_t* cp, int64_t n, uint8_t* out) {
  for (int64_t i = 0; i < n; i++) {
    uint8_t f = 0;
    if (is_space_cp(cp[i])) f |= 1;
    if (is_punct_cp(cp[i])) f |= 2;
    if (is_chinese_cp(cp[i])) f |= 4;
    out[i] = f;
  }
}

// Scalar greedy MaxMatch encoder (reference worker semantics,
// src/fast.cpp:43-99).  Vocab passed as packed arrays:
//   words: concatenated codepoints; offsets: int64[v+1];
//   flags: per-token bitmask 1=is_prefix 2=skip(special|malformed).
// Returns the number of ids written to out (cap >= n + 1).
int64_t wp_encode_scalar(const uint32_t* text, int64_t n,
                         const uint32_t* words, const int64_t* offsets,
                         const uint8_t* flags, int64_t vocab_size,
                         int32_t unk_id, int32_t* out) {
  std::unordered_map<Key, int32_t, KeyHash> prefix_map, suffix_map;
  int64_t max_len = 0;
  for (int64_t i = 0; i < vocab_size; i++) {
    if (flags[i] & 2) continue;
    Key k{words + offsets[i], static_cast<int32_t>(offsets[i + 1] - offsets[i])};
    int64_t len = k.len;
    if (len > max_len) max_len = len;
    if (flags[i] & 1)
      prefix_map[k] = static_cast<int32_t>(i);
    else
      suffix_map[k] = static_cast<int32_t>(i);
  }
  if (max_len > n) max_len = n;

  auto is_word_prefix = [&](int64_t i) {
    return i == 0 || is_spacing_cp(text[i]) || is_spacing_cp(text[i - 1]);
  };

  int64_t count = 0;
  int64_t begin = 0;
  const int64_t end = n;
  while (begin != end && is_space_cp(text[begin])) begin++;

  int64_t tokens_since_prefix = 0;
  while (begin != end) {
    int64_t word_len = 1;
    if (!is_punct_cp(text[begin])) {
      int64_t cap = std::min(max_len, end - begin);
      while (word_len < cap && !is_spacing_cp(text[begin + word_len])) word_len++;
    }

    auto& map = is_word_prefix(begin) ? prefix_map : suffix_map;
    int64_t matched = 0;
    for (int64_t len = word_len; len >= 1; len--) {
      Key k{text + begin, static_cast<int32_t>(len)};
      auto it = map.find(k);
      if (it != map.end()) {
        tokens_since_prefix++;
        out[count++] = it->second;
        begin += len;
        matched = len;
        break;
      }
    }

    if (matched == 0) {
      count -= tokens_since_prefix;
      tokens_since_prefix = 0;
      out[count++] = unk_id;
      begin += word_len;
      while (begin != end && !is_word_prefix(begin)) begin++;
    } else if (begin != end && is_word_prefix(begin)) {
      tokens_since_prefix = 0;
    }

    while (begin != end && is_space_cp(text[begin])) begin++;
  }
  return count;
}

// Whitespace-safe shard boundaries over a codepoint array: fills
// ends[0..n_shards) with chunk end indices (reference chunk snapping,
// src/fast.cpp:113-115).
void wp_split_whitespace(const uint32_t* cp, int64_t n, int64_t n_shards,
                         int64_t* ends) {
  int64_t base = n / n_shards + (n % n_shards ? 1 : 0);
  int64_t begin = 0;
  for (int64_t s = 0; s < n_shards; s++) {
    if (begin >= n) {
      ends[s] = n;
      continue;
    }
    int64_t e = begin + base;
    if (e > n) e = n;
    while (e < n && !is_space_cp(cp[e])) e++;
    ends[s] = e;
    begin = e;
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Unit segmentation + dedupe (the word-centric fast path's host side).
//
// A "unit" is an independently tokenizable span (proof in SURVEY-cited
// semantics; see wordpiece_tpu/engine_word.py):
//   - spaces are skipped and never emitted;
//   - a punctuation char is a unit by itself (probe window 1);
//   - a CJK char merges with the following run of non-spacing chars
//     (the reference's probe window at a CJK char extends into them,
//     src/fast.cpp:54-60);
//   - otherwise a maximal run of non-spacing chars is a unit.
// Units with equal bytes tokenize identically, so the corpus is deduped
// at unit granularity (Zipf => ~10x less device work).
// ---------------------------------------------------------------------------

namespace {

struct UnitKey {
  const uint8_t* p;
  int32_t len;
  bool operator==(const UnitKey& o) const {
    return len == o.len && std::memcmp(p, o.p, static_cast<size_t>(len)) == 0;
  }
};
struct UnitKeyHash {
  size_t operator()(const UnitKey& k) const {
    uint64_t h = 1469598103934665603ull;
    for (int32_t i = 0; i < k.len; i++) {
      h ^= k.p[i];
      h *= 1099511628211ull;
    }
    return static_cast<size_t>(h);
  }
};

}  // namespace

extern "C" {

// Segment `data` into units and dedupe them.
// Outputs:
//   occ_unique[n_occ]   unique index per unit occurrence (corpus order)
//   uniq_start[n_uniq]  byte offset of the unique unit's first occurrence
//   uniq_len[n_uniq]    byte length
//   uniq_cplen[n_uniq]  decoded codepoint count
// Returns n_occ; *n_unique_out = n_uniq.  Buffers must hold `size`
// entries (worst case: every byte its own unit).
namespace {

// Byte classifier for the ASCII fast path: 0 = plain word byte (or UTF-8
// lead/cont of a non-spacing char, resolved by the slow path), 1 = ASCII
// space, 2 = ASCII punct, 3 = multi-byte or invalid (slow path).
inline const uint8_t* byte_class_table() {
  static uint8_t t[256];
  static bool init = [] {
    for (int b = 0; b < 256; b++) {
      if (b < 0x80) {
        uint32_t c = static_cast<uint32_t>(b);
        if (is_space_cp(c))
          t[b] = 1;
        else if (is_punct_cp(c))
          t[b] = 2;
        else
          t[b] = 0;
      } else {
        t[b] = 3;
      }
    }
    return true;
  }();
  (void)init;
  return t;
}

}  // namespace

namespace {

// Open-addressing dedupe table: far faster than unordered_map (no
// allocation, 64-bit hash compare before memcmp).
struct DedupeTable {
  std::vector<uint64_t> hash;
  std::vector<int32_t> uid;
  size_t mask;
  explicit DedupeTable(size_t cap_pow2) : hash(cap_pow2, 0), uid(cap_pow2, -1), mask(cap_pow2 - 1) {}
  void grow(const uint8_t* data, const int64_t* ustart, const int32_t* ulen) {
    DedupeTable bigger(2 * (mask + 1));
    for (size_t s = 0; s <= mask; s++) {
      if (uid[s] >= 0) {
        size_t b = static_cast<size_t>(hash[s]) & bigger.mask;
        while (bigger.uid[b] >= 0) b = (b + 1) & bigger.mask;
        bigger.hash[b] = hash[s];
        bigger.uid[b] = uid[s];
      }
    }
    (void)data; (void)ustart; (void)ulen;
    *this = std::move(bigger);
  }
};

inline uint64_t fnv64(const uint8_t* p, int64_t len) {
  uint64_t h = 1469598103934665603ull;
  for (int64_t i = 0; i < len; i++) {
    h ^= p[i];
    h *= 1099511628211ull;
  }
  return h | 1;  // nonzero marker
}

}  // namespace

int64_t wp_segment_dedupe(const uint8_t* data, int64_t size,
                          int32_t* occ_unique, int64_t* uniq_start,
                          int32_t* uniq_len, int32_t* uniq_cplen,
                          int64_t* n_unique_out) {
  const uint8_t* cls = byte_class_table();
  DedupeTable seen(1 << 16);
  int64_t n_occ = 0;
  int64_t n_uniq = 0;
  int64_t i = 0;
  while (i < size) {
    // Fast path: ASCII space runs.
    uint8_t c0 = cls[data[i]];
    if (c0 == 1) {
      i++;
      continue;
    }
    int64_t start;
    int32_t cplen;
    if (c0 == 0) {
      // ASCII word start: scan the run with the table; bail to the slow
      // path only on multi-byte bytes.
      start = i;
      cplen = 0;
      while (i < size && cls[data[i]] == 0) {
        i++;
        cplen++;
      }
      if (i < size && cls[data[i]] == 3) {
        // Mixed multi-byte run: continue with full decoding.
        while (i < size) {
          int64_t c2;
          uint32_t cp2 = decode_one(data + i, size - i, &c2);
          if (cp2 == kInvalid) {
            i += c2;  // invalid bytes vanish; they do not delimit units
            continue;
          }
          if (is_spacing_cp(cp2)) break;
          i += c2;
          cplen++;
        }
      }
    } else if (c0 == 2) {
      start = i;
      cplen = 1;
      i++;
    } else {
      // Multi-byte (or invalid) first char: full decode.
      int64_t consumed;
      uint32_t cp = decode_one(data + i, size - i, &consumed);
      if (cp == kInvalid || is_space_cp(cp)) {
        i += consumed;
        continue;
      }
      start = i;
      cplen = 0;
      if (is_punct_cp(cp)) {
        i += consumed;
        cplen = 1;
      } else {
        if (is_chinese_cp(cp)) {
          i += consumed;  // leading CJK char joins the following run
          cplen = 1;
        }
        while (i < size) {
          uint8_t cc = cls[data[i]];
          if (cc == 0) {  // ASCII word bytes: table fast path
            i++;
            cplen++;
            continue;
          }
          if (cc == 1 || cc == 2) break;  // ASCII space/punct delimits
          int64_t c2;
          uint32_t cp2 = decode_one(data + i, size - i, &c2);
          if (cp2 == kInvalid) {
            i += c2;
            continue;
          }
          if (is_spacing_cp(cp2)) break;
          i += c2;
          cplen++;
        }
      }
    }
    const int32_t klen = static_cast<int32_t>(i - start);
    const uint64_t h = fnv64(data + start, klen);
    size_t b = static_cast<size_t>(h) & seen.mask;
    int32_t uid = -1;
    while (seen.uid[b] >= 0) {
      if (seen.hash[b] == h) {
        const int32_t cand = seen.uid[b];
        if (uniq_len[cand] == klen &&
            std::memcmp(data + uniq_start[cand], data + start,
                        static_cast<size_t>(klen)) == 0) {
          uid = cand;
          break;
        }
      }
      b = (b + 1) & seen.mask;
    }
    if (uid < 0) {
      uid = static_cast<int32_t>(n_uniq);
      uniq_start[n_uniq] = start;
      uniq_len[n_uniq] = klen;
      uniq_cplen[n_uniq] = cplen;
      n_uniq++;
      seen.hash[b] = h;
      seen.uid[b] = uid;
      if (static_cast<size_t>(n_uniq) * 2 > seen.mask) {
        seen.grow(data, uniq_start, uniq_len);
      }
    }
    occ_unique[n_occ++] = uid;
  }
  *n_unique_out = n_uniq;
  return n_occ;
}

// Multithreaded segment+dedupe: split at an ASCII space near the middle,
// run wp_segment_dedupe per half in parallel (ctypes releases the GIL),
// then merge the second half's unique table into the first (remapping its
// occurrence ids).  Unit streams concatenate exactly across space-snapped
// splits, so the result is identical to the single-threaded call.
int64_t wp_segment_dedupe_mt(const uint8_t* data, int64_t size,
                             int32_t* occ_unique, int64_t* uniq_start,
                             int32_t* uniq_len, int32_t* uniq_cplen,
                             int64_t* n_unique_out, int32_t n_threads) {
  if (n_threads < 2 || size < (1 << 20)) {
    return wp_segment_dedupe(data, size, occ_unique, uniq_start, uniq_len,
                             uniq_cplen, n_unique_out);
  }
  // Split point: an ASCII space byte near the middle (spaces delimit).
  int64_t mid = size / 2;
  while (mid < size && data[mid] != 0x20) mid++;
  if (mid >= size) {
    return wp_segment_dedupe(data, size, occ_unique, uniq_start, uniq_len,
                             uniq_cplen, n_unique_out);
  }

  // Uninitialized scratch (value-init of ~100MB of vectors costs more
  // than the parallelism saves).
  const size_t cap2 = static_cast<size_t>(size - mid);
  std::unique_ptr<int32_t[]> occ2(new int32_t[cap2]);
  std::unique_ptr<int64_t[]> us2(new int64_t[cap2]);
  std::unique_ptr<int32_t[]> ul2(new int32_t[cap2]);
  std::unique_ptr<int32_t[]> ucp2(new int32_t[cap2]);
  int64_t n_occ2 = 0, n_uniq2 = 0;

  std::thread worker([&] {
    n_occ2 = wp_segment_dedupe(data + mid, size - mid, occ2.get(), us2.get(),
                               ul2.get(), ucp2.get(), &n_uniq2);
  });
  int64_t n_uniq1 = 0;
  int64_t n_occ1 = wp_segment_dedupe(data, mid, occ_unique, uniq_start,
                                     uniq_len, uniq_cplen, &n_uniq1);
  worker.join();

  // Merge: map half-2 unique ids into the global table.
  size_t cap = 1;
  while (cap < static_cast<size_t>(2 * (n_uniq1 + n_uniq2) + 1)) cap <<= 1;
  DedupeTable seen(cap);
  for (int64_t u = 0; u < n_uniq1; u++) {
    uint64_t h = fnv64(data + uniq_start[u], uniq_len[u]);
    size_t b = static_cast<size_t>(h) & seen.mask;
    while (seen.uid[b] >= 0) b = (b + 1) & seen.mask;
    seen.hash[b] = h;
    seen.uid[b] = static_cast<int32_t>(u);
  }
  int64_t n_uniq = n_uniq1;
  std::vector<int32_t> remap(static_cast<size_t>(n_uniq2));
  for (int64_t u = 0; u < n_uniq2; u++) {
    const uint8_t* p = data + mid + us2[u];
    const int32_t len = ul2[u];
    const uint64_t h = fnv64(p, len);
    size_t b = static_cast<size_t>(h) & seen.mask;
    int32_t found = -1;
    while (seen.uid[b] >= 0) {
      const int32_t cand = seen.uid[b];
      if (seen.hash[b] == h && uniq_len[cand] == len &&
          std::memcmp(data + uniq_start[cand], p, static_cast<size_t>(len)) == 0) {
        found = cand;
        break;
      }
      b = (b + 1) & seen.mask;
    }
    if (found < 0) {
      found = static_cast<int32_t>(n_uniq);
      uniq_start[n_uniq] = mid + us2[u];
      uniq_len[n_uniq] = len;
      uniq_cplen[n_uniq] = ucp2[u];
      n_uniq++;
      seen.hash[b] = h;
      seen.uid[b] = found;
    }
    remap[static_cast<size_t>(u)] = found;
  }
  for (int64_t i = 0; i < n_occ2; i++) {
    occ_unique[n_occ1 + i] = remap[static_cast<size_t>(occ2[static_cast<size_t>(i)])];
  }
  *n_unique_out = n_uniq;
  return n_occ1 + n_occ2;
}

// Fill width-bucketed codepoint matrices with the unique units.
// widths[n_buckets] ascending; a unit goes to the smallest width >= cplen,
// or to the overflow list if cplen > widths[n_buckets-1].
// matrices[b] is an int32 (counts[b], widths[b]) row-major buffer,
// pre-filled by the caller with the pad value (32 = space).
// Outputs per unique: bucket_of (n_buckets = overflow), row_of.
void wp_bucket_fill(const uint8_t* data, const int64_t* uniq_start,
                    const int32_t* uniq_len, const int32_t* uniq_cplen,
                    int64_t n_uniq, const int32_t* widths, int32_t n_buckets,
                    int32_t** matrices, int32_t* bucket_of, int32_t* row_of) {
  std::vector<int64_t> next_row(static_cast<size_t>(n_buckets), 0);
  int64_t overflow_row = 0;
  for (int64_t u = 0; u < n_uniq; u++) {
    int32_t cplen = uniq_cplen[u];
    int32_t b = -1;
    for (int32_t j = 0; j < n_buckets; j++) {
      if (cplen <= widths[j]) {
        b = j;
        break;
      }
    }
    if (b < 0) {
      bucket_of[u] = n_buckets;
      row_of[u] = static_cast<int32_t>(overflow_row++);
      continue;
    }
    bucket_of[u] = b;
    int64_t row = next_row[static_cast<size_t>(b)]++;
    row_of[u] = static_cast<int32_t>(row);
    int32_t* dst = matrices[b] + row * widths[b];
    const uint8_t* p = data + uniq_start[u];
    int64_t remaining = uniq_len[u];
    int32_t k = 0;
    while (remaining > 0 && k < widths[b]) {
      int64_t consumed;
      uint32_t cp = decode_one(p, remaining, &consumed);
      if (cp != kInvalid) dst[k++] = static_cast<int32_t>(cp);
      p += consumed;
      remaining -= consumed;
    }
  }
}

// Expand per-unique token lists to the per-occurrence id stream.
// tok_offsets[u]..tok_offsets[u+1] delimit unique u's ids in tok_flat.
int64_t wp_expand(const int32_t* occ_unique, int64_t n_occ,
                  const int32_t* tok_flat, const int64_t* tok_offsets,
                  int32_t* out) {
  int64_t n = 0;
  for (int64_t i = 0; i < n_occ; i++) {
    const int32_t u = occ_unique[i];
    const int64_t b = tok_offsets[u];
    const int64_t e = tok_offsets[u + 1];
    for (int64_t j = b; j < e; j++) out[n++] = tok_flat[j];
  }
  return n;
}

// --- Reusable scalar-encoder handle (vocab maps built once) --------------

struct WpVocabHandle {
  std::vector<uint32_t> words;
  std::vector<int64_t> offsets;
  std::unordered_map<Key, int32_t, KeyHash> prefix_map, suffix_map;
  int64_t max_len = 0;
  int32_t unk_id = -1;
};

void* wp_vocab_new(const uint32_t* words, const int64_t* offsets,
                   const uint8_t* flags, int64_t vocab_size, int32_t unk_id) {
  auto* h = new WpVocabHandle();
  h->words.assign(words, words + offsets[vocab_size]);
  h->offsets.assign(offsets, offsets + vocab_size + 1);
  h->unk_id = unk_id;
  for (int64_t i = 0; i < vocab_size; i++) {
    if (flags[i] & 2) continue;
    Key k{h->words.data() + h->offsets[i],
          static_cast<int32_t>(h->offsets[i + 1] - h->offsets[i])};
    if (k.len > h->max_len) h->max_len = k.len;
    if (flags[i] & 1)
      h->prefix_map[k] = static_cast<int32_t>(i);
    else
      h->suffix_map[k] = static_cast<int32_t>(i);
  }
  return h;
}

void wp_vocab_free(void* handle) { delete static_cast<WpVocabHandle*>(handle); }

// Same walk as wp_encode_scalar but with a prebuilt vocab handle.
int64_t wp_encode_with(void* handle, const uint32_t* text, int64_t n,
                       int32_t* out) {
  auto* h = static_cast<WpVocabHandle*>(handle);
  int64_t max_len = std::min<int64_t>(h->max_len, n);

  auto is_word_prefix = [&](int64_t i) {
    return i == 0 || is_spacing_cp(text[i]) || is_spacing_cp(text[i - 1]);
  };

  int64_t count = 0;
  int64_t begin = 0;
  const int64_t end = n;
  while (begin != end && is_space_cp(text[begin])) begin++;

  int64_t tokens_since_prefix = 0;
  while (begin != end) {
    int64_t word_len = 1;
    if (!is_punct_cp(text[begin])) {
      int64_t cap = std::min(max_len, end - begin);
      while (word_len < cap && !is_spacing_cp(text[begin + word_len])) word_len++;
    }
    auto& map = is_word_prefix(begin) ? h->prefix_map : h->suffix_map;
    int64_t matched = 0;
    for (int64_t len = word_len; len >= 1; len--) {
      Key k{text + begin, static_cast<int32_t>(len)};
      auto it = map.find(k);
      if (it != map.end()) {
        tokens_since_prefix++;
        out[count++] = it->second;
        begin += len;
        matched = len;
        break;
      }
    }
    if (matched == 0) {
      count -= tokens_since_prefix;
      tokens_since_prefix = 0;
      out[count++] = h->unk_id;
      begin += word_len;
      while (begin != end && !is_word_prefix(begin)) begin++;
    } else if (begin != end && is_word_prefix(begin)) {
      tokens_since_prefix = 0;
    }
    while (begin != end && is_space_cp(text[begin])) begin++;
  }
  return count;
}

}  // extern "C"
