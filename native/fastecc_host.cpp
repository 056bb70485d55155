// Host-side data plane for fastecc_tpu (SURVEY.md C13/C15 equivalents).
//
// The reference implements its entire codec in C++; in the TPU rebuild the
// field math lives on-device (JAX/Pallas), and the native layer owns what
// remains host-bound: wire-format (un)packing of block files before/after
// the device pipeline, and block checksums. Loops are OpenMP-parallel over
// blocks and written to autovectorize (plain indexed loops, no branches in
// the inner body). The reference's large-page allocator (C15) has no
// equivalent here because the working set is HBM-resident; host staging
// buffers are transient.
//
// Semantics are pinned to fastecc_tpu/packing.py and covered by the
// native-vs-jnp equivalence tests; both must match bit-for-bit.

#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#else
static inline int omp_get_num_threads() { return 1; }
static inline int omp_get_thread_num() { return 0; }
static inline int omp_get_max_threads() { return 1; }
#endif

static const uint32_t P32 = 0xFFF00001u;

extern "C" {

// [nblocks, 4096] raw bytes -> [nblocks, 1088] GF(0xFFF00001) lanes:
// 1024 stored words (w - p if w >= p) + 64 bitmap lanes of 16 bits.
void pack_gf32(const uint8_t* raw, int64_t nblocks, uint32_t* out) {
#pragma omp parallel for
  for (int64_t b = 0; b < nblocks; ++b) {
    const uint8_t* src = raw + b * 4096;
    uint32_t* dst = out + b * 1088;
    uint32_t bm[64] = {0};
    for (int i = 0; i < 1024; ++i) {
      uint32_t w;
      std::memcpy(&w, src + 4 * i, 4);  // little-endian load
      uint32_t esc = w >= P32 ? 1u : 0u;
      dst[i] = w - (esc ? P32 : 0u);
      bm[i >> 4] |= esc << (i & 15);
    }
    std::memcpy(dst + 1024, bm, sizeof(bm));
  }
}

// Inverse of pack_gf32.
void unpack_gf32(const uint32_t* fields, int64_t nblocks, uint8_t* out) {
#pragma omp parallel for
  for (int64_t b = 0; b < nblocks; ++b) {
    const uint32_t* src = fields + b * 1088;
    uint8_t* dst = out + b * 4096;
    for (int i = 0; i < 1024; ++i) {
      uint32_t esc = (src[1024 + (i >> 4)] >> (i & 15)) & 1u;
      uint32_t w = src[i] + (esc ? P32 : 0u);
      std::memcpy(dst + 4 * i, &w, 4);
    }
  }
}

// GF32 parity serialization: [m, 1088] lanes (< p < 2^32) -> 4352 LE bytes.
void serialize_parity_gf32(const uint32_t* fields, int64_t nblocks,
                           uint8_t* out) {
#pragma omp parallel for
  for (int64_t b = 0; b < nblocks; ++b)
    std::memcpy(out + b * 4352, fields + b * 1088, 4352);
}

void deserialize_parity_gf32(const uint8_t* raw, int64_t nblocks,
                             uint32_t* out) {
#pragma omp parallel for
  for (int64_t b = 0; b < nblocks; ++b)
    std::memcpy(out + b * 1088, raw + b * 4352, 4352);
}

// GF16 data packing: [nblocks, 4096] bytes -> [nblocks, 2048] u32 lanes
// (uint16 widen; every raw u16 < p = 0x10001, no escaping).
void pack_gf16(const uint8_t* raw, int64_t nblocks, uint32_t* out) {
#pragma omp parallel for
  for (int64_t b = 0; b < nblocks; ++b) {
    const uint8_t* src = raw + b * 4096;
    uint32_t* dst = out + b * 2048;
    for (int i = 0; i < 2048; ++i) {
      uint16_t w;
      std::memcpy(&w, src + 2 * i, 2);
      dst[i] = w;
    }
  }
}

void unpack_gf16(const uint32_t* fields, int64_t nblocks, uint8_t* out) {
#pragma omp parallel for
  for (int64_t b = 0; b < nblocks; ++b) {
    const uint32_t* src = fields + b * 2048;
    uint8_t* dst = out + b * 4096;
    for (int i = 0; i < 2048; ++i) {
      uint16_t w = static_cast<uint16_t>(src[i]);
      std::memcpy(dst + 2 * i, &w, 2);
    }
  }
}

// GF16 parity serialization: [m, 2048] lanes (values <= 0x10000) ->
// 4352 bytes (2048 u16 stored words, 0 where escaped, + 128 u16 bitmap).
void serialize_parity_gf16(const uint32_t* fields, int64_t nblocks,
                           uint8_t* out) {
#pragma omp parallel for
  for (int64_t b = 0; b < nblocks; ++b) {
    const uint32_t* src = fields + b * 2048;
    uint8_t* dst = out + b * 4352;
    uint16_t bm[128] = {0};
    for (int i = 0; i < 2048; ++i) {
      uint32_t esc = src[i] == 0x10000u ? 1u : 0u;
      uint16_t w = esc ? 0 : static_cast<uint16_t>(src[i]);
      std::memcpy(dst + 2 * i, &w, 2);
      bm[i >> 4] |= static_cast<uint16_t>(esc << (i & 15));
    }
    std::memcpy(dst + 4096, bm, sizeof(bm));
  }
}

void deserialize_parity_gf16(const uint8_t* raw, int64_t nblocks,
                             uint32_t* out) {
#pragma omp parallel for
  for (int64_t b = 0; b < nblocks; ++b) {
    const uint8_t* src = raw + b * 4352;
    uint32_t* dst = out + b * 2048;
    for (int i = 0; i < 2048; ++i) {
      uint16_t w, bmw;
      std::memcpy(&w, src + 2 * i, 2);
      std::memcpy(&bmw, src + 4096 + 2 * (i >> 4), 2);
      uint32_t esc = (bmw >> (i & 15)) & 1u;
      dst[i] = static_cast<uint32_t>(w) + (esc ? 0x10000u : 0u);
    }
  }
}

// ---------------------------------------------------------------------------
// Host NTT (SURVEY.md C8 host-side twin): Stockham along axis 0 of an
// [n, m] u32 array, u64 scalar arithmetic (p < 2^32 so products fit),
// OpenMP across butterfly rows. Semantics are pinned to
// fastecc_tpu.ntt.ntt_host and the device ntt (natural order in and out);
// bit-exactness is test-enforced. Main consumer: decode.locator_host's
// product tree, whose biggest levels dominate the erasure-locator build.
// ---------------------------------------------------------------------------

static inline uint64_t pow_mod(uint64_t b, uint64_t e, uint64_t p) {
  uint64_t r = 1;
  b %= p;
  while (e) {
    if (e & 1) r = r * b % p;
    b = b * b % p;
    e >>= 1;
  }
  return r;
}

// Barrett reduction for (a * b) mod p with a, b < p < 2^32: one 64x64
// high multiply instead of a hardware u64 division (~3x faster inner
// loop). md = floor((2^64 - 1) / p) gives q in {floor(x/p)-1, floor(x/p)},
// so a single conditional subtract finishes the reduction.
static inline uint64_t mulhi64(uint64_t a, uint64_t b) {
  return (uint64_t)(((unsigned __int128)a * b) >> 64);
}

static inline uint64_t barrett_mul(uint64_t a, uint64_t b, uint64_t p,
                                   uint64_t md) {
  uint64_t x = a * b;  // exact: a, b < 2^32
  uint64_t r = x - mulhi64(x, md) * p;
  return r >= p ? r - p : r;
}

// One Stockham stage: src viewed as [a, D, m] -> dst [a/2, 2, D, m].
// wa = stage root (w_n^(n/a) or its inverse), row i multiplies by wa^i;
// the twiddle steps incrementally inside each thread's chunk (one mulmod
// per row instead of a log-cost pow).
static void ntt_stage(const uint32_t* src, uint32_t* dst, int64_t half,
                      int64_t dm, uint64_t wa, uint64_t p) {
  // Few butterfly rows but wide rows (the final stages of one large
  // transform, or a batched level of small transforms — exactly the
  // locator product tree's lower levels): the row loop alone would idle
  // most threads, so parallelize the row-internal element loop instead.
  if (half < (int64_t)omp_get_max_threads() &&
      dm >= 2 * (int64_t)omp_get_max_threads()) {
    uint64_t md = ~0ULL / p;
    uint64_t tw = 1;
    for (int64_t i = 0; i < half; ++i) {
      const uint32_t* lo = src + i * dm;
      const uint32_t* hi = src + (i + half) * dm;
      uint32_t* even = dst + (2 * i) * dm;
      uint32_t* odd = dst + (2 * i + 1) * dm;
#pragma omp parallel for schedule(static)
      for (int64_t t = 0; t < dm; ++t) {
        uint64_t u = lo[t], v = hi[t];
        uint64_t s = u + v;
        even[t] = (uint32_t)(s >= p ? s - p : s);
        uint64_t d = u >= v ? u - v : u + p - v;
        odd[t] = (uint32_t)barrett_mul(d, tw, p, md);
      }
      tw = barrett_mul(tw, wa, p, md);
    }
    return;
  }
#pragma omp parallel
  {
    int nt = omp_get_num_threads();
    int tid = omp_get_thread_num();
    int64_t chunk = (half + nt - 1) / nt;
    int64_t begin = (int64_t)tid * chunk;
    int64_t end = begin + chunk < half ? begin + chunk : half;
    uint64_t md = ~0ULL / p;
    uint64_t tw = begin < end ? pow_mod(wa, (uint64_t)begin, p) : 0;
    for (int64_t i = begin; i < end; ++i) {
      const uint32_t* lo = src + i * dm;
      const uint32_t* hi = src + (i + half) * dm;
      uint32_t* even = dst + (2 * i) * dm;
      uint32_t* odd = dst + (2 * i + 1) * dm;
      for (int64_t t = 0; t < dm; ++t) {
        uint64_t u = lo[t], v = hi[t];
        uint64_t s = u + v;
        even[t] = (uint32_t)(s >= p ? s - p : s);
        uint64_t d = u >= v ? u - v : u + p - v;
        odd[t] = (uint32_t)barrett_mul(d, tw, p, md);
      }
      tw = barrett_mul(tw, wa, p, md);
    }
  }
}

// In-place NTT along axis 0 of x [n, m] (n a power of two), using scratch
// of the same size. w is the order-n root (caller passes w^-1 for the
// inverse) and scale is the final multiplier (n^-1 for a scaled inverse,
// 1 otherwise).
void ntt_mod(uint32_t* x, uint32_t* scratch, int64_t n, int64_t m,
             uint64_t p, uint64_t w, uint64_t scale) {
  uint32_t* src = x;
  uint32_t* dst = scratch;
  int64_t dm = m;  // D * m with D = completed-splits axis, D starts at 1
  for (int64_t a = n; a >= 2; a >>= 1) {
    uint64_t wa = pow_mod(w, (uint64_t)(n / a), p);
    ntt_stage(src, dst, a >> 1, dm, wa, p);
    uint32_t* t = src;
    src = dst;
    dst = t;
    dm <<= 1;
  }
  if (src != x)
    std::memcpy(x, src, (size_t)(n * m) * 4);
  if (scale != 1) {
    uint64_t md = ~0ULL / p;
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n * m; ++i)
      x[i] = (uint32_t)barrett_mul(x[i], scale, p, md);
  }
}

// Elementwise (a * b) mod p over u32 arrays — the product-tree pointwise
// convolution multiply.
void mulmod_vec(const uint32_t* a, const uint32_t* b, int64_t len,
                uint64_t p, uint32_t* out) {
  uint64_t md = ~0ULL / p;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < len; ++i)
    out[i] = (uint32_t)barrett_mul(a[i], b[i], p, md);
}

// CRC32C (Castagnoli), bitwise-sliced software table; used for block
// integrity tags in the wire manifest. The table lives in a C++11 magic
// static: its one-time build is thread-safe under concurrent first
// calls (Python threads release the GIL across ctypes calls — a lazy
// bool flag here was a data race on weakly-ordered hosts).
struct CrcTable {
  uint32_t t[256];
  CrcTable() {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t c = i;
      for (int k = 0; k < 8; ++k)
        c = (c & 1) ? 0x82F63B78u ^ (c >> 1) : (c >> 1);
      t[i] = c;
    }
  }
};

static const uint32_t* crc_table_get() {
  static const CrcTable table;
  return table.t;
}

uint32_t crc32c(const uint8_t* data, int64_t len) {
  const uint32_t* table = crc_table_get();
  uint32_t c = 0xFFFFFFFFu;
  for (int64_t i = 0; i < len; ++i)
    c = table[(c ^ data[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

// Batched block checksums: tags[i] = crc32c(blocks[i]).
void crc32c_blocks(const uint8_t* data, int64_t nblocks, int64_t block_bytes,
                   uint32_t* tags) {
  crc_table_get();
#pragma omp parallel for
  for (int64_t b = 0; b < nblocks; ++b)
    tags[b] = crc32c(data + b * block_bytes, block_bytes);
}

}  // extern "C"
