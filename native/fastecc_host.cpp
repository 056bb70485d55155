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

// CRC32C (Castagnoli), bitwise-sliced software table; used for block
// integrity tags in the wire manifest.
static uint32_t crc_table[256];
static bool crc_init_done = false;

static void crc_init() {
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int k = 0; k < 8; ++k)
      c = (c & 1) ? 0x82F63B78u ^ (c >> 1) : (c >> 1);
    crc_table[i] = c;
  }
  crc_init_done = true;
}

uint32_t crc32c(const uint8_t* data, int64_t len) {
  if (!crc_init_done) crc_init();
  uint32_t c = 0xFFFFFFFFu;
  for (int64_t i = 0; i < len; ++i)
    c = crc_table[(c ^ data[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

// Batched block checksums: tags[i] = crc32c(blocks[i]).
void crc32c_blocks(const uint8_t* data, int64_t nblocks, int64_t block_bytes,
                   uint32_t* tags) {
  if (!crc_init_done) crc_init();
#pragma omp parallel for
  for (int64_t b = 0; b < nblocks; ++b)
    tags[b] = crc32c(data + b * block_bytes, block_bytes);
}

}  // extern "C"
