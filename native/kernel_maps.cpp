// Native kernel-map builder: the hot host-side loop of the input pipeline.
//
// Plays the role MinkowskiEngine's C++ coordinate manager plays in the
// reference (kernel-map construction for generalized sparse convolution;
// see /root/reference/pretrain/pointcontrast/model/modules/common.py:127-167
// which delegates to ME's C++ backend).  Design differs deliberately: maps
// are built once per batch for a whole pyramid and handed to XLA as static
// gather indices, so this code runs in data-loader threads, off the TPU
// critical path.
//
// Exposed via a C ABI for ctypes (no pybind11 in this environment).
//
// Core structure: an open-addressing hash table over packed 64-bit keys
// (mixed-radix encoding of (batch, x, y, z), same scheme as
// pointcontrast_tpu/sparse/hashing.py).  Lookups per kernel offset reuse
// key linearity: key(c + off) = key(c) + <off, stride>.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct HashTable {
  // open addressing, power-of-two capacity, linear probing
  std::vector<int64_t> keys;
  std::vector<int32_t> vals;
  uint64_t mask;

  explicit HashTable(size_t n) {
    size_t cap = 16;
    while (cap < n * 2) cap <<= 1;
    keys.assign(cap, INT64_MIN);
    vals.assign(cap, -1);
    mask = cap - 1;
  }

  static inline uint64_t hash(int64_t k) {
    uint64_t h = static_cast<uint64_t>(k);
    h ^= h >> 33;
    h *= 0xff51afd7ed558ccdULL;
    h ^= h >> 33;
    h *= 0xc4ceb9fe1a85ec53ULL;
    h ^= h >> 33;
    return h;
  }

  inline void insert(int64_t key, int32_t val) {
    uint64_t i = hash(key) & mask;
    while (keys[i] != INT64_MIN) {
      if (keys[i] == key) return;  // keep first occurrence
      i = (i + 1) & mask;
    }
    keys[i] = key;
    vals[i] = val;
  }

  inline int32_t find(int64_t key) const {
    uint64_t i = hash(key) & mask;
    while (keys[i] != INT64_MIN) {
      if (keys[i] == key) return vals[i];
      i = (i + 1) & mask;
    }
    return -1;
  }
};

}  // namespace

extern "C" {

// Encode packed keys for [n, 4] int32 coords given int64 strides/los.
// keys[i] = sum_c (coords[i,c] - lo[c]) * stride[c]
void pc_encode_keys(const int32_t* coords, int64_t n, const int64_t* lo,
                    const int64_t* stride, int64_t* out_keys) {
  for (int64_t i = 0; i < n; ++i) {
    const int32_t* c = coords + i * 4;
    int64_t k = 0;
    for (int d = 0; d < 4; ++d) k += (static_cast<int64_t>(c[d]) - lo[d]) * stride[d];
    out_keys[i] = k;
  }
}

// Gather-map hash join: probe base[i] + off_keys[kk] against a hash of
// keys.  Serves both same-level maps (base == keys) and down / strided
// maps (base = doubled coarse keys).  out is [k * m] int32; missing -> pad.
void pc_query_map(const int64_t* keys, int64_t n, const int64_t* base,
                  int64_t m, const int64_t* off_keys, int64_t k, int32_t pad,
                  int32_t* out) {
  HashTable table(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) table.insert(keys[i], static_cast<int32_t>(i));
  for (int64_t kk = 0; kk < k; ++kk) {
    const int64_t dk = off_keys[kk];
    int32_t* row = out + kk * m;
    for (int64_t i = 0; i < m; ++i) {
      const int32_t v = table.find(base[i] + dk);
      row[i] = v >= 0 ? v : pad;
    }
  }
}

// Downsample: unique floor(c/2) in first-occurrence order.
//   coords:  [n, 4] int32 (batch, x, y, z), spatial cols halved
//   parent:  [n] out, index of each fine voxel's coarse slot
//   coarse:  [n, 4] out buffer (only first *n_coarse rows valid)
//   returns n_coarse
int64_t pc_downsample(const int32_t* coords, int64_t n, const int64_t* lo,
                      const int64_t* stride, int32_t* parent, int32_t* coarse) {
  HashTable table(static_cast<size_t>(n));
  int64_t n_coarse = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t* c = coords + i * 4;
    int32_t cc[4] = {c[0], static_cast<int32_t>(c[1] >= 0 ? c[1] / 2 : (c[1] - 1) / 2),
                     static_cast<int32_t>(c[2] >= 0 ? c[2] / 2 : (c[2] - 1) / 2),
                     static_cast<int32_t>(c[3] >= 0 ? c[3] / 2 : (c[3] - 1) / 2)};
    int64_t key = 0;
    for (int d = 0; d < 4; ++d) key += (static_cast<int64_t>(cc[d]) - lo[d]) * stride[d];
    int32_t slot = table.find(key);
    if (slot < 0) {
      slot = static_cast<int32_t>(n_coarse);
      table.insert(key, slot);
      std::memcpy(coarse + n_coarse * 4, cc, sizeof(cc));
      ++n_coarse;
    }
    parent[i] = slot;
  }
  return n_coarse;
}

}  // extern "C"
