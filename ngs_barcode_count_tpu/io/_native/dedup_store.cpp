// 128-bit-key hash set for PCR-duplicate collapse (reference semantics:
// info.rs:770-801 keeps a HashSet<String> of random barcodes per combo;
// here the (sample, combo, random) triple folds to a 128-bit key and one
// flat open-addressing table answers "seen before?" for a whole batch at
// memory speed).
//
// Layout: two parallel uint64 arrays (k0, k1), power-of-two capacity,
// linear probing, max load 0.7.  The empty slot sentinel is k0==0&&k1==0;
// a real all-zero key is remapped to a reserved constant (the caller's
// keys are mixed hashes, so the remap is collision-safe in practice and
// deterministic regardless).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Store {
  uint64_t* k0 = nullptr;
  uint64_t* k1 = nullptr;
  uint64_t cap = 0;   // power of two
  uint64_t size = 0;
};

constexpr uint64_t kZeroRemap0 = 0x9E3779B97F4A7C15ull;
constexpr uint64_t kZeroRemap1 = 0xD1B54A32D192ED03ull;

inline uint64_t mix(uint64_t a, uint64_t b) {
  uint64_t h = a * 0x9E3779B97F4A7C15ull ^ b;
  h ^= h >> 32;
  h *= 0xD6E8FEB86659FD93ull;
  h ^= h >> 32;
  return h;
}

void grow(Store* s, uint64_t new_cap) {
  uint64_t* n0 = static_cast<uint64_t*>(calloc(new_cap, 8));
  uint64_t* n1 = static_cast<uint64_t*>(calloc(new_cap, 8));
  uint64_t mask = new_cap - 1;
  for (uint64_t i = 0; i < s->cap; ++i) {
    uint64_t a = s->k0[i], b = s->k1[i];
    if (a == 0 && b == 0) continue;
    uint64_t j = mix(a, b) & mask;
    while (n0[j] != 0 || n1[j] != 0) j = (j + 1) & mask;
    n0[j] = a;
    n1[j] = b;
  }
  free(s->k0);
  free(s->k1);
  s->k0 = n0;
  s->k1 = n1;
  s->cap = new_cap;
}

}  // namespace

extern "C" {

void* dedup_create(uint64_t initial_cap) {
  Store* s = new Store();
  uint64_t cap = 1024;
  while (cap < initial_cap) cap <<= 1;
  s->cap = cap;
  s->k0 = static_cast<uint64_t*>(calloc(cap, 8));
  s->k1 = static_cast<uint64_t*>(calloc(cap, 8));
  return s;
}

void dedup_free(void* h) {
  Store* s = static_cast<Store*>(h);
  free(s->k0);
  free(s->k1);
  delete s;
}

uint64_t dedup_size(void* h) { return static_cast<Store*>(h)->size; }

// Insert n keys; new_mask[i] = 1 if key i was NOT present (first
// occurrence wins within the batch too).  Returns number of new keys.
uint64_t dedup_observe(void* h, const uint64_t* a, const uint64_t* b,
                       int64_t n, uint8_t* new_mask) {
  Store* s = static_cast<Store*>(h);
  uint64_t added = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (s->size * 10 >= s->cap * 7) grow(s, s->cap << 1);
    uint64_t ka = a[i], kb = b[i];
    if (ka == 0 && kb == 0) {
      ka = kZeroRemap0;
      kb = kZeroRemap1;
    }
    uint64_t mask_ = s->cap - 1;
    uint64_t j = mix(ka, kb) & mask_;
    bool found = false;
    while (s->k0[j] != 0 || s->k1[j] != 0) {
      if (s->k0[j] == ka && s->k1[j] == kb) {
        found = true;
        break;
      }
      j = (j + 1) & mask_;
    }
    if (found) {
      new_mask[i] = 0;
    } else {
      s->k0[j] = ka;
      s->k1[j] = kb;
      ++s->size;
      ++added;
      new_mask[i] = 1;
    }
  }
  return added;
}

// Export all keys (for checkpoint); out arrays must hold dedup_size().
void dedup_export(void* h, uint64_t* a, uint64_t* b) {
  Store* s = static_cast<Store*>(h);
  uint64_t n = 0;
  for (uint64_t i = 0; i < s->cap; ++i) {
    if (s->k0[i] == 0 && s->k1[i] == 0) continue;
    a[n] = s->k0[i];
    b[n] = s->k1[i];
    ++n;
  }
}

// Bulk import (for resume).
void dedup_import(void* h, const uint64_t* a, const uint64_t* b, int64_t n) {
  Store* s = static_cast<Store*>(h);
  std::vector<uint8_t> scratch(n);
  dedup_observe(h, a, b, n, scratch.data());
}

}  // extern "C"
