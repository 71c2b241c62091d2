// Stub of xxhash.h (vendored inside the absent MMseqs2 submodule).
// Self-contained XXH64 implemented from the public xxHash specification
// (https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md).
// Only XXH64 is used by the reference (SeqIterator min-hash sketches and
// intergenic 23-mer lists). Test scaffolding.
#ifndef STUB_XXHASH_H
#define STUB_XXHASH_H

#include <cstddef>
#include <cstdint>
#include <cstring>

typedef uint64_t XXH64_hash_t;

namespace xxh_stub {
static const uint64_t P1 = 11400714785074694791ULL;
static const uint64_t P2 = 14029467366897019727ULL;
static const uint64_t P3 = 1609587929392839161ULL;
static const uint64_t P4 = 9650029242287828579ULL;
static const uint64_t P5 = 2870177450012600261ULL;

inline uint64_t rotl(uint64_t x, int r) { return (x << r) | (x >> (64 - r)); }
inline uint64_t read64(const void *p) { uint64_t v; memcpy(&v, p, 8); return v; }
inline uint32_t read32(const void *p) { uint32_t v; memcpy(&v, p, 4); return v; }
inline uint64_t round_(uint64_t acc, uint64_t input) {
    acc += input * P2;
    acc = rotl(acc, 31);
    acc *= P1;
    return acc;
}
inline uint64_t mergeRound(uint64_t acc, uint64_t val) {
    val = round_(0, val);
    acc ^= val;
    acc = acc * P1 + P4;
    return acc;
}
}  // namespace xxh_stub

inline XXH64_hash_t XXH64(const void *input, size_t len, uint64_t seed) {
    using namespace xxh_stub;
    const uint8_t *p = (const uint8_t *)input;
    const uint8_t *end = p + len;
    uint64_t h;
    if (len >= 32) {
        uint64_t v1 = seed + P1 + P2;
        uint64_t v2 = seed + P2;
        uint64_t v3 = seed + 0;
        uint64_t v4 = seed - P1;
        const uint8_t *limit = end - 32;
        do {
            v1 = round_(v1, read64(p)); p += 8;
            v2 = round_(v2, read64(p)); p += 8;
            v3 = round_(v3, read64(p)); p += 8;
            v4 = round_(v4, read64(p)); p += 8;
        } while (p <= limit);
        h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18);
        h = mergeRound(h, v1);
        h = mergeRound(h, v2);
        h = mergeRound(h, v3);
        h = mergeRound(h, v4);
    } else {
        h = seed + P5;
    }
    h += (uint64_t)len;
    while (p + 8 <= end) {
        h ^= round_(0, read64(p));
        h = rotl(h, 27) * P1 + P4;
        p += 8;
    }
    if (p + 4 <= end) {
        h ^= (uint64_t)read32(p) * P1;
        h = rotl(h, 23) * P2 + P3;
        p += 4;
    }
    while (p < end) {
        h ^= (*p) * P5;
        h = rotl(h, 11) * P1;
        ++p;
    }
    h ^= h >> 33;
    h *= P2;
    h ^= h >> 29;
    h *= P3;
    h ^= h >> 32;
    return h;
}

#endif
