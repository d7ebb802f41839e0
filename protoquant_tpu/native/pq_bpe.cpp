// Native BPE merge loop (host runtime tier, like pq_alloc.cpp).
//
// The byte-pair-encoding hot loop — repeatedly merge the lowest-rank
// adjacent symbol pair until no merge applies — runs once per pre-token on
// every encode call; this is the tokenizer's entire CPU cost. The Python
// side (protoquant_tpu/tokenizer.py) owns parsing, pre-tokenization and
// byte-level mapping; this library owns only rank lookup + the merge loop.
//
// Handle-based API: the merge table is loaded once per tokenizer into an
// open-addressing hash map keyed by (left_id, right_id); encode calls then
// run lock-free and allocation-free over caller-provided buffers.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

int32_t pq_bpe_abi_version() { return 1; }

struct BpeTable {
  // open addressing, power-of-two capacity; key 0xFFFFFFFFFFFFFFFF = empty
  std::vector<uint64_t> keys;
  std::vector<int64_t> vals;  // (rank << 32) | new_id
  uint64_t mask;
};

static inline uint64_t pair_key(int32_t a, int32_t b) {
  return (static_cast<uint64_t>(static_cast<uint32_t>(a)) << 32) |
         static_cast<uint32_t>(b);
}

static inline uint64_t hash_key(uint64_t k) {
  // splitmix64 finalizer
  k ^= k >> 30;
  k *= 0xbf58476d1ce4e5b9ULL;
  k ^= k >> 27;
  k *= 0x94d049bb133111ebULL;
  k ^= k >> 31;
  return k;
}

void* pq_bpe_new(int32_t n_merges, const int32_t* left, const int32_t* right,
                 const int32_t* out_id) {
  auto* t = new BpeTable();
  uint64_t cap = 16;
  while (cap < static_cast<uint64_t>(n_merges) * 2) cap <<= 1;
  t->keys.assign(cap, ~0ULL);
  t->vals.assign(cap, -1);
  t->mask = cap - 1;
  for (int32_t r = 0; r < n_merges; ++r) {
    uint64_t k = pair_key(left[r], right[r]);
    uint64_t i = hash_key(k) & t->mask;
    while (t->keys[i] != ~0ULL && t->keys[i] != k) i = (i + 1) & t->mask;
    if (t->keys[i] == ~0ULL) {  // first rank wins on duplicates
      t->keys[i] = k;
      t->vals[i] = (static_cast<int64_t>(r) << 32) |
                   static_cast<uint32_t>(out_id[r]);
    }
  }
  return t;
}

void pq_bpe_free(void* h) { delete static_cast<BpeTable*>(h); }

static inline int64_t lookup(const BpeTable* t, int32_t a, int32_t b) {
  uint64_t k = pair_key(a, b);
  uint64_t i = hash_key(k) & t->mask;
  while (true) {
    if (t->keys[i] == k) return t->vals[i];
    if (t->keys[i] == ~0ULL) return -1;
    i = (i + 1) & t->mask;
  }
}

// Encode one pre-token: ids[0..n) are the initial symbols; repeatedly merge
// the adjacent pair with the LOWEST merge rank (ties: leftmost) until no
// pair is mergeable. Writes the result to out (capacity n suffices — merges
// only shrink) and returns its length.
int32_t pq_bpe_encode(void* h, const int32_t* ids, int32_t n, int32_t* out) {
  const auto* t = static_cast<BpeTable*>(h);
  if (n <= 0) return 0;
  // Working copy with next-index skipping (the head is never removed:
  // merging (i, next) keeps i and unlinks next).
  std::vector<int32_t> sym(ids, ids + n);
  std::vector<int32_t> nxt(n);
  for (int32_t i = 0; i < n; ++i) nxt[i] = i + 1 < n ? i + 1 : -1;
  int32_t alive = n;
  while (alive > 1) {
    // Find the lowest-rank adjacent pair (O(n) scan per merge — pre-tokens
    // are words, n is small; no heap needed).
    int64_t best = -1;
    int32_t best_i = -1;
    for (int32_t i = 0; i != -1 && nxt[i] != -1; i = nxt[i]) {
      int64_t v = lookup(t, sym[i], sym[nxt[i]]);
      if (v >= 0 && (best < 0 || v < best)) {
        best = v;
        best_i = i;
      }
    }
    if (best < 0) break;
    int32_t j = nxt[best_i];
    sym[best_i] = static_cast<int32_t>(best & 0xFFFFFFFF);
    nxt[best_i] = nxt[j];
    --alive;
  }
  int32_t m = 0;
  for (int32_t i = 0; i != -1; i = nxt[i]) out[m++] = sym[i];
  return m;
}

}  // extern "C"
