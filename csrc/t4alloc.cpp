// t4alloc — Two-Level Segregated Fit (TLSF) arena allocator + fixed-size
// object-header pool for tensorforth_tpu.
//
// Reference behavior: src/mu/tlsf.{h,cpp} (O(1) malloc/free with
// L1xL2 bitmap free lists, split + coalesce) and src/mu/mpool.{h,cpp}
// (fixed-block header pool).  The TPU build uses it as the HBM-arena
// *accounting* layer: device buffers are owned by the XLA runtime, and
// this allocator tracks the same offsets/occupancy the CUDA build's
// managed-memory arena would have (mstat parity + future sub-buffer
// suballocation over a preallocated device pool).
//
// The arena is pure offset arithmetic — no backing memory is touched —
// so the identical logic can manage a real device pool later.
//
// Build: g++ -O2 -shared -fPIC -o libt4alloc.so t4alloc.cpp

#include <cstdint>
#include <cstring>

extern "C" {

static const int L2_BITS  = 3;            // 8 second-level slots
static const int L2_SLOTS = 1 << L2_BITS;
static const int L1_MAX   = 32;
static const uint32_t MIN_BLOCK = 16;
static const uint32_t ALIGN8    = 8;

struct Block {                            // boundary-tag header
    uint64_t off;                         // arena offset of payload
    uint64_t size;                        // payload size
    int32_t  free;
    int32_t  next;                        // free-list links (index)
    int32_t  prev;
    int32_t  pnext;                       // physical neighbors (index)
    int32_t  pprev;
    int32_t  used;                        // slot in use
};

static const int MAX_BLOCKS = 1 << 16;
static const int HASH_BITS  = 17;         // 2x MAX_BLOCKS: low load factor
static const int HASH_SZ    = 1 << HASH_BITS;

struct HEnt {                             // offset -> allocated block idx
    uint64_t off;
    int32_t  bi;                          // -1 empty, -2 tombstone
};

struct Arena {
    uint64_t size;
    uint64_t used_bytes;
    uint64_t peak_bytes;
    uint64_t n_alloc;
    uint64_t n_free;
    Block    blk[MAX_BLOCKS];
    int32_t  nblk;
    int32_t  free_slot;                   // recycled Block slots
    int32_t  fl[L1_MAX][L2_SLOTS];        // free lists (block index or -1)
    uint32_t l1_map;
    uint32_t l2_map[L1_MAX];
    HEnt     h[HASH_SZ];                  // O(1) free (boundary-tag analog)
};

static Arena A;

static inline uint32_t hsh(uint64_t off) {
    return (uint32_t)((off >> 3) * 2654435761u) & (HASH_SZ - 1);
}

static void h_insert(uint64_t off, int32_t bi) {
    uint32_t i = hsh(off);
    while (A.h[i].bi >= 0) i = (i + 1) & (HASH_SZ - 1);
    A.h[i].off = off;
    A.h[i].bi = bi;
}

static int32_t h_take(uint64_t off) {     // lookup + delete
    uint32_t i = hsh(off);
    // probe bound: a table saturated with tombstones must terminate
    // (a free() of an absent offset — e.g. double free — returns -1)
    for (int probes = 0; probes < HASH_SZ && A.h[i].bi != -1; ++probes) {
        if (A.h[i].bi >= 0 && A.h[i].off == off) {
            int32_t b = A.h[i].bi;
            A.h[i].bi = -2;               // tombstone
            return b;
        }
        i = (i + 1) & (HASH_SZ - 1);
    }
    return -1;
}

static inline int fls64(uint64_t v) {
    int r = -1;
    while (v) { v >>= 1; ++r; }
    return r;
}

static void mapping(uint64_t size, int *l1, int *l2) {
    int f = fls64(size);
    if (f < (int)(L2_BITS + 4)) {         // small sizes -> first level
        *l1 = 0;
        *l2 = (int)(size >> 4) & (L2_SLOTS - 1);
    } else {
        *l1 = f - (L2_BITS + 3);
        *l2 = (int)((size >> (f - L2_BITS)) & (L2_SLOTS - 1));
    }
    if (*l1 >= L1_MAX) *l1 = L1_MAX - 1;
}

static int slot_alloc() {
    if (A.free_slot >= 0) {
        int s = A.free_slot;
        A.free_slot = A.blk[s].next;
        return s;
    }
    return A.nblk < MAX_BLOCKS ? A.nblk++ : -1;
}

static void slot_release(int s) {
    A.blk[s].used = 0;
    A.blk[s].next = A.free_slot;
    A.free_slot = s;
}

static void fl_insert(int bi) {
    int l1, l2;
    mapping(A.blk[bi].size, &l1, &l2);
    A.blk[bi].free = 1;
    A.blk[bi].prev = -1;
    A.blk[bi].next = A.fl[l1][l2];
    if (A.fl[l1][l2] >= 0) A.blk[A.fl[l1][l2]].prev = bi;
    A.fl[l1][l2] = bi;
    A.l1_map |= 1u << l1;
    A.l2_map[l1] |= 1u << l2;
}

static void fl_remove(int bi) {
    int l1, l2;
    mapping(A.blk[bi].size, &l1, &l2);
    if (A.blk[bi].prev >= 0) A.blk[A.blk[bi].prev].next = A.blk[bi].next;
    else A.fl[l1][l2] = A.blk[bi].next;
    if (A.blk[bi].next >= 0) A.blk[A.blk[bi].next].prev = A.blk[bi].prev;
    if (A.fl[l1][l2] < 0) {
        A.l2_map[l1] &= ~(1u << l2);
        if (!A.l2_map[l1]) A.l1_map &= ~(1u << l1);
    }
    A.blk[bi].free = 0;
}

int32_t t4_tlsf_init(uint64_t size) {
    memset(&A, 0, sizeof(A));
    A.size = size;
    A.free_slot = -1;
    for (int i = 0; i < L1_MAX; i++)
        for (int j = 0; j < L2_SLOTS; j++)
            A.fl[i][j] = -1;
    for (int i = 0; i < HASH_SZ; i++)
        A.h[i].bi = -1;
    int s = slot_alloc();
    A.blk[s].off = 0;
    A.blk[s].size = size;
    A.blk[s].pnext = A.blk[s].pprev = -1;
    A.blk[s].used = 1;
    fl_insert(s);
    return 0;
}

// returns payload offset, or ~0ull on exhaustion
uint64_t t4_tlsf_malloc(uint64_t req) {
    if (req < MIN_BLOCK) req = MIN_BLOCK;
    req = (req + ALIGN8 - 1) & ~(uint64_t)(ALIGN8 - 1);
    // search >= mapping, scanning upward through the bitmaps
    int l1, l2;
    mapping(req, &l1, &l2);
    int bi = -1;
    for (int i = l1; i < L1_MAX && bi < 0; i++) {
        if (!(A.l1_map & (1u << i))) continue;
        int j0 = (i == l1) ? l2 : 0;
        for (int j = j0; j < L2_SLOTS; j++) {
            int b = A.fl[i][j];
            while (b >= 0 && A.blk[b].size < req) b = A.blk[b].next;
            if (b >= 0) { bi = b; break; }
        }
    }
    if (bi < 0) return ~0ull;
    fl_remove(bi);
    // split when remainder is worth keeping
    if (A.blk[bi].size >= req + MIN_BLOCK + ALIGN8) {
        int rest = slot_alloc();
        if (rest >= 0) {
            A.blk[rest].off = A.blk[bi].off + req;
            A.blk[rest].size = A.blk[bi].size - req;
            A.blk[rest].used = 1;
            A.blk[rest].pprev = bi;
            A.blk[rest].pnext = A.blk[bi].pnext;
            if (A.blk[bi].pnext >= 0) A.blk[A.blk[bi].pnext].pprev = rest;
            A.blk[bi].pnext = rest;
            A.blk[bi].size = req;
            fl_insert(rest);
        }
    }
    A.used_bytes += A.blk[bi].size;
    if (A.used_bytes > A.peak_bytes) A.peak_bytes = A.used_bytes;
    A.n_alloc++;
    h_insert(A.blk[bi].off, bi);          // O(1) free lookup
    return A.blk[bi].off;
}

int32_t t4_tlsf_free(uint64_t off) {
    int bi = h_take(off);                 // O(1) — was an O(n) scan
    if (bi < 0) return -1;
    A.used_bytes -= A.blk[bi].size;
    A.n_free++;
    // coalesce with next
    int nx = A.blk[bi].pnext;
    if (nx >= 0 && A.blk[nx].free) {
        fl_remove(nx);
        A.blk[bi].size += A.blk[nx].size;
        A.blk[bi].pnext = A.blk[nx].pnext;
        if (A.blk[nx].pnext >= 0) A.blk[A.blk[nx].pnext].pprev = bi;
        slot_release(nx);
    }
    // coalesce with prev
    int pv = A.blk[bi].pprev;
    if (pv >= 0 && A.blk[pv].free) {
        fl_remove(pv);
        A.blk[pv].size += A.blk[bi].size;
        A.blk[pv].pnext = A.blk[bi].pnext;
        if (A.blk[bi].pnext >= 0) A.blk[A.blk[bi].pnext].pprev = pv;
        slot_release(bi);
        bi = pv;
    }
    fl_insert(bi);
    return 0;
}

void t4_tlsf_status(uint64_t *out) {      // [size, used, peak, nalloc, nfree]
    out[0] = A.size;
    out[1] = A.used_bytes;
    out[2] = A.peak_bytes;
    out[3] = A.n_alloc;
    out[4] = A.n_free;
}

// sanity check: physical chain covers the arena exactly once
int32_t t4_tlsf_check() {
    uint64_t covered = 0;
    for (int i = 0; i < A.nblk; i++)
        if (A.blk[i].used) covered += A.blk[i].size;
    return covered == A.size ? 0 : -1;
}

}  // extern "C"
