// t4core — native inner interpreter for tensorforth_tpu.
//
// Executes the token-threaded parameter memory (see vm/pmem.py for the
// cell layout) over the shared float32 data/return stacks at native
// speed.  Primitive opcodes and the scalar built-in word set run fully
// in C++; object/tensor/IO words call back into Python through a ctypes
// trampoline.  Tagged-DU semantics (low 2 mantissa bits = object/view
// flags) are preserved bit-exactly; dropped object handles are queued
// for the Python MMU to sweep.
//
// Reference behavior: src/vm/eforth.cpp nest() + vm.cpp xop1/xop2
// (epsilon compares DU_EPS=1e-6, BOOL=-1, C-truncation D2I).
//
// Build: g++ -O2 -shared -fPIC -o libt4core.so t4core.cpp

#include <cstdint>
#include <cstring>
#include <cmath>
#include <csignal>
#include <csetjmp>
#include <cstdio>

extern "C" {

struct T4VM {
    uint8_t *pmem;
    float   *ss;
    float   *rs;
    int32_t  ss_idx;
    int32_t  rs_idx;
    int32_t  ip;
    float    tos;
    int32_t  state;          // 0 STOP, 1 HOLD, 2 QUERY, 3 NEST
    int32_t  ss_sz;
    int32_t  rs_sz;
    uint32_t dropped[256];
    int32_t  n_dropped;
    // --- outer-interpreter extension (t4_outer) -----------------------
    const char *in;          // current input line (ASCII)
    int32_t  in_len;
    int32_t  in_idx;
    int32_t  vm_id;          // pmem user-area slot holding BASE
    int32_t  compile;
    int32_t  here;
    int32_t  pmem_sz;
    int32_t  py_flags;       // set by python after a callback:
                             //   bit0 = tensor-literal capture active
                             //   bit1 = dictionary changed (tables stale)
};

// dictionary snapshot for native find/compile (rebuilt by python
// whenever the word list changes)
struct T4Dict {
    const char     *nblob;   // nul-terminated names, concatenated
    const uint32_t *noffs;   // name offset per word index
    const uint8_t  *nflags;  // bit0 imm, bit1 udf
    const uint32_t *npfa;    // parameter-field address (colon words)
    int32_t         nwords;
};

typedef void (*t4_cb)(int32_t widx);

enum { P_EXIT=0, P_NEXT, P_LOOP, P_LIT, P_VAR, P_STR, P_DOTQ,
       P_BRAN, P_ZBRAN, P_FOR, P_DO, P_KEY, P_MAXOP };

enum { ST_STOP=0, ST_HOLD, ST_QUERY, ST_NEST };

static const double DU_EPS = 1.0e-6;

// ---- crash containment ------------------------------------------------------
// Reference analog: src/ten4.cu:258-272 traps SIGSEGV, reports the
// faulting address and resets the device (then exits).  Here we go one
// better: a fault inside the NATIVE ENGINE's own C code longjmps back
// to the t4_nest/t4_outer entry, the current line is aborted and the
// VM returns to QUERY — the REPL survives.  Faults raised while a
// Python callback is on the stack are NOT ours to catch (longjmp over
// CPython frames would corrupt the interpreter): the handler
// reinstalls the previous disposition and re-raises.  Thread-safe:
// the jmp target is a thread-local pointer into the guarded frame
// (multi-VM task threads each guard their own nest).
enum { PYF_FAULT = 4 };                 // py_flags bit2: python resets

static __thread sigjmp_buf *t4_jb = 0;  // armed only inside engine C code
static struct sigaction t4_prev[2];     // previous SEGV/BUS dispositions
static int t4_trap_on = 0;

static void t4_fault_handler(int sig, siginfo_t *si, void *) {
    sigjmp_buf *jb = t4_jb;
    if (jb) {
        t4_jb = 0;
        siglongjmp(*jb, sig);           // unwind to the engine entry
    }
    // not in engine C code (python/JAX frame, foreign thread): restore
    // the previous disposition and let the fault take its course
    sigaction(sig, &t4_prev[sig == SIGBUS ? 1 : 0], 0);
    raise(sig);
}

static void t4_trap_install(void) {
    if (t4_trap_on) return;
    struct sigaction sa;
    memset(&sa, 0, sizeof(sa));
    sigemptyset(&sa.sa_mask);
    sa.sa_sigaction = t4_fault_handler;
    sa.sa_flags = SA_SIGINFO | SA_NODEFER;
    sigaction(SIGSEGV, &sa, &t4_prev[0]);
    sigaction(SIGBUS,  &sa, &t4_prev[1]);
    t4_trap_on = 1;
}

static void t4_faulted(T4VM *vm, int sig) {
    fprintf(stderr, "t4core: fatal signal %d trapped in native engine "
                    "— line aborted, VM reset to QUERY\n", sig);
    vm->ip = 0;
    vm->state = ST_QUERY;
    vm->compile = 0;
    vm->py_flags |= PYF_FAULT;          // python clears stacks + reports
}

// RAII-ish guard: arm = point t4_jb at the caller's frame-local buf,
// remembering the outer one (nest can re-enter through callbacks)
struct T4Guard {
    sigjmp_buf *prev;
    sigjmp_buf  jb;
};
static inline void guard_arm(T4Guard *g)    { g->prev = t4_jb; t4_jb = &g->jb; }
static inline void guard_drop(T4Guard *g)   { t4_jb = g->prev; }
// callbacks run python: disarm around them, re-arm after
static inline void guarded_cb(T4Guard *g, t4_cb cb, int32_t x) {
    t4_jb = g->prev;
    cb(x);
    t4_jb = &g->jb;
}

// deliberate-fault probe for the recovery test (tests/test_fuzz.py):
// runs THROUGH the same guard machinery as t4_nest
int32_t t4_crash_test(T4VM *vm, int32_t kind) {
    t4_trap_install();
    T4Guard g;
    guard_arm(&g);
    int sig = sigsetjmp(g.jb, 1);
    if (sig) {
        guard_drop(&g);
        t4_faulted(vm, sig);
        return sig;
    }
    volatile int *p = (kind == 0) ? (volatile int *)0
                                  : (volatile int *)0xdeadbeef;
    int v = *p;                         // boom
    guard_drop(&g);
    return v;                           // unreachable
}

// ---- tagged-DU helpers ----------------------------------------------------
static inline uint32_t f2u(float f) { uint32_t u; memcpy(&u, &f, 4); return u; }
static inline float    u2f(uint32_t u) { float f; memcpy(&f, &u, 4); return f; }
static inline bool     is_obj(float f)  { return (f2u(f) & 1u) != 0; }
static inline bool     is_view(float f) { return (f2u(f) & 3u) == 3u; }
static inline float    as_view(float f) { return u2f(f2u(f) | 3u); }
static inline float    scal(double d) {
    float f = (float)d;
    if (!std::isfinite(f)) return f;
    return u2f(f2u(f) & ~1u);
}
static inline float dup_du(float v) { return is_obj(v) ? as_view(v) : v; }

static inline void drop_du(T4VM *vm, float v) {
    if (__builtin_expect(is_obj(v), 0))
        if (!is_view(v) && vm->n_dropped < 256)
            vm->dropped[vm->n_dropped++] = f2u(v);
}

// ---- stack ops ---------------------------------------------------------------
// Memory-safety contract (fuzz finding): fuzzed/underflowed words must
// never write outside the stack buffers — indices clamp into range and
// the Python side pads both buffers with guard slack for the bounded
// negative READS the reference's unchecked Vector also performs.
//
// r5 speed-of-light rework: TOS, the stack indices and IP live in a
// local `Hot` mirror while the interpreter runs.  Through-vm accesses
// cost a load+store per op because pmem is uint8_t* (aliases every
// field) and ss/rs are float* (alias the float tos) — the compiler had
// to spill the whole VM state around every stack write.  Locals whose
// address never escapes can't alias anything; GCC SROA puts them in
// registers.  The mirror is reloaded after every Python callback (a
// callback may mutate any field, even swap the stack buffers) and
// stored back before callbacks/returns.
struct Hot {
    float   *ss;
    float   *rs;
    int32_t  ss_sz;
    int32_t  rs_sz;
    float    tos;
    int32_t  ssi;
    int32_t  rsi;
    int32_t  ip;
};

static inline void h_load(T4VM *vm, Hot &h) {
    h.ss = vm->ss;       h.rs = vm->rs;
    h.ss_sz = vm->ss_sz; h.rs_sz = vm->rs_sz;
    h.tos = vm->tos;     h.ssi = vm->ss_idx;
    h.rsi = vm->rs_idx;  h.ip = vm->ip;
}
static inline void h_store(T4VM *vm, const Hot &h) {
    vm->tos = h.tos;
    vm->ss_idx = h.ssi;
    vm->rs_idx = h.rsi;
    vm->ip = h.ip;
}

static inline void sput(Hot &h, float v) {
    // one unsigned compare covers both clamp directions (cold)
    if (__builtin_expect((uint32_t)h.ssi >= (uint32_t)h.ss_sz, 0))
        h.ssi = h.ssi < 0 ? 0 : h.ss_sz - 1;
    h.ss[h.ssi++] = v;
}
static inline float spop(Hot &h) {
    if (h.ssi > 0) return h.ss[--h.ssi];
    h.ssi = 0;
    return 0.0f;
}
static inline void push(Hot &h, float v) {
    sput(h, h.tos);
    h.tos = v;
}
static inline float pop(Hot &h) {
    float t = h.tos;
    h.tos = h.ssi > 0 ? spop(h) : 0.0f;
    return t;
}
static inline void rpush(Hot &h, float v) {
    if (__builtin_expect((uint32_t)h.rsi >= (uint32_t)h.rs_sz, 0))
        h.rsi = h.rsi < 0 ? 0 : h.rs_sz - 1;
    h.rs[h.rsi++] = v;
}
static inline float rpop(Hot &h) {
    return h.rsi > 0 ? h.rs[--h.rsi] : 0.0f;
}
static inline int32_t d2i(float f) { return (int32_t)f; }
static inline float fbool(bool b) { return b ? -1.0f : 0.0f; }
static inline int32_t wrap32(int64_t r) { return (int32_t)(uint32_t)r; }

// ---- native scalar word set ----------------------------------------------------
// ids must match NATIVE_WORDS in runtime/native.py
enum {
    W_NOP=0, W_DUP, W_DROP, W_OVER, W_SWAP, W_ROT, W_RROT, W_PICK, W_NIP,
    W_QDUP, W_2DUP, W_2DROP, W_2OVER, W_2SWAP,
    W_ADD, W_SUB, W_MUL, W_DIV, W_MOD, W_FMOD, W_DIVMOD, W_MULDIV,
    W_MULDIVMOD, W_AND, W_OR, W_XOR, W_ABS, W_NEG, W_INVERT, W_RSHIFT,
    W_LSHIFT, W_MAX, W_MIN, W_2STAR, W_2SLASH, W_1ADD, W_1SUB,
    W_F2S, W_ROUND, W_CEIL, W_FLOOR,
    W_ZEQ, W_ZLT, W_ZGT, W_EQ, W_GT, W_LT, W_NE, W_GE, W_LE, W_ULT, W_UGT,
    W_TOR, W_RFROM, W_RAT, W_I, W_EXIT, W_BL, W_DEPTH, W_NWORDS
};

static inline void native_word_h(T4VM *vm, Hot &h, int id) {
    switch (id) {
    case W_NOP: break;
    case W_DUP:  push(h, dup_du(h.tos)); break;
    case W_DROP: { drop_du(vm, h.tos);
                   h.tos = h.ssi > 0 ? spop(h) : 0.0f; } break;
    case W_OVER: push(h, dup_du(h.ss[h.ssi - 1])); break;
    case W_SWAP: { float n = spop(h); push(h, n); } break;
    case W_ROT:  { float n = spop(h);
                   float m = spop(h);
                   sput(h, n); push(h, m); } break;
    case W_RROT: { float n = spop(h);
                   float m = spop(h);
                   push(h, m); push(h, n); } break;
    case W_PICK: { int i = d2i(h.tos);
                   h.tos = (i > 0 && i <= h.ssi)
                                   ? dup_du(h.ss[h.ssi - i])
                                   : dup_du(h.tos); } break;
    case W_NIP:  if (h.ssi > 0) --h.ssi; break;
    case W_QDUP: if (h.tos != 0.0f) push(h, h.tos); break;
    case W_2DUP: { float v = dup_du(h.ss[h.ssi - 1]); push(h, v);
                   v = dup_du(h.ss[h.ssi - 1]); push(h, v); } break;
    case W_2DROP:{ float s = spop(h); drop_du(vm, s);
                   drop_du(vm, h.tos);
                   h.tos = h.ssi > 0 ? spop(h) : 0.0f; } break;
    case W_2OVER:{ float v = dup_du(h.ss[h.ssi - 3]); push(h, v);
                   v = dup_du(h.ss[h.ssi - 3]); push(h, v); } break;
    case W_2SWAP:{ float n = spop(h);
                   float m = spop(h);
                   float l = spop(h);
                   sput(h, n); push(h, l); push(h, m); } break;
    // --- FPU (double intermediate to match numpy float64 math) ---
    case W_ADD: { double t = h.tos, n = spop(h);
                  h.tos = scal(n + t); } break;
    case W_SUB: { double t = h.tos, n = spop(h);
                  h.tos = scal(n - t); } break;
    case W_MUL: { double t = h.tos, n = spop(h);
                  h.tos = scal(n * t); } break;
    case W_DIV: { double t = h.tos, n = spop(h);
                  h.tos = scal(n / t);      // IEEE: 0/0 NaN, n/±0 ±inf
                } break;
    case W_MOD: { int32_t t = d2i(h.tos);
                  int32_t n = d2i(spop(h));
                  h.tos = scal(t ? (double)std::fmod((double)n, (double)t)
                                 : 0.0); } break;
    case W_FMOD:{ double t = h.tos, n = spop(h);
                  h.tos = scal(t != 0.0 ? std::fmod(n, t) : 0.0); } break;
    case W_DIVMOD: { double t = h.tos, n = spop(h);
                  sput(h, scal(t != 0.0 ? std::fmod(n, t) : 0.0));
                  h.tos = scal(t != 0.0 ? n / t : 0.0); } break;
    case W_MULDIV: { double n2 = (double)spop(h) * (double)spop(h);
                  double t = h.tos;
                  h.tos = scal(t != 0.0 ? n2 / t : 0.0); } break;
    case W_MULDIVMOD: { double n2 = (double)spop(h) * (double)spop(h);
                  double t = h.tos;
                  sput(h, scal(t != 0.0 ? std::fmod(n2, t) : 0.0));
                  h.tos = scal(t != 0.0 ? std::floor(n2 / t) : 0.0); } break;
    case W_AND: { int32_t t = d2i(h.tos), n = d2i(spop(h));
                  h.tos = scal(wrap32((int64_t)n & t)); } break;
    case W_OR:  { int32_t t = d2i(h.tos), n = d2i(spop(h));
                  h.tos = scal(wrap32((int64_t)n | t)); } break;
    case W_XOR: { int32_t t = d2i(h.tos), n = d2i(spop(h));
                  h.tos = scal(wrap32((int64_t)n ^ t)); } break;
    case W_ABS: h.tos = scal(std::fabs((double)h.tos)); break;
    case W_NEG: h.tos = scal(-(double)h.tos); break;
    case W_INVERT: h.tos = scal(wrap32(~(int64_t)d2i(h.tos))); break;
    case W_RSHIFT: { int32_t t = d2i(h.tos);
                  uint32_t n = (uint32_t)d2i(spop(h));
                  h.tos = scal(wrap32(n >> t)); } break;
    case W_LSHIFT: { int32_t t = d2i(h.tos);
                  int64_t n = d2i(spop(h));
                  h.tos = scal(wrap32(n << t)); } break;
    case W_MAX: { float n = spop(h);
                  if (n > h.tos) h.tos = n; } break;
    case W_MIN: { float n = spop(h);
                  if (n < h.tos) h.tos = n; } break;
    case W_2STAR:  h.tos = scal((double)h.tos * 2.0); break;
    case W_2SLASH: h.tos = scal((double)h.tos / 2.0); break;
    case W_1ADD:   h.tos = scal((double)h.tos + 1.0); break;
    case W_1SUB:   h.tos = scal((double)h.tos - 1.0); break;
    case W_F2S:    h.tos = scal((double)d2i(h.tos)); break;
    case W_ROUND:  h.tos = scal(std::copysign(
                        std::floor(std::fabs((double)h.tos) + 0.5),
                        (double)h.tos)); break;
    case W_CEIL:   h.tos = scal(std::ceil((double)h.tos)); break;
    case W_FLOOR:  h.tos = scal(std::floor((double)h.tos)); break;
    // --- logic (epsilon compares) ---
    case W_ZEQ: h.tos = fbool(std::fabs((double)h.tos) < DU_EPS); break;
    case W_ZLT: h.tos = fbool((double)h.tos < -DU_EPS); break;
    case W_ZGT: h.tos = fbool((double)h.tos > DU_EPS); break;
    case W_EQ:  { double n = spop(h);
                  h.tos = fbool(std::fabs(n - h.tos) < DU_EPS); } break;
    case W_GT:  { double n = spop(h);
                  h.tos = fbool(n - h.tos > DU_EPS); } break;
    case W_LT:  { double n = spop(h);
                  h.tos = fbool(n - h.tos < -DU_EPS); } break;
    case W_NE:  { double n = spop(h);
                  h.tos = fbool(std::fabs(n - h.tos) >= DU_EPS); } break;
    case W_GE:  { double n = spop(h);
                  h.tos = fbool(n - h.tos >= -DU_EPS); } break;
    case W_LE:  { double n = spop(h);
                  h.tos = fbool(n - h.tos <= DU_EPS); } break;
    case W_ULT: { uint32_t t = (uint32_t)d2i(h.tos);
                  uint32_t n = (uint32_t)d2i(spop(h));
                  h.tos = fbool(n < t); } break;
    case W_UGT: { uint32_t t = (uint32_t)d2i(h.tos);
                  uint32_t n = (uint32_t)d2i(spop(h));
                  h.tos = fbool(n > t); } break;
    // --- return stack ---
    case W_TOR:   rpush(h, pop(h)); break;
    case W_RFROM: push(h, rpop(h)); break;
    case W_RAT:   push(h, dup_du(h.rs[h.rsi - 1])); break;
    case W_I:     push(h, h.rs[h.rsi - 1]); break;
    case W_EXIT:  h.ip = d2i(rpop(h)); break;
    case W_BL:    push(h, 32.0f); break;
    case W_DEPTH: push(h, scal((double)h.ssi - 1.0)); break;
    default: break;
    }
}

// through-vm wrappers for the (cold) outer-interpreter call sites
static void native_word(T4VM *vm, int id) {
    Hot h;
    h_load(vm, h);
    native_word_h(vm, h, id);
    h_store(vm, h);
}
static inline void push_vm(T4VM *vm, float v) {
    Hot h;
    h_load(vm, h);
    push(h, v);
    h_store(vm, h);
}
static inline void rpush_vm(T4VM *vm, float v) {
    Hot h;
    h_load(vm, h);
    rpush(h, v);
    h_store(vm, h);
}

// ---- inner interpreter ------------------------------------------------------------
// table: int16 per dictionary index (>=0 native id, -1 python callback,
//        -2 udf colon word)
// cb(widx): execute python word widx; cb(-1): dataset-aware NEXT
static int32_t t4_nest_body(T4VM *vm, const int16_t *table,
                            int32_t table_len, t4_cb cb, T4Guard *G) {
    vm->state = ST_NEST;
    uint8_t *pm = vm->pmem;
    int32_t pmem_sz = vm->pmem_sz;
    Hot h;
    h_load(vm, h);
    uint32_t u = 0;
    // direct-threaded dispatch (GCC labels-as-values): one indirect
    // jump per cell, decode REPLICATED at each handler tail so the
    // branch predictor sees per-op jump sites (a central while/switch
    // costs a second taken branch per cell and folds every op's
    // successor history into one BTB slot).  ops 13..31 all mean
    // "dictionary call", same as the old switch default.
    static const void *tab[32] = {
        &&L_EXIT, &&L_NEXT, &&L_LOOP, &&L_LIT, &&L_VAR, &&L_STR,
        &&L_DOTQ, &&L_BRAN, &&L_ZBRAN, &&L_FOR, &&L_DO, &&L_KEY,
        &&L_CALL, &&L_CALL, &&L_CALL, &&L_CALL, &&L_CALL, &&L_CALL,
        &&L_CALL, &&L_CALL, &&L_CALL, &&L_CALL, &&L_CALL, &&L_CALL,
        &&L_CALL, &&L_CALL, &&L_CALL, &&L_CALL, &&L_CALL, &&L_CALL,
        &&L_CALL, &&L_CALL,
    };
    // callbacks may mutate ANY vm field (stack buffers and pmem
    // included) and python may set state/ip — spill the mirror
    // before, reload everything after, stop if python left NEST
    #define NEST_CB(x) do { h_store(vm, h); \
                            guarded_cb(G, cb, (x)); \
                            pm = vm->pmem; pmem_sz = vm->pmem_sz; \
                            h_load(vm, h); \
                            if (vm->state != ST_NEST) goto done; \
                       } while (0)
    #define DISPATCH() do { \
        if (__builtin_expect(!h.ip, 0)) goto done; \
        /* one unsigned compare covers ip<0 AND ip+8>pmem_sz */ \
        if (__builtin_expect((uint32_t)h.ip > (uint32_t)(pmem_sz - 8), \
                             0)) {  /* wild ip: stop */ \
            h.ip = 0; \
            vm->state = ST_QUERY; \
            goto done; \
        } \
        memcpy(&u, pm + h.ip, 4); \
        h.ip += 4; \
        goto *tab[(u >> 24) & 0x1F]; \
    } while (0)

    DISPATCH();

L_EXIT:
    h.ip = d2i(rpop(h));
    DISPATCH();
L_LIT: {
        // int-domain tag handling (no xmm<->gpr moves): obj literals
        // get the view bits OR'd while still in a gpr
        uint32_t uv;
        memcpy(&uv, pm + h.ip, 4);
        h.ip += 4;
        if (__builtin_expect((uint32_t)h.ssi >= (uint32_t)h.ss_sz, 0))
            h.ssi = h.ssi < 0 ? 0 : h.ss_sz - 1;
        h.ss[h.ssi++] = h.tos;
        if (__builtin_expect(uv & 1u, 0)) uv |= 3u;    // dup_du
        h.tos = u2f(uv);
        if (u & 0x80000000u) {                         // fused exit
            h.ip = d2i(rpop(h));
            DISPATCH();
        }
        // LIT+stack-word superinstruction: peek the next cell and run
        // the hot native stack words inline — the common `lit op`
        // pair then costs ONE indirect jump instead of two.  Fuse
        // only plain CALL cells (no udf/flag bits; the handlers below
        // are the IDENTICAL code L_CALL jumps to, so semantics —
        // including tagged-object handling in dup_du/drop_du — are
        // unchanged).  Any other cell falls through to DISPATCH.
        if (__builtin_expect(
                (uint32_t)h.ip <= (uint32_t)(pmem_sz - 8), 1)) {
            memcpy(&u, pm + h.ip, 4);
            if (((u >> 24) & 0x1F) >= 12 && !(u & 0xC0000000u)) {
                uint32_t io2 = u & 0xFFFFFF;
                int16_t nid2 = (int32_t)io2 < table_len
                               ? table[io2] : (int16_t)-1;
                switch (nid2) {
                case W_DROP:  h.ip += 4; goto N_DROP;
                case W_DUP:   h.ip += 4; goto N_DUP;
                case W_SWAP:  h.ip += 4; goto N_SWAP;
                case W_OVER:  h.ip += 4; goto N_OVER;
                case W_TOR:   h.ip += 4; goto N_TOR;
                case W_RFROM: h.ip += 4; goto N_RFROM;
                case W_I:     h.ip += 4; goto N_I;
                default:
                    // any other NATIVE word (`1 +`, `2 *`, `10 <`…):
                    // same guard as L_CALL — value-consuming ALU/logic
                    // words bail to the normal path when an operand is
                    // a tagged object (python's xop dispatch handles
                    // those); everything else runs inline
                    if (nid2 >= 0 &&
                        !(nid2 >= W_ADD && nid2 <= W_UGT &&
                          (is_obj(h.tos) ||
                           (h.ssi > 0 && is_obj(h.ss[h.ssi - 1])) ||
                           ((nid2 == W_MULDIV || nid2 == W_MULDIVMOD) &&
                            h.ssi > 1 && is_obj(h.ss[h.ssi - 2]))))) {
                        h.ip += 4;
                        native_word_h(vm, h, nid2);
                        DISPATCH();
                    }
                }
            }
        }
        DISPATCH();
    }
L_NEXT:
    // NB keep the counter maths xmm-resident: an int-domain load of
    // rs[rsi-1] (tried r5) put a gpr->xmm move on the loop-carried
    // dependency chain and LOST ~15%
    if (is_obj(h.tos) && h.rsi > 0 && is_obj(h.rs[h.rsi - 1])) {
        h.ip -= 4;                      // let python re-read the param
        NEST_CB(-1);                                   // dataset-aware NEXT
    }
    else {
        float v = h.rs[h.rsi - 1] - 1.0f;
        h.rs[h.rsi - 1] = v;
        if (v > -1.0f + (float)DU_EPS) h.ip = (int32_t)(u & 0xFFFFFF);
        else --h.rsi;
    }
    DISPATCH();
L_LOOP: {
        float v = h.rs[h.rsi - 1] + 1.0f;
        h.rs[h.rsi - 1] = v;
        if (h.rs[h.rsi - 2] - v > (float)DU_EPS)
            h.ip = (int32_t)(u & 0xFFFFFF);
        else h.rsi -= 2;
        DISPATCH();
    }
L_VAR: {
        uint32_t ioff = u & 0xFFFFFF;
        push(h, (float)((h.ip + 3) & ~3));
        if (ioff) h.ip = (int32_t)ioff;
        else      h.ip = d2i(rpop(h));
        DISPATCH();
    }
L_STR: {
        uint32_t ioff = u & 0xFFFFFF;
        push(h, (float)h.ip);
        push(h, (float)ioff);
        h.ip += ioff;
        DISPATCH();
    }
L_DOTQ:
    h.ip -= 4;
    NEST_CB(-2);                         // python prints the string
    DISPATCH();
L_BRAN:
    h.ip = (int32_t)(u & 0xFFFFFF);
    DISPATCH();
L_ZBRAN:
    if (is_obj(h.tos)) {                // flag is an object (e.g. a
        h.ip -= 4;                      // deferred scalar) — python
        NEST_CB(-4);                    // resolves and branches
    }
    else if (std::fabs((double)pop(h)) < DU_EPS)
        h.ip = (int32_t)(u & 0xFFFFFF);
    DISPATCH();
L_FOR:
    if (is_obj(h.tos)) {                // future count (or dataset) —
        h.ip -= 4;                      // python resolves/pushes
        NEST_CB(-5);
    }
    else rpush(h, pop(h));
    DISPATCH();
L_DO:
    if (is_obj(h.tos) ||
        (h.ssi > 0 && is_obj(h.ss[h.ssi - 1]))) {
        h.ip -= 4;
        NEST_CB(-6);
    }
    else {                              // rs.push(ss.pop()); rs.push(POP())
        rpush(h, spop(h));              // limit (NOS)
        rpush(h, h.tos);                            // index (TOS)
        h.tos = h.ssi > 0 ? spop(h) : 0.0f;
    }
    DISPATCH();
L_KEY:
    h.ip -= 4;
    NEST_CB(-3);
    DISPATCH();
L_CALL: {                               // dictionary call
        uint32_t ioff = u & 0xFFFFFF;
        if (u & 0x40000000u) {          // udf colon word
            rpush(h, (float)h.ip);
            h.ip = (int32_t)ioff;
            DISPATCH();
        }
        int16_t nid = (int32_t)ioff < table_len
                      ? table[ioff] : (int16_t)-1;
        // value-consuming ALU/logic words must not interpret
        // object-handle bit patterns as numbers: when an operand
        // at the stack top is a tagged object (tensor view,
        // deferred scalar), run the Python word instead — its
        // xop dispatch handles objects correctly.
        if (nid >= W_ADD && nid <= W_UGT &&
            (is_obj(h.tos) ||
             (h.ssi > 0 && is_obj(h.ss[h.ssi - 1])) ||
             ((nid == W_MULDIV || nid == W_MULDIVMOD) &&
              h.ssi > 1 && is_obj(h.ss[h.ssi - 2]))))
            nid = -1;
        if (__builtin_expect(nid >= 0, 1)) {
            // hottest stack words get their OWN label + dispatch tail
            // (one indirect jump site per word keeps BTB history per
            // word-pair; the generic switch shares one site)
            switch (nid) {
            case W_DROP: goto N_DROP;
            case W_DUP:  goto N_DUP;
            case W_SWAP: goto N_SWAP;
            case W_OVER: goto N_OVER;
            case W_TOR:  goto N_TOR;
            case W_RFROM: goto N_RFROM;
            case W_I:    goto N_I;
            default:
                native_word_h(vm, h, nid);
                DISPATCH();
            }
        }
        NEST_CB((int32_t)ioff);
        DISPATCH();
    }
N_DROP:
    drop_du(vm, h.tos);
    h.tos = h.ssi > 0 ? h.ss[--h.ssi] : 0.0f;
    DISPATCH();
N_DUP:
    push(h, dup_du(h.tos));
    DISPATCH();
N_SWAP: {
        float n = spop(h);
        push(h, n);
        DISPATCH();
    }
N_OVER:
    push(h, dup_du(h.ss[h.ssi - 1]));
    DISPATCH();
N_TOR:
    rpush(h, pop(h));
    DISPATCH();
N_RFROM:
    push(h, rpop(h));
    DISPATCH();
N_I:
    push(h, h.rs[h.rsi - 1]);
    DISPATCH();
done:
    #undef NEST_CB
    #undef DISPATCH
    h_store(vm, h);
    return vm->state;
}

int32_t t4_nest(T4VM *vm, const int16_t *table, int32_t table_len, t4_cb cb) {
    t4_trap_install();
    T4Guard g;
    guard_arm(&g);
    int sig = sigsetjmp(g.jb, 1);
    if (sig) {
        guard_drop(&g);
        t4_faulted(vm, sig);
        return vm->state;
    }
    int32_t r = t4_nest_body(vm, table, table_len, cb, &g);
    guard_drop(&g);
    return r;
}

// ---- outer interpreter ------------------------------------------------------
// Native port of the token loop (reference src/vm/eforth.cpp:437-483
// parse/number + src/mu/mmu.cu:107-115 dictionary find): tokenizer,
// reverse-scan find, number parser with base prefixes, compiler cells.
// Python words / immediates-in-compile / tensor-literal capture /
// unknown tokens hand control back to the host (return codes below).

enum { OUT_DONE = 0, OUT_HOLD = 1, OUT_TOKEN = 2, OUT_REENTER = 3 };
enum { PYF_TENLVL = 1, PYF_DIRTY = 2 };
static const int32_t P_MAX_OP = 12;

static int next_token(T4VM *vm, int *start, int *tlen) {
    const char *s = vm->in;
    int i = vm->in_idx, n = vm->in_len;
    while (i < n && (s[i] == ' ' || s[i] == '\t')) ++i;
    if (i >= n) { vm->in_idx = i; return 0; }
    int j = i;
    while (j < n && s[j] != ' ' && s[j] != '\t') ++j;
    *start = i; *tlen = j - i;
    vm->in_idx = j;
    return 1;
}

static int32_t dict_find(const T4Dict *d, const char *tok, int tlen) {
    for (int32_t i = d->nwords - 1; i > 0; --i) {
        const char *nm = d->nblob + d->noffs[i];
        int k = 0;
        while (k < tlen && nm[k] == tok[k]) ++k;
        if (k == tlen && nm[k] == '\0') return i;
    }
    return 0;
}

static bool parse_number(const char *tok, int tlen, int base, float *out) {
    char buf[64];
    if (tlen <= 0 || tlen >= 64) return false;
    memcpy(buf, tok, tlen);
    buf[tlen] = '\0';
    const char *p = buf;
    int b = base;
    // the BASE user byte is writable from Forth (`!` at address 0);
    // strtol with a base outside [2,36] is UB — glibc SEGFAULTS on
    // e.g. 228 (fuzz finding).  Clamp like io/fmt.to_base does.
    if (b < 2 || b > 36) b = 10;
    if (*p == '%')      { b = 2;  ++p; }
    else if (*p == '&' || *p == '#') { b = 10; ++p; }
    else if (*p == '$') { b = 16; ++p; }
    if (!*p) return false;
    if (b == 10 && strchr(p, '.')) {
        char *e;
        float f = strtof(p, &e);
        if (*e) return false;
        *out = f;
        return true;
    }
    char *e;
    long v = strtol(p, &e, b);
    if (e == p || *e) return false;
    *out = (float)v;
    return true;
}

static void compile_cell(T4VM *vm, uint32_t u) {
    memcpy(vm->pmem + vm->here, &u, 4);
    vm->here += 4;
}

static int32_t t4_outer_body(T4VM *vm, const T4Dict *dict,
                 const int16_t *table, int32_t table_len, t4_cb cb,
                 T4Guard *G) {
    int start, tlen;
    while (next_token(vm, &start, &tlen)) {
        const char *tok = vm->in + start;
        vm->state = ST_QUERY;
        int32_t w = dict_find(dict, tok, tlen);
        if (w > 0) {
            uint8_t fl = dict->nflags[w];
            bool imm = fl & 1, udf = fl & 2;
            if (vm->compile && !imm) {                  // compile the call
                if (vm->here < 0 || vm->here + 4 > vm->pmem_sz) goto bounce;
                uint32_t u = ((uint32_t)P_MAX_OP << 24)
                           | (udf ? (dict->npfa[w] & 0xFFFFFF) | 0x40000000u
                                  : (uint32_t)w & 0xFFFFFF);
                compile_cell(vm, u);
                continue;
            }
            if (udf) {                                  // interpret colon word
                vm->ip = 0;
                rpush_vm(vm, 0.0f);
                vm->ip = (int32_t)dict->npfa[w];
                vm->state = ST_NEST;
                t4_nest(vm, table, table_len, cb);
            } else {
                int16_t nid = w < table_len ? table[w] : (int16_t)-1;
                if (nid >= W_ADD && nid <= W_UGT &&
                    (is_obj(vm->tos) ||
                     (vm->ss_idx > 0 && is_obj(vm->ss[vm->ss_idx - 1])) ||
                     ((nid == W_MULDIV || nid == W_MULDIVMOD) &&
                      vm->ss_idx > 1 && is_obj(vm->ss[vm->ss_idx - 2]))))
                    nid = -1;
                if (nid >= 0) native_word(vm, nid);
                else guarded_cb(G, cb, w);                             // python word
            }
            if (vm->py_flags & PYF_FAULT)  return OUT_DONE;  // abort line
            // interactive word completed: back to input mode.  The
            // reference leaves NEST and runs NEST VMs anyway
            // (ten4.cu:78-86); here NEST is reserved for thread-busy
            // task VMs, so a lingering NEST would make the CLI sweep
            // skip this VM and silently drain stdin.
            if (vm->state == ST_NEST) vm->state = ST_QUERY;
            if (vm->state == ST_HOLD) return OUT_HOLD;
            if (vm->py_flags & PYF_TENLVL) return OUT_REENTER;
            if (vm->py_flags & PYF_DIRTY)  return OUT_REENTER;
            continue;
        }
        {   // number?
            float f;
            int b = vm->pmem[vm->vm_id];                // BASE user area
            if (parse_number(tok, tlen, b, &f)) {
                float v = scal((double)f);
                if (vm->compile) {
                    if (vm->here < 0 || vm->here + 8 > vm->pmem_sz) goto bounce;
                    compile_cell(vm, (uint32_t)3 << 24);      // P_LIT
                    memcpy(vm->pmem + vm->here, &v, 4);
                    vm->here += 4;
                } else {
                    push_vm(vm, v);
                }
                continue;
            }
        }
    bounce:                     // python handles this token (immediate in
        vm->in_idx = start;     // compile mode, literal capture, unknown)
        return OUT_TOKEN;
    }
    return OUT_DONE;
}

int32_t t4_outer(T4VM *vm, const T4Dict *dict,
                 const int16_t *table, int32_t table_len, t4_cb cb) {
    t4_trap_install();
    T4Guard g;
    guard_arm(&g);
    int sig = sigsetjmp(g.jb, 1);
    if (sig) {
        guard_drop(&g);
        t4_faulted(vm, sig);
        return OUT_DONE;
    }
    int32_t r = t4_outer_body(vm, dict, table, table_len, cb, &g);
    guard_drop(&g);
    return r;
}

}  // extern "C"
