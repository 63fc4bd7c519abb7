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
    if (is_obj(v) && !is_view(v) && vm->n_dropped < 256)
        vm->dropped[vm->n_dropped++] = f2u(v);
}

// ---- stack ops ---------------------------------------------------------------
// Memory-safety contract (fuzz finding): fuzzed/underflowed words must
// never write outside the stack buffers — indices clamp into range and
// the Python side pads both buffers with guard slack for the bounded
// negative READS the reference's unchecked Vector also performs.
static inline void sput(T4VM *vm, float v) {
    if (vm->ss_idx < 0) vm->ss_idx = 0;
    if (vm->ss_idx >= vm->ss_sz) vm->ss_idx = vm->ss_sz - 1;
    vm->ss[vm->ss_idx++] = v;
}
static inline float spop(T4VM *vm) {
    if (vm->ss_idx > 0) return vm->ss[--vm->ss_idx];
    vm->ss_idx = 0;
    return 0.0f;
}
static inline void push(T4VM *vm, float v) {
    sput(vm, vm->tos);
    vm->tos = v;
}
static inline float pop(T4VM *vm) {
    float t = vm->tos;
    vm->tos = vm->ss_idx > 0 ? spop(vm) : 0.0f;
    return t;
}
static inline void rpush(T4VM *vm, float v) {
    if (vm->rs_idx < 0) vm->rs_idx = 0;
    if (vm->rs_idx >= vm->rs_sz) vm->rs_idx = vm->rs_sz - 1;
    vm->rs[vm->rs_idx++] = v;
}
static inline float rpop(T4VM *vm) {
    return vm->rs_idx > 0 ? vm->rs[--vm->rs_idx] : 0.0f;
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

static void native_word(T4VM *vm, int id) {
    switch (id) {
    case W_NOP: break;
    case W_DUP:  push(vm, dup_du(vm->tos)); break;
    case W_DROP: { drop_du(vm, vm->tos);
                   vm->tos = vm->ss_idx > 0 ? spop(vm) : 0.0f; } break;
    case W_OVER: push(vm, dup_du(vm->ss[vm->ss_idx - 1])); break;
    case W_SWAP: { float n = spop(vm); push(vm, n); } break;
    case W_ROT:  { float n = spop(vm);
                   float m = spop(vm);
                   sput(vm, n); push(vm, m); } break;
    case W_RROT: { float n = spop(vm);
                   float m = spop(vm);
                   push(vm, m); push(vm, n); } break;
    case W_PICK: { int i = d2i(vm->tos);
                   vm->tos = (i > 0 && i <= vm->ss_idx)
                                   ? dup_du(vm->ss[vm->ss_idx - i])
                                   : dup_du(vm->tos); } break;
    case W_NIP:  if (vm->ss_idx > 0) --vm->ss_idx; break;
    case W_QDUP: if (vm->tos != 0.0f) push(vm, vm->tos); break;
    case W_2DUP: { float v = dup_du(vm->ss[vm->ss_idx - 1]); push(vm, v);
                   v = dup_du(vm->ss[vm->ss_idx - 1]); push(vm, v); } break;
    case W_2DROP:{ float s = spop(vm); drop_du(vm, s);
                   drop_du(vm, vm->tos);
                   vm->tos = vm->ss_idx > 0 ? spop(vm) : 0.0f; } break;
    case W_2OVER:{ float v = dup_du(vm->ss[vm->ss_idx - 3]); push(vm, v);
                   v = dup_du(vm->ss[vm->ss_idx - 3]); push(vm, v); } break;
    case W_2SWAP:{ float n = spop(vm);
                   float m = spop(vm);
                   float l = spop(vm);
                   sput(vm, n); push(vm, l); push(vm, m); } break;
    // --- FPU (double intermediate to match numpy float64 math) ---
    case W_ADD: { double t = vm->tos, n = spop(vm);
                  vm->tos = scal(n + t); } break;
    case W_SUB: { double t = vm->tos, n = spop(vm);
                  vm->tos = scal(n - t); } break;
    case W_MUL: { double t = vm->tos, n = spop(vm);
                  vm->tos = scal(n * t); } break;
    case W_DIV: { double t = vm->tos, n = spop(vm);
                  vm->tos = scal(n / t);    // IEEE: 0/0 NaN, n/±0 ±inf
                } break;
    case W_MOD: { int32_t t = d2i(vm->tos);
                  int32_t n = d2i(spop(vm));
                  vm->tos = scal(t ? (double)std::fmod((double)n, (double)t)
                                   : 0.0); } break;
    case W_FMOD:{ double t = vm->tos, n = spop(vm);
                  vm->tos = scal(t != 0.0 ? std::fmod(n, t) : 0.0); } break;
    case W_DIVMOD: { double t = vm->tos, n = spop(vm);
                  sput(vm, scal(t != 0.0 ? std::fmod(n, t) : 0.0));
                  vm->tos = scal(t != 0.0 ? n / t : 0.0); } break;
    case W_MULDIV: { double n2 = (double)spop(vm) * (double)spop(vm);
                  double t = vm->tos;
                  vm->tos = scal(t != 0.0 ? n2 / t : 0.0); } break;
    case W_MULDIVMOD: { double n2 = (double)spop(vm) * (double)spop(vm);
                  double t = vm->tos;
                  sput(vm, scal(t != 0.0 ? std::fmod(n2, t) : 0.0));
                  vm->tos = scal(t != 0.0 ? std::floor(n2 / t) : 0.0); } break;
    case W_AND: { int32_t t = d2i(vm->tos), n = d2i(spop(vm));
                  vm->tos = scal(wrap32((int64_t)n & t)); } break;
    case W_OR:  { int32_t t = d2i(vm->tos), n = d2i(spop(vm));
                  vm->tos = scal(wrap32((int64_t)n | t)); } break;
    case W_XOR: { int32_t t = d2i(vm->tos), n = d2i(spop(vm));
                  vm->tos = scal(wrap32((int64_t)n ^ t)); } break;
    case W_ABS: vm->tos = scal(std::fabs((double)vm->tos)); break;
    case W_NEG: vm->tos = scal(-(double)vm->tos); break;
    case W_INVERT: vm->tos = scal(wrap32(~(int64_t)d2i(vm->tos))); break;
    case W_RSHIFT: { int32_t t = d2i(vm->tos);
                  uint32_t n = (uint32_t)d2i(spop(vm));
                  vm->tos = scal(wrap32(n >> t)); } break;
    case W_LSHIFT: { int32_t t = d2i(vm->tos);
                  int64_t n = d2i(spop(vm));
                  vm->tos = scal(wrap32(n << t)); } break;
    case W_MAX: { float n = spop(vm);
                  if (n > vm->tos) vm->tos = n; } break;
    case W_MIN: { float n = spop(vm);
                  if (n < vm->tos) vm->tos = n; } break;
    case W_2STAR:  vm->tos = scal((double)vm->tos * 2.0); break;
    case W_2SLASH: vm->tos = scal((double)vm->tos / 2.0); break;
    case W_1ADD:   vm->tos = scal((double)vm->tos + 1.0); break;
    case W_1SUB:   vm->tos = scal((double)vm->tos - 1.0); break;
    case W_F2S:    vm->tos = scal((double)d2i(vm->tos)); break;
    case W_ROUND:  vm->tos = scal(std::copysign(
                        std::floor(std::fabs((double)vm->tos) + 0.5),
                        (double)vm->tos)); break;
    case W_CEIL:   vm->tos = scal(std::ceil((double)vm->tos)); break;
    case W_FLOOR:  vm->tos = scal(std::floor((double)vm->tos)); break;
    // --- logic (epsilon compares) ---
    case W_ZEQ: vm->tos = fbool(std::fabs((double)vm->tos) < DU_EPS); break;
    case W_ZLT: vm->tos = fbool((double)vm->tos < -DU_EPS); break;
    case W_ZGT: vm->tos = fbool((double)vm->tos > DU_EPS); break;
    case W_EQ:  { double n = spop(vm);
                  vm->tos = fbool(std::fabs(n - vm->tos) < DU_EPS); } break;
    case W_GT:  { double n = spop(vm);
                  vm->tos = fbool(n - vm->tos > DU_EPS); } break;
    case W_LT:  { double n = spop(vm);
                  vm->tos = fbool(n - vm->tos < -DU_EPS); } break;
    case W_NE:  { double n = spop(vm);
                  vm->tos = fbool(std::fabs(n - vm->tos) >= DU_EPS); } break;
    case W_GE:  { double n = spop(vm);
                  vm->tos = fbool(n - vm->tos >= -DU_EPS); } break;
    case W_LE:  { double n = spop(vm);
                  vm->tos = fbool(n - vm->tos <= DU_EPS); } break;
    case W_ULT: { uint32_t t = (uint32_t)d2i(vm->tos);
                  uint32_t n = (uint32_t)d2i(spop(vm));
                  vm->tos = fbool(n < t); } break;
    case W_UGT: { uint32_t t = (uint32_t)d2i(vm->tos);
                  uint32_t n = (uint32_t)d2i(spop(vm));
                  vm->tos = fbool(n > t); } break;
    // --- return stack ---
    case W_TOR:   rpush(vm, pop(vm)); break;
    case W_RFROM: push(vm, rpop(vm)); break;
    case W_RAT:   push(vm, dup_du(vm->rs[vm->rs_idx - 1])); break;
    case W_I:     push(vm, vm->rs[vm->rs_idx - 1]); break;
    case W_EXIT:  vm->ip = d2i(rpop(vm)); break;
    case W_BL:    push(vm, 32.0f); break;
    case W_DEPTH: push(vm, scal((double)vm->ss_idx - 1.0)); break;
    default: break;
    }
}

// ---- inner interpreter ------------------------------------------------------------
// table: int16 per dictionary index (>=0 native id, -1 python callback,
//        -2 udf colon word)
// cb(widx): execute python word widx; cb(-1): dataset-aware NEXT
static int32_t t4_nest_body(T4VM *vm, const int16_t *table,
                            int32_t table_len, t4_cb cb, T4Guard *G) {
    vm->state = ST_NEST;
    uint8_t *pm = vm->pmem;
    while (vm->ip && vm->state == ST_NEST) {
        if (vm->ip < 0 || vm->ip + 8 > vm->pmem_sz) {   // wild ip: stop
            vm->ip = 0;
            vm->state = ST_QUERY;
            break;
        }
        uint32_t u;
        memcpy(&u, pm + vm->ip, 4);
        uint32_t ioff = u & 0xFFFFFF;
        uint32_t op   = (u >> 24) & 0x1F;
        bool udf      = (u & 0x40000000u) != 0;
        bool fexit    = (u & 0x80000000u) != 0;
        vm->ip += 4;
        switch (op) {
        case P_EXIT: vm->ip = d2i(rpop(vm)); break;
        case P_LIT: {
            float v;
            memcpy(&v, pm + vm->ip, 4);
            sput(vm, vm->tos);
            vm->tos = dup_du(v);
            vm->ip += 4;
            if (fexit) vm->ip = d2i(rpop(vm));
        } break;
        case P_NEXT: {
            if (is_obj(vm->tos) && vm->rs_idx > 0 &&
                is_obj(vm->rs[vm->rs_idx - 1])) {
                vm->ip -= 4;            // let python re-read the param
                guarded_cb(G, cb, -1);                 // dataset-aware NEXT
            }
            else {
                float v = vm->rs[vm->rs_idx - 1] - 1.0f;
                vm->rs[vm->rs_idx - 1] = v;
                if (v > -1.0f + (float)DU_EPS) vm->ip = (int32_t)ioff;
                else --vm->rs_idx;
            }
        } break;
        case P_LOOP: {
            float v = vm->rs[vm->rs_idx - 1] + 1.0f;
            vm->rs[vm->rs_idx - 1] = v;
            if (vm->rs[vm->rs_idx - 2] - v > (float)DU_EPS)
                vm->ip = (int32_t)ioff;
            else vm->rs_idx -= 2;
        } break;
        case P_VAR: {
            push(vm, (float)((vm->ip + 3) & ~3));
            if (ioff) vm->ip = (int32_t)ioff;
            else      vm->ip = d2i(rpop(vm));
        } break;
        case P_STR:
            push(vm, (float)vm->ip);
            push(vm, (float)ioff);
            vm->ip += ioff;
            break;
        case P_DOTQ:
            vm->ip -= 4;
            guarded_cb(G, cb, -2);                     // python prints the string
            break;
        case P_BRAN: vm->ip = (int32_t)ioff; break;
        case P_ZBRAN:
            if (is_obj(vm->tos)) {      // flag is an object (e.g. a
                vm->ip -= 4;            // deferred scalar) — python
                guarded_cb(G, cb, -4);                 // resolves and branches
            }
            else if (std::fabs((double)pop(vm)) < DU_EPS)
                vm->ip = (int32_t)ioff;
            break;
        case P_FOR:
            if (is_obj(vm->tos)) {      // future count (or dataset) —
                vm->ip -= 4;            // python resolves/pushes
                guarded_cb(G, cb, -5);
            }
            else rpush(vm, pop(vm));
            break;
        case P_DO:
            if (is_obj(vm->tos) ||
                (vm->ss_idx > 0 && is_obj(vm->ss[vm->ss_idx - 1]))) {
                vm->ip -= 4;
                guarded_cb(G, cb, -6);
            }
            else {                      // rs.push(ss.pop()); rs.push(POP())
                rpush(vm, spop(vm));    // limit (NOS)
                rpush(vm, vm->tos);                 // index (TOS)
                vm->tos = vm->ss_idx > 0 ? spop(vm) : 0.0f;
            }
            break;
        case P_KEY:
            vm->ip -= 4;
            guarded_cb(G, cb, -3);
            break;
        default: {                      // dictionary call
            if (udf) {
                rpush(vm, (float)vm->ip);
                vm->ip = (int32_t)ioff;
            }
            else {
                int16_t nid = (int32_t)ioff < table_len
                              ? table[ioff] : (int16_t)-1;
                // value-consuming ALU/logic words must not interpret
                // object-handle bit patterns as numbers: when an operand
                // at the stack top is a tagged object (tensor view,
                // deferred scalar), run the Python word instead — its
                // xop dispatch handles objects correctly.
                if (nid >= W_ADD && nid <= W_UGT &&
                    (is_obj(vm->tos) ||
                     (vm->ss_idx > 0 && is_obj(vm->ss[vm->ss_idx - 1])) ||
                     ((nid == W_MULDIV || nid == W_MULDIVMOD) &&
                      vm->ss_idx > 1 && is_obj(vm->ss[vm->ss_idx - 2]))))
                    nid = -1;
                if (nid >= 0) native_word(vm, nid);
                else guarded_cb(G, cb, (int32_t)ioff);
            }
        } break;
        }
    }
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
                rpush(vm, 0.0f);
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
                    push(vm, v);
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
