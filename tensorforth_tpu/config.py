"""Global configuration (mirrors reference src/ten4_config.h compile-time flags).

All sizes are runtime-configurable here instead of compile-time #defines.
"""
import os


class Config:
    # --- capability tiers (reference: T4_DO_OBJ / T4_DO_MATH / T4_DO_NN / T4_DO_TB)
    DO_OBJ  = True
    DO_MATH = True
    DO_NN   = True
    DO_TB   = True

    # --- sizing (reference: ten4_config.h)
    VM_COUNT = int(os.environ.get("T4_VM_COUNT", "1"))  # VM pool (T4_VM_COUNT)
    SS_SZ    = 64          # data stack depth        (T4_SS_SZ)
    RS_SZ    = 64          # return stack depth      (T4_RS_SZ)
    DICT_SZ  = 1024        # dictionary entries      (T4_DICT_SZ)
    PMEM_SZ  = 1 << 16     # parameter memory bytes  (T4_PMEM_SZ=48K; we round to 64K)
    NET_SZ   = 128         # max layers per model    (T4_NET_SZ)
    TFREE_SZ = 1024        # deferred-free list size (T4_TFREE_SZ)
    OSTORE_SZ = int(os.environ.get("T4_OSTORE_SZ",
                                   2 << 30))  # object-store arena bytes
    IBUF_SZ  = 1 << 16     # terminal input buffer

    # --- HBM arena ownership: T4_ARENA=1 backs tensor payloads with ONE
    # preallocated device pool sub-allocated by the native TLSF
    # (reference mmu.cu:37-53 managed-arena model); default off keeps
    # payloads as free-standing XLA buffers (best for jit/sharding)
    ARENA = bool(int(os.environ.get("T4_ARENA", "0")))

    # --- numerics
    DU_EPS = 1.0e-6        # epsilon compare (reference ten4_types.h:85)
    # matmul precision class (TPU): 'fast' = XLA default (bf16
    # multiplicands into the MXU, f32 accumulate — the throughput
    # class bench.py reports); 'strict' = f32-strict everywhere, for
    # reference-parity verification on TPU hardware.  Word-tier linalg
    # and the interactive `@`/gemm0 ops are ALWAYS f32-strict — their
    # contract is the reference's 1e-5 verify-lines (ops/engine.py,
    # ops/linalg.py); T4_PRECISION only widens strictness to the NN
    # training tier.
    PRECISION = os.environ.get("T4_PRECISION", "fast")

    # --- serving (nn/serve.py; see bench_serving_big for the numbers)
    # KV cache STORAGE dtype: 'bfloat16' halves, 'int8' quarters the
    # per-step cache stream that bounds decode at production shapes
    # (int8 = symmetric per-vector scales, lossless int8->bf16 load
    # cast, scales folded into the f32 scores/softmax weights;
    # scores/softmax/output stay f32); default f32 keeps exact
    # reference-class
    # numerics.  T4_DECODE_WIN=N sets power-of-two windowed decode —
    # mathematically EXACT (same ops over a statically smaller cache
    # prefix), so it defaults ON at 512: decodes with s_max <= 512 are
    # untouched (one segment), longer ones stream ~0.6-0.7x the cache.
    # bf16 + windows together measured 2.2x decode throughput at
    # dim=1024/KV=4096/batch=8 on v5e.  T4_DECODE_WIN=0 disables.
    KV_DTYPE = os.environ.get("T4_KV_DTYPE", "float32")
    DECODE_WIN = int(os.environ.get("T4_DECODE_WIN", "512"))

    # --- printing (reference io/aio.h:80-82)
    PRINT_THRES = 10       # max cells per dimension before elision
    PRINT_EDGE  = 3        # edge items shown when eliding
    PRINT_PREC  = 4        # fixed decimals in tensor pretty-print

    # --- deterministic init for QA (reference ten4_config.h MM_DEBUG)
    MM_DEBUG = bool(int(os.environ.get("T4_MM_DEBUG", "0")))

    # --- dataset search roots (reference hard-codes ./data; we search a few)
    DATA_ROOTS = [
        os.environ.get("T4_DATA", ""),
        "./data",
        os.path.expanduser("~/data"),
        "/root/data",
    ]
    # allow synthetic dataset fallback when corpus files are missing
    ALLOW_SYNTHETIC_DATA = bool(int(os.environ.get("T4_SYNTH_DATA", "1")))

    APP_NAME = "tensorForth-tpu"
    VERSION  = "0.1.0"
