"""Single-kernel 5-dot flash backward vs the shipping two-kernel split
(VERDICT r4 next #9 / own roadmap r5 #2).

The fused kernel (ops/attn_pallas.flash_attention_bwd_fused) issues 5
dots per (q, kv) block pair where the split issues 7 (s2 and dp are
recomputed in both kernels), at the cost of writing per-q-block dk/dv
partials (2*n_q*B*S*dh f32) and reducing them outside.  The partial
traffic is linear in S while the dot savings are quadratic, so the
trade should improve with S — this sweep measures the crossover.

Methodology: scripts/sweep_attn_r4b.py's interleaved harness (every rep
times control + candidates back-to-back in one tunnel window, ratios
within-rep; conventional-FLOPs TF/s: 10*B*S^2*dh non-causal, half
causal).

Run on the real TPU:  python scripts/sweep_bwd_fused_r5.py [2048|4096|8192|all]
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sweep_attn_r4b import sweep  # noqa: E402  (same dir)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    import jax
    from tensorforth_tpu.ops.attn_pallas import (flash_attention_bwd,
                                                 flash_attention_bwd_fused)

    print(f"devices: {jax.devices()}", flush=True)
    dh = 128
    # B scaled down with S so each rep stays ~the same wall time
    shapes = {"2048": (16, 2048), "4096": (4, 4096), "8192": (1, 8192)}

    def split(bq, bkv, causal):
        return functools.partial(flash_attention_bwd, bq=bq, bkv=bkv,
                                 causal=causal, hybrid=True)

    def fused(bq, bkv, causal):
        return functools.partial(flash_attention_bwd_fused, bq=bq,
                                 bkv=bkv, causal=causal, hybrid=True)

    for key, (b, s) in shapes.items():
        if which not in (key, "all"):
            continue
        for causal in (False, True):
            print(f"--- S={s} B={b} causal={causal} (hybrid) ---",
                  flush=True)
            sweep([(f"split 1024x512 (ship)", split(1024, 512, causal)),
                   ("fused 1024x512", fused(1024, 512, causal)),
                   ("fused 512x512", fused(512, 512, causal)),
                   ("fused 1024x1024", fused(1024, 1024, causal)),
                   ("fused 2048x512", fused(2048 if s >= 2048 else s,
                                            512, causal)),
                   ], b, s, dh, causal=causal)


if __name__ == "__main__":
    main()
