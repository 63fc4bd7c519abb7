"""One-off TPU measurement: int8-KV decode vs bf16-KV vs f32 at the
production serving shape (bench.bench_serving_big).  Run alone on a
quiet box — ONE TPU client at a time (CLAUDE.md).

    python scripts/measure_int8_serving.py
"""
import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    print(f"backend: {jax.devices()[0].platform}", file=sys.stderr,
          flush=True)
    from bench import bench_serving_big
    base, opt, q8, cache_gb, batch = bench_serving_big(reps=5)
    med = statistics.median
    out = {
        "f32_tokens_per_sec_med": round(med(base), 1),
        "bf16_win_tokens_per_sec_med": round(med(opt), 1),
        "int8_win_tokens_per_sec_med": round(med(q8), 1),
        "bf16_speedup": round(med(opt) / med(base), 3),
        "int8_speedup": round(med(q8) / med(base), 3),
        "int8_vs_bf16": round(med(q8) / med(opt), 3),
        "f32_samples": [round(s, 1) for s in base],
        "bf16_samples": [round(s, 1) for s in opt],
        "int8_samples": [round(s, 1) for s in q8],
        "modeled_f32_cache_gb_per_step": round(cache_gb, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
