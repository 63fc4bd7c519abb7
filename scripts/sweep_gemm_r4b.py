"""Round-4 confirm sweep: f32-strict (variant 3) tile choice across
sizes, before changing the mm_pallas dispatch.  Run on the real TPU."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
from sweep_gemm_r4 import sweep
from tensorforth_tpu.ops.gemm_pallas import _mm_pallas


for size in (1024, 2048, 4096):
    s = jnp.float32(1.0 / size)

    def f32(bm, bn, bk, s=s):
        return lambda a, x: _mm_pallas(a, x, bm, bn, bk) * s

    cands = [
        ("f32 256x256x1024 (cur)", f32(256, 256, 1024)),
        ("f32 512x512x1024", f32(512, 512, 1024)),
        ("f32 512x1024x512", f32(512, 1024, 512)),
        ("f32 512x1024x1024", f32(512, 1024, 1024)),
        ("f32 1024x1024x512", f32(1024, 1024, 512)),
    ]
    print(f"--- {size}^3 f32-strict confirm ---", flush=True)
    sweep(size, cands, reps=9 if size == 1024 else 7)
