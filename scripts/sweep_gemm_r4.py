"""Round-4 GEMM tile sweep (VERDICT r3 #6).

Two open questions, both answered with the interleaved-pair methodology
(every rep times XLA and each candidate back-to-back inside one tunnel
window, ratios taken within-rep):

  1. 2048^3 hybrid margin: the r3 winner is the B-RESIDENT full-N tile
     (512,2048,2048) at interleaved ratio ~1.01-1.02 with a low spread
     touching parity.  VERDICT names the untried corners: B-resident at
     bm 256/384, K-split revisits, plus an A-resident mirror.
  2. f32-strict gemm3 at 1024^3 (104 TF/s, never tuned): first tile
     sweep over the K-blocked f32 kernel.

Run on the real TPU:  python scripts/sweep_gemm_r4.py [2048|1024|all]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def make_chain(f, n_iter):
    @jax.jit
    def run(a, x):
        def body(x, _):
            return f(a, x), None
        x, _ = jax.lax.scan(body, x, None, length=n_iter)
        return x
    return run


def sweep(size, cands, reps=9):
    """cands: list of (tag, f(a, x) -> y).  Prints per-candidate GFLOP/s
    median/spread and within-rep ratio vs the first candidate (the XLA
    control)."""
    n_iter = max(64, int(8192 * (1024 / size) ** 3))
    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    a = jax.random.uniform(k1, (size, size), jnp.float32)
    x0 = jax.random.uniform(k2, (size, size), jnp.float32)
    gflop = 2.0 * size ** 3 * n_iter / 1e9

    fns = []
    for tag, f in cands:
        fn = make_chain(f, n_iter)
        t0 = time.perf_counter()
        try:
            float(fn(a, x0)[0, 0])
        except Exception as e:
            print(f"  {tag}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        print(f"  {tag}: compiled+warm {time.perf_counter()-t0:.1f}s",
              flush=True)
        fns.append((tag, fn))

    rates = {tag: [] for tag, _ in fns}
    ratios = {tag: [] for tag, _ in fns[1:]}
    for r in range(reps):
        rep = {}
        for tag, fn in fns:
            t0 = time.perf_counter()
            float(fn(a, x0)[0, 0])
            rep[tag] = gflop / (time.perf_counter() - t0)
            rates[tag].append(rep[tag])
        base = rep[fns[0][0]]
        for tag, _ in fns[1:]:
            ratios[tag].append(rep[tag] / base)
        print(f"  rep {r}: " + " ".join(f"{t}={v:.0f}" for t, v in rep.items()),
              flush=True)

    print(f"== {size}^3 summary (n_iter={n_iter}, reps={reps}) ==", flush=True)
    for tag, _ in fns:
        xs = rates[tag]
        line = (f"  {tag:28s} med {_median(xs):8.0f} GF/s "
                f"[{min(xs):.0f}, {max(xs):.0f}]")
        if tag in ratios:
            rr = ratios[tag]
            line += (f"  vs-xla med {_median(rr):.3f} "
                     f"[{min(rr):.3f}, {max(rr):.3f}]")
        print(line, flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from tensorforth_tpu.ops.gemm_pallas import _mm_pallas, _mm_pallas_v8

    print(f"devices: {jax.devices()}", flush=True)
    s2048 = jnp.float32(1.0 / 2048)
    s1024 = jnp.float32(1.0 / 1024)

    if which in ("2048", "all"):
        def v8(bm, bn, bk):
            return lambda a, x: _mm_pallas_v8(a, x, s2048, bm, bn, bk)
        cands = [
            ("xla", lambda a, x: jnp.dot(
                a, x, preferred_element_type=jnp.float32) * s2048),
            ("v8 512x2048x2048 (cur)", v8(512, 2048, 2048)),
            ("v8 256x2048x2048", v8(256, 2048, 2048)),
            ("v8 384x2048x2048", v8(384, 2048, 2048)),
            ("v8 768x2048x2048", v8(768, 2048, 2048)),
            ("v8 2048x512x2048 (A-res)", v8(2048, 512, 2048)),
            ("v8 1024x2048x1024 (K-split)", v8(1024, 2048, 1024)),
        ]
        print("--- 2048^3 hybrid sweep ---", flush=True)
        sweep(2048, cands, reps=9)

    if which in ("1024", "all"):
        def f32(bm, bn, bk):
            return (lambda a, x:
                    _mm_pallas(a, x, bm, bn, bk) * s1024)
        cands = [
            ("xla-highest", lambda a, x: jnp.dot(
                a, x, preferred_element_type=jnp.float32,
                precision="highest") * s1024),
            ("f32 256x256x1024 (cur)", f32(256, 256, 1024)),
            ("f32 512x512x1024", f32(512, 512, 1024)),
            ("f32 512x256x1024", f32(512, 256, 1024)),
            ("f32 256x512x1024", f32(256, 512, 1024)),
            ("f32 512x1024x512", f32(512, 1024, 512)),
            ("f32 1024x512x512", f32(1024, 512, 512)),
            ("f32 512x512x512", f32(512, 512, 512)),
        ]
        print("--- 1024^3 f32-strict sweep ---", flush=True)
        sweep(1024, cands, reps=9)


if __name__ == "__main__":
    main()
