"""Flash-attention BACKWARD block sweep (r4b tuning round).

The r4 forward work (base-2 softmax, precomputed streams, deferred
scalars) is now applied to the backward kernels; this sweep answers
which block shape wins once the VPU diet lands.  Methodology matches
scripts/sweep_gemm_r4.py: every rep times the XLA-autodiff control and
each candidate back-to-back inside one tunnel window, ratios within-rep.

TFLOP/s is normalized over the CONVENTIONAL backward FLOPs
(5 dots = 10*B*S^2*dh non-causal; half that causal) so numbers are
comparable across implementations — the two-kernel split actually
issues 7 dots (14*B*S^2*dh), so the MXU runs ~1.4x the reported rate.

Run on the real TPU:  python scripts/sweep_attn_r4b.py [hybrid|f32|causal|all]
"""
import functools
import math
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


def sweep(tag_fns, b, s, dh, causal, n_iter=24, reps=9):
    """tag_fns: [(tag, bwd(q,k,v,o,lse,do) -> (dq,dk,dv))]; first is the
    control.  Chains by feeding dq back as the next do (data dependency
    keeps the scan honest)."""
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    q = jax.random.normal(ks[0], (b, s, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, dh), jnp.float32)
    do0 = jax.random.normal(ks[3], (b, s, dh), jnp.float32)

    from tensorforth_tpu.ops.attn_pallas import flash_attention
    o, lse = flash_attention(q, k, v, causal=causal, return_lse=True,
                             hybrid=True)
    o = jax.block_until_ready(o)

    def chain(f):
        @jax.jit
        def run(q, k, v, o, lse, do):
            def body(do, _):
                dq, dk, dv = f(q, k, v, o, lse, do)
                return dq, None
            do, _ = jax.lax.scan(body, do, None, length=n_iter)
            return do
        return run

    tflop = (5 if causal else 10) * b * s * s * dh * n_iter / 1e12

    fns = []
    for tag, f in tag_fns:
        fn = chain(f)
        t0 = time.perf_counter()
        try:
            float(fn(q, k, v, o, lse, do0)[0, 0, 0])
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
            float(fn(q, k, v, o, lse, do0)[0, 0, 0])
            rep[tag] = tflop / (time.perf_counter() - t0)
            rates[tag].append(rep[tag])
        base = rep[fns[0][0]]
        for tag, _ in fns[1:]:
            ratios[tag].append(rep[tag] / base)
        print(f"  rep {r}: " + " ".join(f"{t}={v:.1f}" for t, v in rep.items()),
              flush=True)

    print(f"== summary causal={causal} (b={b} s={s} dh={dh}, "
          f"n_iter={n_iter}, reps={reps}; conventional-FLOPs TF/s) ==",
          flush=True)
    for tag, _ in fns:
        xs = rates[tag]
        line = (f"  {tag:24s} med {_median(xs):6.1f} TF/s "
                f"[{min(xs):.1f}, {max(xs):.1f}]")
        if tag in ratios:
            rr = ratios[tag]
            line += (f"  vs-ctrl med {_median(rr):.3f} "
                     f"[{min(rr):.3f}, {max(rr):.3f}]")
        print(line, flush=True)


def xla_bwd(causal):
    def attn(q, k, v):
        dh = q.shape[-1]
        sc = jnp.einsum("nqd,nkd->nqk", q, k,
                        preferred_element_type=jnp.float32)
        sc = sc / jnp.sqrt(jnp.float32(dh))
        if causal:
            s = q.shape[1]
            qi = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
            ki = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
            sc = jnp.where(ki <= qi, sc, -1.0e30)
        w = jax.nn.softmax(sc, axis=-1)
        return jnp.einsum("nqk,nkd->nqd", w, v,
                          preferred_element_type=jnp.float32)

    def bwd(q, k, v, o, lse, do):
        _, vjp = jax.vjp(attn, q, k, v)
        return vjp(do)
    return bwd


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from tensorforth_tpu.ops.attn_pallas import flash_attention_bwd

    print(f"devices: {jax.devices()}", flush=True)
    b, s, dh = 16, 2048, 128

    def cand(bq, bkv, hybrid, causal):
        return functools.partial(flash_attention_bwd, bq=bq, bkv=bkv,
                                 causal=causal, hybrid=hybrid)

    if which in ("hybrid", "all"):
        print("--- hybrid backward, non-causal ---", flush=True)
        sweep([("xla-autodiff", xla_bwd(False)),
               ("256x256 (old default)", cand(256, 256, True, False)),
               ("512x512", cand(512, 512, True, False)),
               ("512q 1024kv", cand(512, 1024, True, False)),
               ("1024q 512kv", cand(1024, 512, True, False)),
               ("1024x1024", cand(1024, 1024, True, False)),
               ("256q 2048kv", cand(256, 2048, True, False)),
               ], b, s, dh, causal=False)

    if which in ("f32", "all"):
        print("--- f32-stream backward, non-causal ---", flush=True)
        sweep([("xla-autodiff", xla_bwd(False)),
               ("256x256 (old default)", cand(256, 256, False, False)),
               ("512x512", cand(512, 512, False, False)),
               ("1024q 512kv", cand(1024, 512, False, False)),
               ], b, s, dh, causal=False)

    if which in ("causal", "all"):
        print("--- hybrid backward, causal ---", flush=True)
        sweep([("xla-autodiff", xla_bwd(True)),
               ("256x256 (old default)", cand(256, 256, True, True)),
               ("512x512", cand(512, 512, True, True)),
               ("1024q 512kv", cand(1024, 512, True, True)),
               ], b, s, dh, causal=True)

    if which in ("fwd-causal", "all"):
        sweep_fwd_causal(b, s, dh)


def sweep_fwd_causal(b, s, dh, n_iter=48, reps=9):
    """causal FORWARD blocks (the LM-training path kept r3's 512x512;
    the base-2 diet may have moved the optimum).  TF/s over the causal
    2*B*S^2*dh FLOPs; the fully-masked-block skip halves issued work."""
    import time as _t
    from tensorforth_tpu.ops.attn_pallas import flash_attention
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (b, s, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, dh), jnp.float32)
    tflop = 2.0 * b * s * s * dh * n_iter / 1e12

    def chain(bq, bkv):
        @jax.jit
        def run(q, k, v):
            def body(q, _):
                return flash_attention(q, k, v, bq=bq, bkv=bkv,
                                       causal=True, hybrid=True), None
            q, _ = jax.lax.scan(body, q, None, length=n_iter)
            return q
        return run

    print("--- hybrid FORWARD, causal ---", flush=True)
    fns = []
    for bq, bkv in ((512, 512), (1024, 512), (512, 1024), (1024, 1024),
                    (2048, 512), (256, 512)):
        fn = chain(bq, bkv)
        t0 = _t.perf_counter()
        try:
            float(fn(q, k, v)[0, 0, 0])
        except Exception as e:
            print(f"  {bq}x{bkv}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            continue
        print(f"  {bq}x{bkv}: compiled+warm {_t.perf_counter()-t0:.1f}s",
              flush=True)
        fns.append((f"{bq}q {bkv}kv", fn))
    rates = {t: [] for t, _ in fns}
    for r in range(reps):
        for tag, fn in fns:
            t0 = _t.perf_counter()
            float(fn(q, k, v)[0, 0, 0])
            rates[tag].append(tflop / (_t.perf_counter() - t0))
    print(f"== fwd-causal summary (b={b} s={s} dh={dh}, n_iter={n_iter}; "
          f"causal 2*B*S^2*dh TF/s) ==", flush=True)
    for tag, _ in fns:
        xs = sorted(rates[tag])
        print(f"  {tag:16s} med {xs[len(xs)//2]:6.1f} TF/s "
              f"[{xs[0]:.1f}, {xs[-1]:.1f}]", flush=True)


if __name__ == "__main__":
    main()
