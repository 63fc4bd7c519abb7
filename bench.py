"""Headline benchmark — run on one real TPU chip.

Primary metric (BASELINE.json): 1024^3 GEMM GFLOP/s through the
framework's matmul path, vs the reference's best CUDA kernel
(k_gemm_tile_claude_x2: 3.2 ms on GTX 1660 = 671 GFLOP/s,
src/mu/tensor.cu:95).  Also measures the t4_30e MNIST CNN train step in
samples/sec (reported in `details`).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Methodology notes: iterations are chained (X = A @ X * s) so no
caching/deduplication layer can elide work, and timing brackets a
device sync via a final readback.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_GEMM_GFLOPS = 2.0 * 1024 ** 3 / 3.2e-3 / 1e9        # 671.1


def bench_gemm(n_iter: int = 8192, size: int = 1024) -> float:
    # n_iter sized so device time >> the ~25 ms tunnel readback RTT:
    # 8192 x 2.1 GFLOP = 17.6 TFLOP = ~100 ms at MXU rate, so the RTT
    # distorts the reported rate by <25% (r1's n_iter=512 numbers were
    # RTT-dominated and ~5x understated).
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tensorforth_tpu.ops.gemm_pallas import mm_pallas

    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    a = jax.random.uniform(k1, (size, size), jnp.float32)
    x0 = jax.random.uniform(k2, (size, size), jnp.float32)
    s = jnp.float32(1.0 / size)

    @jax.jit
    def chain_xla(a, x):
        def body(x, _):
            return jnp.dot(a, x, preferred_element_type=jnp.float32) * s, None
        x, _ = jax.lax.scan(body, x, None, length=n_iter)
        return x

    def timed(fn, reps=3, tag=""):
        print(f"[bench] compiling {tag} ...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        float(fn(a, x0)[0, 0])                 # warm & compile & sync
        print(f"[bench] {tag} compiled+warm in "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn(a, x0)
            float(r[0, 0])                     # force real readback
            best = min(best, time.perf_counter() - t0)
        return n_iter * 2.0 * size ** 3 / best / 1e9

    gf_xla = timed(chain_xla, tag="xla")

    @jax.jit
    def chain_pallas(a, x):
        def body(x, _):
            return mm_pallas(a, x, 3) * s, None
        x, _ = jax.lax.scan(body, x, None, length=n_iter)
        return x

    @jax.jit
    def chain_pallas4(a, x):
        def body(x, _):                       # gemm4: fused-scale hybrid
            return mm_pallas(a, x, 4, scale=float(1.0 / size)), None
        x, _ = jax.lax.scan(body, x, None, length=n_iter)
        return x

    try:
        gf_pal = timed(chain_pallas, tag="pallas f32-strict (gemm3)")
    except Exception:
        gf_pal = 0.0
    try:
        gf_pal4 = timed(chain_pallas4, tag="pallas hybrid (gemm4)")
    except Exception:
        gf_pal4 = 0.0
    return gf_xla, max(gf_pal, gf_pal4)


def bench_mnist(n_steps: int = 30, batch: int = 100):
    """t4_30e CNN train step samples/sec (fwd+loss+grads+Adam, one jit)"""
    import jax
    import jax.numpy as jnp
    from tensorforth_tpu.models import mnist_cnn
    from tensorforth_tpu.parallel.trainer import (make_train_step,
                                                  init_opt_state)

    model = mnist_cnn(batch=batch)
    program = model._program()
    params = model._params()
    opt = init_opt_state(params)
    step = make_train_step(program, loss="ce", lr=1e-3)
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, 28, 28, 1))
    y = jnp.tile(jnp.eye(10, dtype=jnp.float32),
                 (batch // 10, 1)).reshape(batch, 1, 10, 1)
    key = jax.random.PRNGKey(7)
    print("[bench] compiling mnist train step ...", file=sys.stderr, flush=True)
    params, opt, loss = step(params, opt, x, y, key)     # compile
    float(loss)
    t0 = time.perf_counter()
    for i in range(n_steps):
        params, opt, loss = step(params, opt, x, y,
                                 jax.random.fold_in(key, i))
    lv = float(loss)                                     # sync
    dt = time.perf_counter() - t0
    sps_interactive = n_steps * batch / dt

    # --- epoch mode: device-resident batches, lax.scan over the epoch ---
    # (the TPU-first data path: one dispatch per EPOCH, not per batch)
    from tensorforth_tpu.parallel.trainer import _loss_pure
    n_batches = 64
    xs = jax.random.uniform(jax.random.PRNGKey(1),
                            (n_batches, batch, 28, 28, 1))
    ys = jnp.tile(y[None], (n_batches, 1, 1, 1, 1))

    @jax.jit
    def epoch(params, opt_state, xs, ys, key):
        def body(carry, xy):
            p, o = carry
            x_, y_ = xy
            p, o, l = _step_body(p, o, x_, y_, key)
            return (p, o), l

        (p, o), ls = jax.lax.scan(body, (params, opt_state), (xs, ys))
        return p, o, ls.mean()

    # reuse the same optimizer math as make_train_step, un-jitted
    from tensorforth_tpu.parallel import trainer as _tr
    _step_body = _tr.make_train_step(program, loss="ce", lr=1e-3, jit=False)

    print("[bench] compiling epoch scan ...", file=sys.stderr, flush=True)
    p2, o2, l2 = epoch(params, opt, xs, ys, key)
    float(l2)
    t0 = time.perf_counter()
    p2, o2, l2 = epoch(params, opt, xs, ys, key)
    float(l2)
    dt_e = time.perf_counter() - t0
    sps_epoch = n_batches * batch / dt_e
    return sps_interactive, dt / n_steps * 1000.0, sps_epoch


def _repl():
    """fresh capture-mode interpreter (resets the singletons)"""
    import io
    from tensorforth_tpu.cli import TensorForth
    from tensorforth_tpu.system import System
    from tensorforth_tpu.mu.mmu import MMU
    from tensorforth_tpu.debug import Debug
    from tensorforth_tpu.io.aio import AIO
    System.free_sys()
    MMU.free_mmu()
    Debug.free_db()
    AIO.free_io()
    buf = io.StringIO()
    inst = TensorForth(fin=io.StringIO(""), fout=buf)

    def run(s):
        start = buf.tell()
        for line in s.split("\n"):
            inst.run_line(line)
        return buf.getvalue()[start:]

    return inst, run


def bench_word_matmul():
    """t4_20a `mx` word loop VERBATIM (examples/t4_20a.4th:19-25):
    [512,1024]@[1024,256] per cycle through the interpreter's @ word.
    Reference GTX 1660: 0.768 ms/cycle."""
    import re
    _, run = _repl()
    run("0 trace\n512 1024 matrix rand 1024 256 matrix ones")
    run(': mx dup >r clock >r for @ drop next clock r> - r> 1+ / '
        '." => " . ."  msec/cycle" cr ;')
    print("[bench] word-path mx warmup ...", file=sys.stderr, flush=True)
    run("99 mx")                                    # compile + warm
    best = float("inf")
    for _ in range(2):
        out = run("999 mx")
        best = min(best, float(re.search(r"=> ([-+\d.eE]+) ", out).group(1)))
    return best


def bench_word_epoch(n_batches: int = 100, batch: int = 100):
    """t4_30e inner training loop VERBATIM (forward / loss.ce lox ! /
    nn.hit hit +! / backprop / nn.adam per batch) — the interactive
    word-at-a-time path with deferred-scalar futures.  Returns
    (ms_per_batch, samples_per_sec)."""
    import re
    os.environ["T4_MAX_BATCH"] = str(n_batches)
    try:
        _, run = _repl()
        run(f"""0 trace
{batch} 28 28 1 nn.model
0.5 10 conv2d 2 maxpool relu flatten 100 linear relu 10 linear softmax
constant bm
bm batchsize dataset mnist_train constant bds
variable hit 0 hit ! variable lox
: ep for forward loss.ce lox ! nn.hit hit +! backprop 0.001 nn.adam next ;""")
        print("[bench] word-path epoch warmup (compiles fwd/bwd/adam) ...",
              file=sys.stderr, flush=True)
        os.environ["T4_MAX_BATCH"] = "2"
        run("bm bds ep drop hit @ . 0 hit !")       # compile + warm + sync
        os.environ["T4_MAX_BATCH"] = str(n_batches)
        run("bds rewind")
        out = run('clock bm bds ep drop clock swap - ." EPMS= " . cr '
                  'hit @ . 0 hit !')
        ms = float(re.search(r"EPMS= ([-+\d.eE]+) ", out).group(1))
        return ms / n_batches, n_batches * batch / (ms / 1e3)
    finally:
        os.environ.pop("T4_MAX_BATCH", None)


def bench_attention(nh: int = 16, s: int = 2048, dh: int = 128,
                    n_iter: int = 64):
    """flash-attention kernel vs the fused XLA einsum path at a serving
    shape ([batch*heads, S, dh]); reports (pallas, xla) TFLOP/s over
    the 4*NH*S^2*dh attention FLOPs"""
    import jax
    import jax.numpy as jnp
    from tensorforth_tpu.ops.attn_pallas import flash_attention

    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (nh, s, dh), jnp.float32)
    k = jax.random.normal(ks[1], (nh, s, dh), jnp.float32)
    v = jax.random.normal(ks[2], (nh, s, dh), jnp.float32)
    flops = 4.0 * nh * s * s * dh * n_iter

    def xla_attn(q, k, v):
        sc = jnp.einsum("nqd,nkd->nqk", q, k,
                        preferred_element_type=jnp.float32)
        w = jax.nn.softmax(sc / jnp.sqrt(jnp.float32(dh)), axis=-1)
        return jnp.einsum("nqk,nkd->nqd", w, v,
                          preferred_element_type=jnp.float32)

    def chain(f):
        @jax.jit
        def run(q, k, v):
            def body(q, _):
                return f(q, k, v), None
            q, _ = jax.lax.scan(body, q, None, length=n_iter)
            return q
        return run

    def timed(fn, tag):
        print(f"[bench] compiling attention {tag} ...", file=sys.stderr,
              flush=True)
        float(fn(q, k, v)[0, 0, 0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(q, k, v)[0, 0, 0])
            best = min(best, time.perf_counter() - t0)
        return flops / best / 1e12

    try:
        tf_pal = timed(chain(lambda q, k, v: flash_attention(q, k, v)),
                       "pallas-flash")
    except Exception:
        tf_pal = 0.0
    tf_xla = timed(chain(xla_attn), "xla")
    return tf_pal, tf_xla


def bench_serving(batch: int = 8, n_prompt: int = 32, n_new: int = 224):
    """LM decode throughput: KV-cache autoregressive generation
    (nn/serve.py) — prefill + decode as ONE device program"""
    import numpy as np
    import time as _t
    from tensorforth_tpu.models import tiny_lm
    from tensorforth_tpu.nn.serve import generate
    m = tiny_lm(batch=batch, seq=n_prompt, vocab=64, dim=64, heads=4,
                layers=2)
    rs = np.random.RandomState(0)
    prompt = rs.randint(0, 64, (batch, n_prompt))
    print("[bench] compiling LM decode loop ...", file=sys.stderr,
          flush=True)
    generate(m, prompt, n_new)                  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = generate(m, prompt, n_new)
        best = min(best, time.perf_counter() - t0)
    return batch * n_new / best


def run_accuracy_gate(epochs: int = 20, n_batches: int = 0):
    """BASELINE.md gate: t4_30e CNN to >=98% accuracy (word-level API,
    fused nn.train epochs).  Full corpus unless n_batches limits it."""
    import re
    if n_batches:
        os.environ["T4_MAX_BATCH"] = str(n_batches)
    try:
        _, run = _repl()
        run("""0 trace
100 28 28 1 nn.model
0.5 10 conv2d 2 maxpool relu flatten 100 linear relu 10 linear softmax
constant gm
gm batchsize dataset mnist_train constant gds""")
        print(f"[bench] accuracy gate: {epochs} epochs ...",
              file=sys.stderr, flush=True)
        run(f"gm gds 0.001 {epochs} nn.train")
        # held-out evaluation: mnist_test is a disjoint draw
        run("""gm batchsize dataset mnist_test constant gtd
variable gh 0 gh ! variable gn 0 gn !
: gep for forward nn.hit gh +! batchsize gn +! next ;
gm gtd gep drop""")
        out = run('gh @ gn @ / ." GATE= " . cr')
        return float(re.search(r"GATE= ([-+\d.eE]+) ", out).group(1))
    finally:
        os.environ.pop("T4_MAX_BATCH", None)


def main():
    import jax
    os.makedirs(".jax_cache", exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(".jax_cache"))
    except Exception:
        pass
    dev = jax.devices()[0]
    gf_xla, gf_pal = bench_gemm()
    sps, ms_step, sps_epoch = bench_mnist()
    ms_mx = bench_word_matmul()
    wb_ms, wb_sps = bench_word_epoch()
    try:
        lm_tps = bench_serving()
    except Exception:
        lm_tps = 0.0
    try:
        attn_pal, attn_xla = bench_attention()
    except Exception:
        attn_pal = attn_xla = 0.0
    gate = None
    if os.environ.get("T4_BENCH_GATE", "1") != "0":    # default ON
        try:
            gate = run_accuracy_gate(epochs=20)
        except Exception as e:
            print(f"[bench] gate failed: {e}", file=sys.stderr, flush=True)
    best = max(gf_xla, gf_pal)
    details = {
        "device": str(dev),
        "gemm_xla_gflops": round(gf_xla, 1),
        "gemm_pallas_gflops": round(gf_pal, 1),
        "mnist_cnn_samples_per_sec": round(sps, 0),
        "mnist_cnn_ms_per_batch100": round(ms_step, 3),
        "mnist_cnn_epoch_mode_samples_per_sec": round(sps_epoch, 0),
        "word_mx_ms_per_cycle": round(ms_mx, 4),
        "word_mx_vs_gtx1660_0.768ms": round(0.768 / ms_mx, 2),
        "word_epoch_ms_per_batch100": round(wb_ms, 3),
        "word_epoch_samples_per_sec": round(wb_sps, 0),
        "lm_decode_tokens_per_sec": round(lm_tps, 0),
        "flash_attn_2k_tflops": round(attn_pal, 1),
        "flash_attn_2k_xla_tflops": round(attn_xla, 1),
        "reference_gemm_gflops": round(REF_GEMM_GFLOPS, 1),
    }
    if gate is not None:
        details["t4_30e_test_accuracy_20ep"] = round(gate, 4)
    print(json.dumps({
        "metric": "GEMM 1024^3 f32 GFLOP/s (chained, synced)",
        "value": round(best, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(best / REF_GEMM_GFLOPS, 2),
        "details": details,
    }))


if __name__ == "__main__":
    main()
