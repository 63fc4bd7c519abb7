"""Trace-chunked execution (funcs.get_fused_chunk_ds): once the
canonical `forward loss.X ... backprop nn.<opt>` cycle has been
observed AND consumed once, K batches run as ONE lax.scan device
program and the words serve per-batch loss/hit values as
lazily-indexed futures.  Observable state must match unfused per-batch
execution; any out-of-cycle introspection must rollback-replay to the
exact per-batch state (correctness over speed on the rare path).

No reference analog — the reference launches kernels per word
(src/nn/forward.cu:29, backprop.cu:39); chunking is what amortizes the
~3 ms tunnel dispatch floor on a remote TPU."""
import numpy as np
import pytest


_MODEL = """0 trace
8 28 28 1 nn.model
flatten 16 linear relu 10 linear softmax
constant {name}
{name} batchsize dataset mnist_train constant {name}d
"""

_LOOP = ("variable {v}h 0 {v}h ! variable {v}l\n"
         ": {v}ep for forward loss.ce {v}l ! nn.hit {v}h +! "
         "backprop {lr} nn.adam next ;")


def _models():
    from tensorforth_tpu.mu.mmu import MMU
    return [o for o in MMU.get_mmu()._objs.values()
            if getattr(o, "is_model", lambda: False)()]


def _snap(m):
    return [tuple(np.array(w, np.float32) for w in pl)
            for pl in m._params()]


def _pin(m, snap):
    for j in range(m.numel - 1):
        for k, w in enumerate(snap[j]):
            g = m[j].grad[k]
            g.replace_data(np.asarray(w, np.float32).reshape(g.shape))


def _run_epochs(t4, name, epochs=3):
    for _ in range(epochs):
        t4.forth(f"{name}d rewind drop {name} {name}d {name}ep drop")
    hit = t4.forth(f"{name}h @ . cr").strip().split()[0]
    lox = t4.forth(f"{name}l @ . cr").strip().split()[0]
    ws = [np.array(w) for pl in _models()[-1]._params() for w in pl]
    return hit, lox, ws


def test_chunk_matches_unfused_word_loop(t4, monkeypatch):
    """7-batch window with T4_CHUNK=3 → chunks of 3+3 and a single-batch
    tail per epoch; hits, losses and weights must match a
    fusion-disabled control from the same init"""
    monkeypatch.setenv("T4_MAX_BATCH", "7")

    monkeypatch.setenv("T4_NO_FUSE", "1")
    t4.forth(_MODEL.format(name="ca"))
    snap = _snap(_models()[-1])
    t4.forth(_LOOP.format(v="ca", lr="0.001"))
    ha, la, wa = _run_epochs(t4, "ca")

    monkeypatch.setenv("T4_NO_FUSE", "0")
    monkeypatch.setenv("T4_CHUNK", "3")
    t4.forth(_MODEL.format(name="cb"))
    mb = _models()[-1]
    _pin(mb, snap)
    t4.forth(_LOOP.format(v="cb", lr="0.001"))
    hb, lb, wb = _run_epochs(t4, "cb")

    from tensorforth_tpu.nn import funcs
    assert funcs.get_fused_chunk_ds.cache_info().currsize >= 1, \
        "chunk program never built — chunking did not engage"
    assert mb._chunk is None          # epoch ends drain the chunk

    assert ha == hb, f"hit counts differ: {ha} vs {hb}"
    assert abs(float(la) - float(lb)) < 2e-5, \
        f"losses differ: {la} vs {lb}"
    for i, (a, b) in enumerate(zip(wa, wb)):
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-5,
                                   err_msg=f"param {i} chunk != unfused")


def test_chunk_midloop_introspection_rolls_back(t4, monkeypatch):
    """a weight read (nn.w) inside the loop body forces rollback-replay
    every cycle; the end state must STILL match the unfused control"""
    monkeypatch.setenv("T4_MAX_BATCH", "5")
    probe_loop = (
        "variable {v}h 0 {v}h ! variable {v}l variable {v}w\n"
        ": {v}ep for forward loss.ce {v}l ! nn.hit {v}h +! backprop "
        "dup 1 nn.w sum {v}w ! drop 0.001 nn.adam next ;")

    monkeypatch.setenv("T4_NO_FUSE", "1")
    t4.forth(_MODEL.format(name="cc"))
    snap = _snap(_models()[-1])
    t4.forth(probe_loop.format(v="cc"))
    ha, la, wa = _run_epochs(t4, "cc", epochs=2)
    pa = t4.forth("ccw @ . cr").strip().split()[0]

    monkeypatch.setenv("T4_NO_FUSE", "0")
    monkeypatch.setenv("T4_CHUNK", "4")
    t4.forth(_MODEL.format(name="cd"))
    md = _models()[-1]
    _pin(md, snap)
    t4.forth(probe_loop.format(v="cd"))
    hb, lb, wb = _run_epochs(t4, "cd", epochs=2)
    pb = t4.forth("cdw @ . cr").strip().split()[0]

    assert ha == hb
    assert abs(float(la) - float(lb)) < 2e-5
    assert abs(float(pa) - float(pb)) < 2e-4, \
        f"mid-loop weight probe differs: {pa} vs {pb}"
    for i, (a, b) in enumerate(zip(wa, wb)):
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-5,
                                   err_msg=f"param {i}")


def test_chunk_eval_loop_after_training(t4, monkeypatch):
    """an eval-only loop (forward + nn.hit, no backprop/opt) right after
    chunked training must count the same hits as the unfused control
    and must NOT move the weights"""
    monkeypatch.setenv("T4_MAX_BATCH", "6")
    eval_loop = ("variable {v}g 0 {v}g !\n"
                 ": {v}ev for forward nn.hit {v}g +! next ;")

    def session(name, no_fuse, snap=None):
        monkeypatch.setenv("T4_NO_FUSE", "1" if no_fuse else "0")
        monkeypatch.setenv("T4_CHUNK", "0" if no_fuse else "3")
        t4.forth(_MODEL.format(name=name))
        m = _models()[-1]
        if snap is None:
            snap = _snap(m)
        else:
            _pin(m, snap)
        t4.forth(_LOOP.format(v=name, lr="0.001"))
        t4.forth(f"{name}d rewind drop {name} {name}d {name}ep drop")
        t4.forth(eval_loop.format(v=name))
        t4.forth(f"{name}d rewind drop {name} {name}d {name}ev drop")
        g = t4.forth(f"{name}g @ . cr").strip().split()[0]
        ws = [np.array(w) for pl in m._params() for w in pl]
        return snap, g, ws

    snap, ga, wa = session("ce", no_fuse=True)
    _, gb, wb = session("cf", no_fuse=False, snap=snap)
    assert ga == gb, f"eval hit counts differ: {ga} vs {gb}"
    for a, b in zip(wa, wb):
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-5)


def test_chunk_respects_t4_chunk_env(t4, monkeypatch):
    """T4_CHUNK=0 (or 1) disables chunking entirely"""
    monkeypatch.setenv("T4_MAX_BATCH", "6")
    monkeypatch.setenv("T4_CHUNK", "0")
    from tensorforth_tpu.nn import funcs
    before = funcs.get_fused_chunk_ds.cache_info().currsize
    t4.forth(_MODEL.format(name="cg"))
    t4.forth(_LOOP.format(v="cg", lr="0.001"))
    t4.forth("cgd rewind drop cg cgd cgep drop")
    t4.forth("cgd rewind drop cg cgd cgep drop")
    assert funcs.get_fused_chunk_ds.cache_info().currsize == before
    m = _models()[-1]
    assert m._chunk is None and m._fuse_sig is not None


def test_peek_keys_matches_next_key_run(t4):
    """System.peek_keys must return exactly the seeds next_key() then
    produces — the chunk dispatcher's dropout-key precompute contract"""
    from tensorforth_tpu.system import System
    sys_ = System.get_sys()
    peek = sys_.peek_keys(5)
    real = [sys_.next_key() for _ in range(5)]
    assert peek == real


def test_chunk_dropout_model_matches_unfused(t4, monkeypatch):
    """dropout models chunk too (the real t4_30e topology has dropout):
    the dispatcher peeks the exact LCG seed run the served forwards
    will burn (System.peek_keys) and the scan threads one key per
    batch — masks, hits, losses and weights must match per-batch
    execution"""
    monkeypatch.setenv("T4_MAX_BATCH", "6")
    drop_model = """0 trace
8 28 28 1 nn.model
flatten 16 linear relu 0.5 dropout 10 linear softmax
constant {name}
{name} batchsize dataset mnist_train constant {name}d
"""
    from tensorforth_tpu.system import System
    from tensorforth_tpu.nn import funcs

    monkeypatch.setenv("T4_NO_FUSE", "1")
    t4.forth(drop_model.format(name="ci"))
    snap = _snap(_models()[-1])
    t4.forth(_LOOP.format(v="ci", lr="0.001"))
    System.get_sys().seed(777)
    ha, la, wa = _run_epochs(t4, "ci", epochs=2)

    monkeypatch.setenv("T4_NO_FUSE", "0")
    monkeypatch.setenv("T4_CHUNK", "3")
    before = funcs.get_fused_chunk_ds.cache_info().currsize
    t4.forth(drop_model.format(name="cj"))
    mj = _models()[-1]
    _pin(mj, snap)
    t4.forth(_LOOP.format(v="cj", lr="0.001"))
    System.get_sys().seed(777)
    hb, lb, wb = _run_epochs(t4, "cj", epochs=2)

    assert funcs.get_fused_chunk_ds.cache_info().currsize > before, \
        "dropout model never chunked"
    assert ha == hb, f"hit counts differ: {ha} vs {hb}"
    assert abs(float(la) - float(lb)) < 2e-5
    for i, (a, b) in enumerate(zip(wa, wb)):
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-5,
                                   err_msg=f"param {i} dropout chunk != unfused")


def test_chunk_lazyidx_future_resolution():
    """LazyIdx futures: lazy sums over the same vector collapse into a
    single device reduction; whole-vector coverage uses vec.sum()"""
    import jax.numpy as jnp
    from tensorforth_tpu.mu.future import Future, LazyIdx
    vec = jnp.asarray([1.0, 2.0, 4.0, 8.0], jnp.float32)
    f = Future(None, pending=[LazyIdx(vec, 0), LazyIdx(vec, 2), 3.0])
    assert f.value() == 8.0
    # whole-vector coverage
    g = Future(None, pending=[LazyIdx(vec, i) for i in range(4)])
    assert g.value() == 15.0
    # plain indexed future
    h = Future(LazyIdx(vec, 3))
    assert h.value() == 8.0


def test_chunk_dropout_with_stray_rng_consumer_rolls_back(t4, monkeypatch):
    """a non-forward RNG consumer (`randn`) inside the loop body shifts
    the host LCG, so the chunk's peeked dropout-seed run goes stale —
    the seed check in _chunk_fwd must force rollback-replay and the end
    state must STILL match unfused execution (code-review r3 finding:
    before the check, this diverged silently at 3.4e-2)"""
    monkeypatch.setenv("T4_MAX_BATCH", "6")
    drop_model = """0 trace
8 28 28 1 nn.model
flatten 16 linear relu 0.5 dropout 10 linear softmax
constant {name}
{name} batchsize dataset mnist_train constant {name}d
"""
    stray_loop = ("variable {v}h 0 {v}h ! variable {v}l\n"
                  ": {v}ep for forward loss.ce {v}l ! nn.hit {v}h +! "
                  "4 4 matrix randn drop "
                  "backprop 0.001 nn.adam next ;")
    from tensorforth_tpu.system import System

    monkeypatch.setenv("T4_NO_FUSE", "1")
    t4.forth(drop_model.format(name="ck"))
    snap = _snap(_models()[-1])
    t4.forth(stray_loop.format(v="ck"))
    System.get_sys().seed(555)
    ha, la, wa = _run_epochs(t4, "ck", epochs=2)

    monkeypatch.setenv("T4_NO_FUSE", "0")
    monkeypatch.setenv("T4_CHUNK", "3")
    t4.forth(drop_model.format(name="cl"))
    ml = _models()[-1]
    _pin(ml, snap)
    t4.forth(stray_loop.format(v="cl"))
    System.get_sys().seed(555)
    hb, lb, wb = _run_epochs(t4, "cl", epochs=2)

    assert ha == hb, f"hit counts differ: {ha} vs {hb}"
    assert abs(float(la) - float(lb)) < 2e-5
    for i, (a, b) in enumerate(zip(wa, wb)):
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-5,
                                   err_msg=f"param {i} stray-RNG chunk")
