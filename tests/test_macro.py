"""Trace-chunk macro serve (vm/netvm.py _macro_serve, VERDICT r3 #1):
while a K-batch chunk is in flight, a loop body matching the canonical
grammar is served in one tight host loop at the dataset-aware NEXT —
zero interpreter dispatches per batch.  Semantics must be bit-identical
to per-word serving (same futures, same mark_free order, same RNG burn,
same bookkeeping), so every test here is an A/B against T4_NO_MACRO=1
from pinned init.

Reference analog: the hot loop is nest() dispatching straight into
kernels with no interpreter-language tax (src/vm/eforth.cpp:81-137)."""
import numpy as np
import pytest


_MODEL = """0 trace
8 28 28 1 nn.model
flatten 16 linear relu {drop}10 linear softmax
constant {name}
{name} batchsize dataset mnist_train constant {name}d
"""


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


def _train(t4, name, loop, epochs=2):
    from tensorforth_tpu.system import System
    System.get_sys()._rng_seed = 0x5EED      # comparable burn sequence
    t4.forth(loop)
    for _ in range(epochs):
        t4.forth(f"{name}d rewind drop {name} {name}d {name}ep drop")
    hit = t4.forth(f"{name}h @ . cr").strip().split()[0]
    lox = t4.forth(f"{name}l @ . cr").strip().split()[0]
    ws = [np.array(w) for pl in _models()[-1]._params() for w in pl]
    from tensorforth_tpu.system import System
    return hit, lox, ws, System.get_sys()._rng_seed


def _ab(t4, monkeypatch, loop_a, loop_b=None, drop="", epochs=2,
        expect_served=True):
    """run the loop with macro serving disabled then enabled, from the
    same pinned init; assert end state is identical"""
    loop_b = loop_b or loop_a
    monkeypatch.setenv("T4_MAX_BATCH", "9")
    monkeypatch.setenv("T4_CHUNK", "8")

    monkeypatch.setenv("T4_NO_MACRO", "1")
    t4.forth(_MODEL.format(name="ma", drop=drop))
    snap = _snap(_models()[-1])
    ha, la, wa, ra = _train(t4, "ma", loop_a.format(v="ma"), epochs)

    monkeypatch.setenv("T4_NO_MACRO", "0")
    t4.vm._macro_count = 0
    t4.forth(_MODEL.format(name="mb", drop=drop))
    _pin(_models()[-1], snap)
    hb, lb, wb, rb = _train(t4, "mb", loop_b.format(v="mb"), epochs)

    served = t4.vm._macro_count
    if expect_served:
        assert served > 0, "macro serve never engaged"
    else:
        assert served == 0, f"macro serve engaged on a non-canonical body"

    assert ha == hb, f"hit counts differ: {ha} vs {hb}"
    assert la == lb, f"losses differ: {la} vs {lb}"
    assert ra == rb, "RNG state diverged (seed burn mismatch)"
    for i, (a, b) in enumerate(zip(wa, wb)):
        np.testing.assert_array_equal(b, a, err_msg=f"param {i}")
    return served


def test_macro_canonical_adam(t4, monkeypatch):
    """the t4_30e cycle with literal hyper — macro must serve and end
    state must be BIT-identical to per-word serving"""
    loop = ("variable {v}h 0 {v}h ! variable {v}l\n"
            ": {v}ep for forward loss.ce {v}l ! nn.hit {v}h +! "
            "backprop 0.001 nn.adam next ;")
    _ab(t4, monkeypatch, loop)


def test_macro_dropout_seed_burn(t4, monkeypatch):
    """a dropout layer makes every served forward burn one RNG key; the
    macro must burn the same sequence (rng-state pin in _ab)"""
    loop = ("variable {v}h 0 {v}h ! variable {v}l\n"
            ": {v}ep for forward loss.ce {v}l ! nn.hit {v}h +! "
            "backprop 0.001 nn.adam next ;")
    _ab(t4, monkeypatch, loop, drop="0.3 dropout ")


def test_macro_sgd_two_literals(t4, monkeypatch):
    """two-literal optimizer arity (lr momentum nn.sgd) — the M2V
    branch of the plan's hyper mirror"""
    loop = ("variable {v}h 0 {v}h ! variable {v}l\n"
            ": {v}ep for forward loss.ce {v}l ! nn.hit {v}h +! "
            "backprop 0.01 0.9 nn.sgd next ;")
    _ab(t4, monkeypatch, loop)


def test_macro_constant_hyper_with_decay(t4, monkeypatch):
    """`lr nn.adam` where lr is a VALUE decayed by [to] between epochs
    (the t4_30e shape): the macro reads the constant's pmem cell per
    chunk and must track the decay"""
    loop = ("variable {v}h 0 {v}h ! variable {v}l 0.002 value {v}r\n"
            ": {v}ep for forward loss.ce {v}l ! nn.hit {v}h +! "
            "backprop {v}r nn.adam next "
            "  {v}r 0.5 * to {v}r ;")
    _ab(t4, monkeypatch, loop, epochs=3)


def test_macro_loss_drop_and_plus_sinks(t4, monkeypatch):
    """alternate sinks: loss accumulated with +!, hit stored with !,
    and a dropped loss — all grammar-covered"""
    loop = ("variable {v}h 0 {v}h ! variable {v}l 0 {v}l !\n"
            ": {v}ep for forward loss.ce {v}l +! loss.ce drop "
            "nn.hit {v}h ! backprop 0.001 nn.adam next ;")
    _ab(t4, monkeypatch, loop)


def test_macro_rejects_foreign_word(t4, monkeypatch):
    """a body with an extra word (the t4_30e `hint` shape) must NOT be
    macro-served — per-word serving keeps it correct"""
    loop = ("variable {v}h 0 {v}h ! variable {v}l\n"
            ": {v}nop ;\n"
            ": {v}ep for forward loss.ce {v}l ! nn.hit {v}h +! "
            "backprop 0.001 nn.adam {v}nop next ;")
    _ab(t4, monkeypatch, loop, expect_served=False)


def test_macro_serves_bulk_of_epoch(t4, monkeypatch):
    """with window 9 / chunk 8 over 2 epochs the macro should serve the
    interior batches of every chunk (first + last stay per-word)"""
    loop = ("variable {v}h 0 {v}h ! variable {v}l\n"
            ": {v}ep for forward loss.ce {v}l ! nn.hit {v}h +! "
            "backprop 0.001 nn.adam next ;")
    served = _ab(t4, monkeypatch, loop)
    assert served >= 8, f"only {served} batches macro-served"


def test_macro_midloop_probe_still_exact(t4, monkeypatch):
    """introspection AFTER an epoch (nn.w read) sees identical weights —
    the chunk drain path under macro serving"""
    monkeypatch.setenv("T4_MAX_BATCH", "9")
    monkeypatch.setenv("T4_CHUNK", "8")
    loop = ("variable {v}h 0 {v}h ! variable {v}l\n"
            ": {v}ep for forward loss.ce {v}l ! nn.hit {v}h +! "
            "backprop 0.001 nn.adam next ;")

    monkeypatch.setenv("T4_NO_MACRO", "1")
    t4.forth(_MODEL.format(name="mp", drop=""))
    snap = _snap(_models()[-1])
    t4.forth(loop.format(v="mp"))
    t4.forth("mpd rewind drop mp mpd mpep drop")
    pa = t4.forth("mp 1 nn.w sum . cr").strip().split()[0]

    monkeypatch.setenv("T4_NO_MACRO", "0")
    t4.forth(_MODEL.format(name="mq", drop=""))
    _pin(_models()[-1], snap)
    t4.forth(loop.format(v="mq"))
    t4.forth("mqd rewind drop mq mqd mqep drop")
    pb = t4.forth("mq 1 nn.w sum . cr").strip().split()[0]
    assert pa == pb, f"post-epoch weight probe differs: {pa} vs {pb}"
