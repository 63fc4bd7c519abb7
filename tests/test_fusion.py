"""Macro-op fusion of the canonical word training cycle (VERDICT r2
#2): after one observed `forward loss.X ... backprop nn.adam` cycle,
the next cycles run as ONE fused device program whose slices the words
apply — observable state must be IDENTICAL to the unfused path, and
any deviation (different lr, direct weight writes, eval-only loops)
must fall back safely."""
import numpy as np


_MODEL = """0 trace
8 28 28 1 nn.model
flatten 16 linear relu 10 linear softmax
constant {name}
{name} batchsize dataset mnist_train constant {name}d
"""

_LOOP = ("variable {v}h 0 {v}h ! variable {v}l\n"
         ": {v}ep for forward loss.ce {v}l ! nn.hit {v}h +! "
         "backprop {lr} nn.adam next ;")


def _weights(t4, name, n_layers=(1, 3)):
    out = []
    for j in n_layers:
        s = t4.forth(f"{name} {j} nn.w sum . cr drop").strip().split()[0]
        out.append(float(s))
    return out


def _train(t4, name, lr="0.001", epochs=3):
    t4.forth(_MODEL.format(name=name))
    t4.forth(_LOOP.format(v=name, lr=lr))
    for _ in range(epochs):
        t4.forth(f"{name}d rewind drop {name} {name}d {name}ep drop")
    hit = t4.forth(f"{name}h @ . cr").strip().split()[0]
    lox = t4.forth(f"{name}l @ . cr").strip().split()[0]
    return hit, lox, _weights(t4, name)


def test_fused_cycle_matches_unfused_word_loop(t4, monkeypatch):
    """the headline contract: identical hits, losses and weights with
    fusion on vs off, same init (T4_SEED pins the LCG; the two models
    are built back-to-back so we re-pin via nn.w= snapshots)"""
    monkeypatch.setenv("T4_MAX_BATCH", "4")
    from tensorforth_tpu.mu.mmu import MMU

    def models():
        return [o for o in MMU.get_mmu()._objs.values()
                if getattr(o, "is_model", lambda: False)()]

    monkeypatch.setenv("T4_NO_FUSE", "1")
    t4.forth(_MODEL.format(name="ma"))
    ma = models()[-1]
    snap = [tuple(np.array(w, np.float32) for w in pl)
            for pl in ma._params()]

    t4.forth(_LOOP.format(v="ma", lr="0.001"))
    for _ in range(3):
        t4.forth("mad rewind drop ma mad maep drop")
    ha = t4.forth("mah @ . cr").strip().split()[0]
    la = t4.forth("mal @ . cr").strip().split()[0]
    wa = [np.array(w) for pl in ma._params() for w in pl]

    monkeypatch.setenv("T4_NO_FUSE", "0")
    t4.forth(_MODEL.format(name="mb"))
    mb = models()[-1]
    assert mb is not ma
    for j in range(mb.numel - 1):
        for k, w in enumerate(snap[j]):
            g = mb[j].grad[k]
            g.replace_data(np.asarray(w, np.float32).reshape(g.shape))

    t4.forth(_LOOP.format(v="mb", lr="0.001"))
    for _ in range(3):
        t4.forth("mbd rewind drop mb mbd mbep drop")
    hb = t4.forth("mbh @ . cr").strip().split()[0]
    lb = t4.forth("mbl @ . cr").strip().split()[0]
    wb = [np.array(w) for pl in mb._params() for w in pl]

    # fusion must actually have engaged on model B
    assert mb._fuse_sig is not None
    from tensorforth_tpu.nn import funcs
    assert (funcs.get_fused_cycle.cache_info().currsize
            + funcs.get_fused_cycle_ds.cache_info().currsize) >= 1, \
        "fused program never built - fusion did not engage"

    assert ha == hb, f"hit counts differ: {ha} vs {hb}"
    assert la == lb, f"losses differ: {la} vs {lb}"
    # weights agree up to XLA float reassociation inside the larger
    # fused program (measured 1.5e-08 max after 12 batches); hits and
    # printed losses above are exact
    for i, (a, b) in enumerate(zip(wa, wb)):
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-6,
                                   err_msg=f"param {i} fused != unfused")


def test_fusion_lr_change_falls_back(t4, monkeypatch):
    """changing lr mid-run invalidates the speculative step and
    re-arms at the new lr; the mixed-lr run must land byte-identical
    weights to a fusion-disabled control of the same sequence"""
    monkeypatch.setenv("T4_MAX_BATCH", "4")
    from tensorforth_tpu.mu.mmu import MMU

    def models():
        return [o for o in MMU.get_mmu()._objs.values()
                if getattr(o, "is_model", lambda: False)()]

    def mixed_run(name, no_fuse, snap=None):
        monkeypatch.setenv("T4_NO_FUSE", "1" if no_fuse else "0")
        t4.forth(_MODEL.format(name=name))
        m = models()[-1]
        if snap is None:
            snap = [tuple(np.array(w, np.float32) for w in pl)
                    for pl in m._params()]
        else:
            for j in range(m.numel - 1):
                for k, w in enumerate(snap[j]):
                    g = m[j].grad[k]
                    g.replace_data(np.asarray(w, np.float32)
                                   .reshape(g.shape))
        t4.forth(_LOOP.format(v=name, lr="0.001"))
        t4.forth(f": {name}ep2 for forward loss.ce {name}l ! "
                 f"nn.hit {name}h +! backprop 0.01 nn.adam next ;")
        t4.forth(f"{name}d rewind drop {name} {name}d {name}ep drop")
        t4.forth(f"{name}d rewind drop {name} {name}d {name}ep2 drop")
        t4.forth(f"{name}d rewind drop {name} {name}d {name}ep2 drop")
        lv = t4.forth(f"{name}l @ . cr").strip().split()[0]
        ws = [np.array(w) for pl in m._params() for w in pl]
        return snap, lv, ws

    snap, la, wa = mixed_run("mc", no_fuse=True)
    _, lb, wb = mixed_run("mf", no_fuse=False, snap=snap)
    assert la == lb, f"mixed-lr losses differ: {la} vs {lb}"
    for a, b in zip(wa, wb):
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-6)
    out = t4.forth("1 2 + . cr")
    assert "3 " in out


def test_fusion_direct_weight_write_breaks_safely(t4, monkeypatch):
    """nn.w= between backprop and nn.adam must invalidate the stash:
    the manual write must survive into the next forward (not be
    clobbered by stale speculative weights)"""
    monkeypatch.setenv("T4_MAX_BATCH", "4")
    t4.forth(_MODEL.format(name="md"))
    t4.forth(_LOOP.format(v="md", lr="0.001"))
    t4.forth("mdd rewind drop md mdd mdep drop")      # arm fusion
    t4.forth("mdd rewind drop md mdd mdep drop")      # fused cycle ran
    # now a cycle with a manual weight write before the optimizer
    t4.forth("mdd rewind drop")
    t4.forth("md mdd forward loss.ce mdl ! backprop")
    t4.forth("md 160 vector ones 3 nn.w= drop")   # layer-3 w [10,16]
    t4.forth("md 0.001 nn.adam drop")
    # the written-then-stepped weight must be near all-ones (one small
    # adam step from 1.0), NOT the stale speculative value
    w = float(t4.forth("md 3 nn.w sum . cr drop").strip().split()[0])
    assert abs(w - 160.0) < 2.0, f"manual nn.w= write lost: sum={w}"


def test_fusion_eval_loop_after_training(t4, monkeypatch):
    """an eval-only loop (forward nn.hit, no optimizer) right after a
    fused training run must produce correct hits and disarm fusion
    instead of re-running the full cycle per forward"""
    monkeypatch.setenv("T4_MAX_BATCH", "4")
    from tensorforth_tpu.mu.mmu import MMU
    t4.forth(_MODEL.format(name="me"))
    t4.forth(_LOOP.format(v="me", lr="0.001"))
    t4.forth("med rewind drop me med meep drop")
    t4.forth("med rewind drop me med meep drop")      # fused cycles
    me = [o for o in MMU.get_mmu()._objs.values()
          if getattr(o, "is_model", lambda: False)()][-1]
    w_before = [np.array(w) for pl in me._params() for w in pl]
    t4.forth("variable evh 0 evh !")
    t4.forth(": evep for forward nn.hit evh +! next ;")
    t4.forth("med rewind drop me med evep drop")
    hits = int(float(t4.forth("evh @ . cr").strip().split()[0]))
    assert 0 <= hits <= 32
    # eval must not have changed the weights
    w_after = [np.array(w) for pl in me._params() for w in pl]
    for a, b in zip(w_before, w_after):
        np.testing.assert_array_equal(a, b)
    # and fusion disarmed after the first eval forward
    assert me._fuse_sig is None and me._pending is None
