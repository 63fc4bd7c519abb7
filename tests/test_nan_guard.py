"""err-bit NaN sentinel (reference forward.cu:60-66, t4base.h err bit,
netvm.cpp:235-237): a non-finite batch must surface as an err STOP at
the exact faulting batch under every execution mode — per-batch fused
cycles, trace-chunked K-batch dispatch (lazy detection at host
materialization, eager detection at chunk boundaries), and the
consumed single-cycle log.

The fault injector is an exploding SGD rate on a pure-linear model:
divergence compounds geometrically, so the first non-finite loss lands
a few batches in (batch 4 with lr=3e3 under T4_SEED=42) — inside the
first trace chunk (which starts at batch 2), exercising the
rollback-replay path rather than the degenerate window-start case.
"""
import numpy as np


_MODEL = """0 trace
8 28 28 1 nn.model
flatten 16 linear 10 linear softmax
constant {name}
{name} batchsize dataset mnist_train constant {name}d
"""

# `dup .` materializes every batch's loss on the host — the lazy
# sentinel's detection point; the eager test drops it (nothing
# materializes, detection must come from the chunk-boundary check)
_LOOP = ("variable {v}h 0 {v}h ! variable {v}l\n"
         ": {v}ep for forward loss.ce {probe}{v}l ! nn.hit {v}h +! "
         "backprop 3.0e3 nn.sgd next ;")


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


def _weights(m):
    return [np.array(w) for pl in m._params() for w in pl]


def test_chunked_fault_stops_at_same_batch_as_per_batch(t4, monkeypatch):
    """three sessions from identical init — per-batch fused control,
    lazy-detected chunk, eager-detected chunk — must all stop at the
    batch-4 fault with identical hit counts and identical (rolled-back)
    weights"""
    monkeypatch.setenv("T4_MAX_BATCH", "9")

    # --- control: per-batch fused cycles (chunking off) ----------------------
    monkeypatch.setenv("T4_CHUNK", "0")
    t4.forth(_MODEL.format(name="na"))
    ma = _models()[-1]
    snap = _snap(ma)
    t4.forth(_LOOP.format(v="na", probe="dup . "))
    out_a = t4.forth("nad rewind drop na nad naep drop")
    assert "ERROR: nn#forward non-finite at corpus offset 32" in out_a
    assert ma.err == 1
    ha = t4.forth("nah @ . cr").strip().split()[0]
    wa = _weights(ma)
    assert all(np.isfinite(w).all() for w in wa), \
        "control weights must be pre-step at the faulting batch"

    # --- lazy chunk: fault lands mid-chunk, detected at the `.` --------------
    monkeypatch.setenv("T4_CHUNK", "8")
    t4.forth(_MODEL.format(name="nb"))
    mb = _models()[-1]
    _pin(mb, snap)
    t4.forth(_LOOP.format(v="nb", probe="dup . "))
    out_b = t4.forth("nbd rewind drop nb nbd nbep drop")
    assert ("nn#forward non-finite at corpus offset 32 "
            "(batch 2 of the chunk at 16)") in out_b
    assert "rolled back to the faulting batch" in out_b
    assert mb.err == 1
    hb = t4.forth("nbh @ . cr").strip().split()[0]
    wb = _weights(mb)

    # --- eager chunk: no host materialization at all; the boundary
    #     check before the NEXT chunk's dispatch must catch it --------------
    monkeypatch.setenv("T4_CHUNK", "3")
    monkeypatch.setenv("T4_NAN_GUARD", "eager")
    t4.forth(_MODEL.format(name="nc"))
    mc = _models()[-1]
    _pin(mc, snap)
    t4.forth(_LOOP.format(v="nc", probe=""))
    out_c = t4.forth("ncd rewind drop nc ncd ncep drop")
    assert ("nn#forward non-finite at corpus offset 32 "
            "(batch 2 of the chunk at 16)") in out_c
    assert mc.err == 1
    hc = t4.forth("nch @ . cr").strip().split()[0]
    wc = _weights(mc)
    monkeypatch.setenv("T4_NAN_GUARD", "")

    # same stop batch: the hit counter accumulated batches 0..4 in all
    # three runs (the faulting batch's words still served; the STOP
    # lands at the next nn word, as the reference's err check does)
    assert ha == hb == hc, f"hit counters differ: {ha} {hb} {hc}"
    # same rolled-back state: weights of batches 0..3's steps only
    for i, (a, b) in enumerate(zip(wa, wb)):
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=0,
                                   err_msg=f"param {i} lazy != control")
    for i, (a, c) in enumerate(zip(wa, wc)):
        np.testing.assert_allclose(c, a, rtol=1e-5, atol=0,
                                   err_msg=f"param {i} eager != control")


def test_single_cycle_fault_attributed_from_log(t4, monkeypatch):
    """with chunking off and nothing materializing mid-loop, the whole
    epoch runs speculatively; the consumed-cycle fin log must still
    attribute the fault to the exact batch (offset 32) when the first
    non-finite value reaches the host, and flag that state has moved on"""
    monkeypatch.setenv("T4_MAX_BATCH", "9")
    monkeypatch.setenv("T4_CHUNK", "0")
    t4.forth(_MODEL.format(name="nd"))
    md = _models()[-1]
    t4.forth(_LOOP.format(v="nd", probe=""))
    out = t4.forth("ndd rewind drop nd ndd ndep drop")
    assert "ERROR" not in out          # nothing materialized yet
    assert md.err == 0
    out = t4.forth("ndl @ . cr")       # nan loss reaches the host
    assert "ERROR: nn#forward non-finite at corpus offset 32" in out
    assert "state has advanced past the faulting batch" in out
    assert md.err == 1


def test_healthy_run_stays_silent(t4, monkeypatch):
    """sane lr: per-batch materialization plus chunking must produce no
    sentinel output and leave err clear"""
    monkeypatch.setenv("T4_MAX_BATCH", "6")
    monkeypatch.setenv("T4_CHUNK", "3")
    t4.forth(_MODEL.format(name="ne"))
    me = _models()[-1]
    t4.forth(_LOOP.format(v="ne", probe="dup . ").replace("3.0e3", "0.01"))
    out = t4.forth("ned rewind drop ne ned neep drop")
    assert "ERROR" not in out and "non-finite" not in out
    assert me.err == 0
    assert all(np.isfinite(w).all() for w in _weights(me))
