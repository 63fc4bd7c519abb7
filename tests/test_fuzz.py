"""Deterministic interpreter fuzz: random token soup must never kill
the REPL (reference contract: unknown word -> error prompt, input
flushed, VM back to QUERY — vm.cpp:52-58)."""
import numpy as np


# words whose side effects would end or wedge a fuzz session, plus
# defining words (a fuzzed `: name` / `constant` legitimately shadows
# builtins, which would invalidate the post-fuzz probe — this fuzz
# checks crash-safety, not redefinition semantics)
_EXCLUDE = {"bye", "boot", "load", "save", "nn.load", "abort", "forget",
            "key", "included", "start", "join", "send", "recv", "pull",
            "lock", "unlock", "ms", "delay", "nn.train", "nn.pipe",
            "nn.gen", "dataset", "fetch", "rewind", "quit", "eval",
            ":", ";", "constant", "variable", "create", "value", "to",
            "is", "does>", "immediate", "task"}


def _reset(t4):
    """between fuzz lines: the user's ctrl-C equivalent — abort plus a
    direct input-mode reset (a fuzzed `:` leaves compile mode on, where
    the abort TOKEN would only be compiled, not executed)"""
    vm = t4.vm
    vm.compile = False
    if hasattr(vm, "ten_lvl"):
        vm.ten_lvl = 0
        vm._staged = None
    t4.forth("abort")


def test_fuzz_scalar_words_keep_repl_alive(t4):
    vm = t4.vm
    names = [c.name for c in vm.dict.words
             if c.name not in _EXCLUDE and not c.name.startswith(".tb")]
    rs = np.random.RandomState(1234)
    for i in range(150):
        n = rs.randint(1, 6)
        toks = []
        for _ in range(n):
            r = rs.rand()
            if r < 0.45:
                toks.append(str(rs.randint(-99, 100)))
            elif r < 0.85:
                toks.append(names[rs.randint(len(names))])
            else:
                toks.append("~garbage%d~" % rs.randint(99))
        t4.forth(" ".join(toks))
        _reset(t4)                       # clear whatever piled up
    out = t4.forth("1 2 + . cr")
    assert "3 " in out, f"REPL damaged after fuzz: {out[-200:]}"


def test_fuzz_tensor_words_keep_repl_alive(t4):
    """tensor-word soup over live objects (creation words included so
    object operands flow through the vocabulary)"""
    vm = t4.vm
    names = [c.name for c in vm.dict.words
             if c.name not in _EXCLUDE and not c.name.startswith(".tb")]
    rs = np.random.RandomState(99)
    for i in range(60):
        toks = ["2", "2", "matrix", "ones"]
        for _ in range(rs.randint(1, 5)):
            if rs.rand() < 0.5:
                toks.append(str(rs.randint(1, 5)))
            else:
                toks.append(names[rs.randint(len(names))])
        t4.forth(" ".join(toks))
        _reset(t4)
    out = t4.forth("2 2 matrix{ 1 2 3 4 } dup @ sum . cr")
    assert "54 " in out or "54." in out, \
        f"tensor tier damaged after fuzz: {out[-300:]}"


def test_fuzz_colon_control_flow(t4):
    """random (but well-nested) colon definitions with if/else/then,
    for/next and begin/until bodies must compile and execute without
    wedging or damaging the interpreter (stresses the native nest's
    branch handling + the ip bounds guard)"""
    rs = np.random.RandomState(7)
    # scalar words that cannot touch the return stack or block
    safe = ["dup", "drop", "+", "-", "*", "swap", "over", "max", "min",
            "1+", "abs", "negate", "0=", "0<"]

    def body(depth):
        toks = []
        for _ in range(rs.randint(1, 4)):
            r = rs.rand()
            if r < 0.55 or depth >= 2:
                if rs.rand() < 0.5:
                    toks.append(str(rs.randint(-9, 10)))
                else:
                    toks.append(safe[rs.randint(len(safe))])
            elif r < 0.75:
                toks += [str(rs.randint(0, 2)), "if"] + body(depth + 1)
                if rs.rand() < 0.5:
                    toks += ["else"] + body(depth + 1)
                toks += ["then"]
            elif r < 0.9:
                toks += [str(rs.randint(0, 4)), "for"] + body(depth + 1) \
                        + ["next"]
            else:
                toks += ["begin"] + body(depth + 1) + ["-1", "until"]
        return toks

    for i in range(40):
        toks = body(0)
        t4.forth(f": fz{i} " + " ".join(toks) + " ;")
        t4.forth(f"fz{i}")
        _reset(t4)
    out = t4.forth("3 4 * . cr")
    assert "12 " in out, f"REPL damaged after colon fuzz: {out[-200:]}"


def test_fuzz_model_builder(t4):
    """random layer stacks through the words: valid ones must forward/
    backprop, invalid ones must print an error and leave the REPL
    alive — never crash (Model.add's _err contract)"""
    rs = np.random.RandomState(31)
    pieces = ["0.5 4 conv2d", "2 maxpool", "relu", "tanh", "flatten",
              "8 linear", "4 linear", "softmax", "0.1 batchnorm",
              "2 upsample", "2 nn.attn", "layernorm", "sigmoid",
              "3 3 2 nn.moe", "0.3 dropout", "16 8 nn.embed",
              "6 nn.proj"]
    for i in range(8):
        n_layers = rs.randint(1, 5)
        stack = " ".join(pieces[rs.randint(len(pieces))]
                         for _ in range(n_layers))
        t4.forth(f"0 trace\n2 6 6 1 nn.model {stack} constant fm{i}")
        # forward a matching input; shape/err paths must stay graceful
        t4.forth(f"72 vector randn 2 6 6 1 reshape4 constant fx{i}")
        t4.forth(f"fm{i} fx{i} forward drop drop")
        _reset(t4)
    out = t4.forth("1 2 + . cr")
    assert "3 " in out, f"REPL damaged after model fuzz: {out[-300:]}"


def test_fuzz_muldiv_underflow_bounded(t4):
    """ADVICE r2 (medium): repeated */ and */mod on an underflowed
    stack must not drive ss_idx unboundedly negative — the native
    W_MULDIV used to read ss[ss_idx-1]/ss[ss_idx-2] raw and decrement
    by 2 with no clamp (csrc/t4core.cpp), walking ~800KB below the
    numpy buffer after ': f 100000 for */ next ; f'."""
    t4.forth(": fzmd 100000 for */ next ;")
    t4.forth("fzmd")
    assert t4.vm.ss.idx >= 0, \
        f"ss_idx went negative: {t4.vm.ss.idx}"
    t4.forth(": fzmdm 50000 for */mod drop next ;")
    t4.forth("fzmdm")
    assert t4.vm.ss.idx >= 0
    _reset(t4)
    out = t4.forth("2 3 4 */ . cr")        # 2*3/4 = 1.5
    assert "1.5" in out, f"*/ broken after underflow fuzz: {out[-200:]}"


def test_fuzz_chunk_probe_injection_consistent(t4, monkeypatch):
    """adversarial rollback fuzz: an out-of-cycle observation word
    injected at a random position in the chunked training loop body
    must leave hits/weights identical to fusion-disabled execution
    (Model._chunk_abort rollback-replay, generalizing the single
    nn.w-probe case in test_chunk)"""
    from tests.test_chunk import _models, _snap, _pin, _run_epochs, _MODEL
    from tensorforth_tpu.nn import funcs

    monkeypatch.setenv("T4_MAX_BATCH", "5")
    rs = np.random.RandomState(2024)
    probes = ["1 nn.w sum {v}p ! drop ",  # weight introspection
              "1 nn.db drop ",              # bias-grad read
              "2 n@ sum {v}p ! drop ",      # activation fetch
              ""]                           # control: no probe
    slots = ["forward loss.ce {v}l ! ", "nn.hit {v}h +! ",
             "backprop ", "0.001 nn.adam "]

    for i in range(6):
        probe = probes[rs.randint(len(probes))]
        at = rs.randint(1, len(slots) + 1)   # never before forward
        body = "".join(slots[:at]) + probe + "".join(slots[at:])
        loop = ("variable {v}h 0 {v}h ! variable {v}l variable {v}p\n"
                ": {v}ep for " + body + "next ;")

        monkeypatch.setenv("T4_NO_FUSE", "1")
        t4.forth(_MODEL.format(name=f"fa{i}"))
        snap = _snap(_models()[-1])
        t4.forth(loop.format(v=f"fa{i}"))
        ha, la, wa = _run_epochs(t4, f"fa{i}", epochs=2)

        monkeypatch.setenv("T4_NO_FUSE", "0")
        monkeypatch.setenv("T4_CHUNK", "3")
        t4.forth(_MODEL.format(name=f"fb{i}"))
        _pin(_models()[-1], snap)
        t4.forth(loop.format(v=f"fb{i}"))
        hb, lb, wb = _run_epochs(t4, f"fb{i}", epochs=2)

        assert ha == hb, f"round {i} probe={probe!r}@{at}: hits {ha}!={hb}"
        assert abs(float(la) - float(lb)) < 2e-5, \
            f"round {i} probe={probe!r}@{at}: loss {la} vs {lb}"
        for j, (a, b) in enumerate(zip(wa, wb)):
            np.testing.assert_allclose(
                b, a, rtol=0, atol=1e-5,
                err_msg=f"round {i} probe={probe!r}@{at} param {j}")


def test_native_fault_containment(t4):
    """crash containment (VERDICT r3 #3, exceeds reference
    ten4.cu:258-272 which exits): a SIGSEGV raised inside the native
    engine's own C code longjmps back to the engine entry, the line is
    aborted, stacks are cleared and the REPL keeps working.  The probe
    (csrc t4_crash_test) runs through the SAME guard machinery as
    t4_nest/t4_outer."""
    import ctypes
    from tensorforth_tpu.runtime.native import get_core
    lib = get_core()
    if lib is None or not hasattr(lib, "t4_crash_test"):
        import pytest
        pytest.skip("native core unavailable")
    t4.forth("1 2 +")                    # warm the engine; leaves 3 on ss
    eng = t4.vm._engine
    assert eng is not None
    lib.t4_crash_test.restype = ctypes.c_int32
    for kind, name in ((0, "null deref"), (1, "wild pointer")):
        sig = lib.t4_crash_test(ctypes.byref(eng.st), kind)
        assert sig in (11, 7), f"{name}: expected SIGSEGV/SIGBUS, got {sig}"
        assert eng.st.py_flags & eng.PYF_FAULT
        assert eng._check_fault()        # python reset path: report+clear
        assert not (eng.st.py_flags & eng.PYF_FAULT)
    out = t4.forth("41 1 + . cr")        # REPL alive and correct after
    assert "42" in out
    out = t4.forth("3 4 matrix ones 2 * sum . cr")   # device path alive
    assert "24" in out


def test_hostile_input_survives(t4):
    """hostile-input fuzz over the outer interpreter: malformed UTF-8ish
    tokens, absurd bases, pmem-pressure colon defs, deep */ chains —
    the REPL must answer correctly afterwards"""
    hostile = [
        "\xff\xfe\x80\x81",                      # non-ascii garbage token
        "€∑˚∆ 1 2 + ≈",                          # unicode soup
        "228 0 ! 99 77",                         # absurd BASE user byte
        ": x" + "x" * 200 + " 1 ;",              # silly-long name
        "1 2 3 */ */ */ */ */ */ */ */",         # deep */ underflow chain
        "$ % & # $zz %22 #-- 1.e99 -1.e-99",     # number-parser edges
        "' nonexistent exec",                    # exec of a bad token
        "[to] ?",                                # immediates out of context
        "9999999999999999999999 .",              # overflow literal
    ]
    for line in hostile:
        t4.forth(line)                           # must not raise/crash
    t4.forth("abort 10 0 !")                     # restore stacks + BASE
    out = t4.forth("6 7 * . cr")
    assert "42" in out

    # pmem-boundary colon defs: compile until the compiler bounces
    for i in range(40):
        t4.forth(f": pp{i} " + "1 drop " * 200 + ";")
    t4.forth("abort 10 0 !")
    out = t4.forth("5 5 + . cr")
    assert "10" in out
