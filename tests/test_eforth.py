"""eForth core word-set tests (tier 1) — reference behavior from
src/vm/eforth.cpp; acceptance source: examples/t4_10a.4th.
"""


def test_arith(t4):
    assert "3 " in t4.forth("1 2 + .")
    assert "0.75" in t4.forth("3 4 / .")
    assert "1 " in t4.forth("7 2 mod .")
    assert "365 " in t4.forth("abort 1 1461 4 */ floor .")


def test_stack_ops(t4):
    out = t4.forth("1 2 3 .s")
    assert "-1 1 2 3 -> ok" in out
    out = t4.forth("abort 1 2 swap . .")
    assert "1 2 " in out
    out = t4.forth("abort 1 2 over . . .")
    assert "1 2 1 " in out
    out = t4.forth("abort 1 2 3 rot . . .")
    assert "1 3 2 " in out


def test_comparison_and_logic(t4):
    assert "-1 " in t4.forth("abort 3 4 < .")
    assert "0 " in t4.forth("abort 4 3 < .")
    assert "-1 " in t4.forth("abort 5 5 = .")
    assert "7 " in t4.forth("abort 3 5 or .")
    assert "1 " in t4.forth("abort 3 5 and .")


def test_colon_words_and_loops(t4):
    out = t4.forth(": sq dup * ;\n7 sq .")
    assert "49 " in out
    out = t4.forth(": stars 0 swap for 1 + next ;\n5 stars .")
    assert "6 " in out              # eForth for/next runs n+1 times
    out = t4.forth(": count5 0 5 0 do 1 + loop ;\ncount5 .")
    assert "5 " in out


def test_if_else(t4):
    t4.forth(': wx dup 55 < if ." cold" drop else 85 < '
             'if ." right" else ." hot" then then ;')
    assert "cold" in t4.forth("32 wx")
    assert "right" in t4.forth("70 wx")
    assert "hot" in t4.forth("90 wx")


def test_variable_constant_value(t4):
    out = t4.forth("variable x\n42 x !\nx @ .")
    assert "42 " in out
    out = t4.forth("13 constant K\nK .")
    assert "13 " in out
    out = t4.forth("1 value v\n9 to v\nv .")
    assert "9 " in out
    out = t4.forth(": bump v 1 + [to] v ;\nbump v .")
    assert "10 " in out


def test_plus_store(t4):
    out = t4.forth("variable h 0 h !\n3 h +!\n4 h +!\nh @ .")
    assert "7 " in out


def test_number_bases(t4):
    assert "255 " in t4.forth("$ff .")
    assert "5 " in t4.forth("%101 .")
    assert "54.9999" in t4.forth("54.9999 .")


def test_strings_and_io(t4):
    out = t4.forth('." hello world"')
    assert "hello world" in out
    out = t4.forth("42 emit")
    assert "*" in out
    out = t4.forth("3 spaces 65 emit")
    assert "   A" in out


def test_sprintf(t4):
    out = t4.forth('7 s" n=%d" sprintf type')
    assert "n=7" in out


def test_see_and_words(t4):
    t4.forth(": dbl 2 * ;")
    out = t4.forth("see dbl")
    assert ": dbl" in out and "lit" in out.lower() or "2" in out
    out = t4.forth("words")
    assert "dup" in out and "nn.model" in out


def test_reference_todo_words_registered(t4):
    """power/?do/roll/within sit in the reference's #if 0 TODO block
    (eforth.cpp:422-429 — NOT registered there); we implement them for
    real (r4), extending `words` like the u< u> precedent.  Behavior
    is pinned in tests/test_eforth2.py"""
    out = t4.forth("words")
    for w in ("power", "?do", "roll", "within"):
        assert w in out, f"{w} missing from words"


def test_rstack(t4):
    out = t4.forth("abort : t3 >r 1 r@ r> + + . ; 5 10 t3")
    assert "21 " in out


def test_forget(t4):
    t4.forth(": zzz 1 ;")
    assert t4.sys.mu.dict.find("zzz")
    t4.forth("forget zzz")
    assert not t4.sys.mu.dict.find("zzz")


def test_clock_ms(t4):
    out = t4.forth("clock 0 max 0 min .")
    assert "0 " in out               # clock is a number


def test_unknown_word_error(t4):
    out = t4.forth("notaword")
    assert "notaword? " in out
