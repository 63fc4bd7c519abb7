"""Native runtime tests: TLSF allocator invariants + engine/Python
inner-interpreter equivalence.
"""
import ctypes
import os

import pytest

from tensorforth_tpu.runtime.native import get_alloc, get_core


needs_alloc = pytest.mark.skipif(get_alloc() is None,
                                 reason="t4alloc not built")
needs_core = pytest.mark.skipif(get_core() is None,
                                reason="t4core not built")


@needs_alloc
def test_tlsf_alloc_free_coalesce():
    lib = get_alloc()
    lib.t4_tlsf_init(1 << 20)
    offs = [lib.t4_tlsf_malloc(1000) for _ in range(100)]
    assert len(set(offs)) == 100                    # distinct blocks
    st = (ctypes.c_uint64 * 5)()
    lib.t4_tlsf_status(st)
    assert st[1] >= 100 * 1000
    for o in offs:
        assert lib.t4_tlsf_free(o) == 0
    lib.t4_tlsf_status(st)
    assert st[1] == 0                               # fully coalesced
    assert lib.t4_tlsf_check() == 0
    # whole arena available again
    big = lib.t4_tlsf_malloc((1 << 20) - 64)
    assert big != (1 << 64) - 1


@needs_alloc
def test_tlsf_exhaustion():
    lib = get_alloc()
    lib.t4_tlsf_init(1 << 12)
    assert lib.t4_tlsf_malloc(1 << 13) == (1 << 64) - 1


@needs_alloc
def test_tlsf_reuse_after_free():
    lib = get_alloc()
    lib.t4_tlsf_init(1 << 16)
    a = lib.t4_tlsf_malloc(4096)
    lib.t4_tlsf_free(a)
    b = lib.t4_tlsf_malloc(4096)
    assert b == a                                   # best-fit reuse


@needs_core
def test_engine_matches_python(t4, monkeypatch):
    """the same colon word must produce identical stacks under the
    native engine and the pure-Python nest"""
    prog = (": acid 0 100 for dup 3 + swap 2 * fmod "
            "dup 0> if 1 + else 1 - then next ;")
    t4.forth(prog)
    out_native = t4.forth("abort acid .s")
    t4.vm._engine = None                            # force python nest
    out_py = t4.forth("abort acid .s")
    assert out_native == out_py


@needs_core
def test_engine_object_words(t4):
    """tensor words trampoline through the callback correctly"""
    out = t4.forth(": mkm 2 2 matrix ones 2 *= ; mkm .")
    assert "+2.0000" in out


def test_mstat_tlsf(t4):
    out = t4.forth("2 2 matrix ones mstat")
    assert "Mpool obj#used" in out
    assert "Ostore" in out
