"""Multitask word tests (reference DO_MULTITASK scaffold, realized)."""


def test_rank(t4):
    assert "0 " in t4.forth("rank .")


def test_task_start_join_pull(t4):
    t4.forth(": worker 6 7 * ;")
    out = t4.forth("' worker task constant T1\n"
                   "T1 start\nT1 join\n1 T1 pull .")
    assert "42 " in out


def test_send_recv(t4):
    t4.forth(": echo recv 2 * ;")
    out = t4.forth("' echo task constant T2\n"
                   "21 1 T2 send\nT2 start\nT2 join\n1 T2 pull .")
    assert "42 " in out


def test_lock_unlock(t4):
    out = t4.forth("lock 1 2 + . unlock")
    assert "3 " in out


def test_viewer(t4, tmp_path):
    from tensorforth_tpu.io.vu import view_corpus
    p = view_corpus("mnist_test", str(tmp_path / "v.png"), n=16)
    data = open(p, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
