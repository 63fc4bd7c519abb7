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


def test_render_ansi_halfblocks(t4):
    import numpy as np
    from tensorforth_tpu.io.vu import render_ansi
    img = np.zeros((4, 3, 1), np.uint8)
    img[0, 0, 0] = 255
    lines = render_ansi(img)
    assert len(lines) == 2                       # 2 pixels per text row
    assert "\x1b[38;2;255;255;255m" in lines[0]  # top pixel as fg
    assert lines[0].count("▀") == 3
    assert lines[0].endswith("\x1b[0m")
    # odd height pads a black bottom row
    assert len(render_ansi(np.zeros((5, 3, 1), np.uint8))) == 3


def test_vu_interactive_loop(t4):
    """drive the interactive viewer with a scripted key sequence:
    page fwd, step fwd, step back, rewind, quit"""
    import io
    from tensorforth_tpu.io.vu import vu_loop
    keys = io.StringIO("njkrq")
    out = io.StringIO()
    pages = vu_loop("mnist_test", fin=keys, fout=out, per_row=4)
    assert pages == 5
    text = out.getvalue()
    assert "mnist_test [0..3" in text            # first page
    assert "[4..7" in text                       # after 'n'
    assert "[5..8" in text                       # after 'j'
    assert "\x1b[48;2;" in text                  # truecolor cells
    assert "y=" in text                          # label captions


def test_vu_cli_flag(t4, monkeypatch, capsys):
    import io
    import sys as _sys
    from tensorforth_tpu import cli
    monkeypatch.setattr(_sys, "stdin", io.StringIO("q"))
    assert cli.main(["--vu", "mnist_test"]) == 0
    assert "mnist_test [0.." in capsys.readouterr().out
