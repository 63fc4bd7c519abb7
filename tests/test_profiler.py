"""prof.start / prof.stop: XLA profiler trace words (extension — the
reference's `trace` word prints per-layer stats; these capture the
compiled-program timeline for TensorBoard's profile plugin)."""
import os


def test_prof_words_capture_trace(t4, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    t4.forth("prof.start")
    t4.forth("3 3 matrix rand dup @ drop drop")
    out = t4.forth("prof.stop")
    assert "profile ->" in out
    root = os.path.join(tmp_path, "t4_profile", "plugins", "profile")
    assert os.path.isdir(root) and os.listdir(root), \
        "no profiler output written"


def test_prof_stop_without_start_keeps_repl_alive(t4):
    out = t4.forth("prof.stop")
    assert "prof.stop failed" in out
    assert t4.forth("1 2 + . cr").strip().startswith("3")
