"""Golden-script acceptance tests — the reference's examples/*.4th are
the compatibility suite (SURVEY.md §4).  Training scripts run with
truncated epochs (T4_MAX_BATCH) on the CPU mesh; full runs happen on TPU
via bench.py / the driver.
"""
import os

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def run_script(t4, name: str, stop_at: str | None = None) -> str:
    """Scripts assert strings and loose values, not 1e-5 numerics —
    run them at the fast matmul class even in the strict-precision TPU
    suite: 3-pass-bf16 conv BACKWARD compiles are pathological through
    the tunneled backend (t4_40a's batch-256 conv wedges >30 min; a
    lone strict 3x3 conv already takes >9 min at 'highest').  Exact
    parity is covered by test_golden/test_oracle/test_nn."""
    import jax
    out = []
    with jax.default_matmul_precision("default"), \
            open(os.path.join(EXAMPLES, name)) as f:
        for line in f:
            line = line.rstrip("\n")
            if stop_at and stop_at in line:
                break
            out.append(t4.forth(line))
            from tensorforth_tpu.vm.vm import VMState
            if t4.vm.state == VMState.STOP:
                break
    return "".join(out)


def test_t4_10a(t4):
    out = run_script(t4, "t4_10a.4th", stop_at="### 5.")
    assert "***********" in out                      # rectangle
    assert "too cold!, about right." in out          # epsilon compares
    assert "  1   2   3   4   5   6   7   8   9  10  11  12" in out
    assert "     sun     mon     tue     wed     thu     fri     sat" in out
    # April 2026 starts on Wednesday
    assert "                               1       2       3       4" in out


def test_t4_20a(t4):
    out = run_script(t4, "t4_20a.4th")
    assert "+6.0000 +6.0000" in out and "+15.0000 +15.0000" in out
    assert "msec/cycle" in out
    assert "+9.0000 +9.0000" in out                  # @= result
    assert "+4.5000 +4.5000" in out                  # Hadamard
    assert "? " not in out.replace("-> ok", "")      # no unknown words


def test_t4_22a(t4):
    out = run_script(t4, "t4_22a.4th")
    assert "determinant = 6" in out
    assert "+7.999" in out or "+8.0000" in out       # solve X[0]=8
    assert out.count("+1.0000 +2.0000 +4.0000") >= 2  # PLU == A


def test_t4_30a(t4):
    out = run_script(t4, "t4_30a.4th")
    assert "+6.0000 +13.0000 +20.0000" in out


def test_t4_30b(t4):
    out = run_script(t4, "t4_30b.4th")
    assert "0.658292" in out
    assert "+0.1445 +0.1889" in out
    assert "+0.2393 +0.2151 +0.1909" in out


def test_t4_30c(t4):
    out = run_script(t4, "t4_30c.4th")
    assert "0.596742" in out
    assert "+0.5640 +0.6427" in out
    assert "+0.0680 +0.0287" in out


def test_t4_30d(t4):
    out = run_script(t4, "t4_30d.4th")
    assert "NN Model[12/128]" in out
    assert "rate=50%" in out
    assert "obj#used" in out


@pytest.mark.slow
def test_t4_30e_truncated(t4, monkeypatch):
    monkeypatch.setenv("T4_MAX_BATCH", "2")
    out = run_script(t4, "t4_30e.4th")
    assert "acc=" in out and "loss=" in out
    assert os.path.exists("/tmp/l30e_c.t4")


@pytest.mark.slow
def test_t4_32a(t4):
    out = run_script(t4, "t4_32a.4th")
    assert "G=" in out and "Dr=" in out and "Df=" in out


@pytest.mark.slow
def test_t4_40a_truncated(t4, tmp_path, monkeypatch):
    monkeypatch.setenv("T4_MAX_BATCH", "2")
    from tensorforth_tpu.tb.summary import Summary
    t4.sys.tb = Summary(str(tmp_path), "r40a")
    out = run_script(t4, "t4_40a.4th")
    assert "test/acc=" in out
    t4.sys.tb.close()
    assert any("tfevents" in f for f in os.listdir(tmp_path / "r40a"))


def test_t4_42a(t4, monkeypatch):
    monkeypatch.setenv("T4_MAX_BATCH", "1")
    out = run_script(t4, "t4_42a.4th")
    assert "NN Model[15/128]" in out
    assert "batchnm" in out and "mtum=0.01" in out


def test_t4_51_attn(t4):
    out = run_script(t4, "t4_51_attn.4th")
    assert "attn" in out
    assert "output sum (8 softmax rows) = 8" in out   # softmax rows sum 1
    assert "trained one step, dW zeroed: 0" in out


def test_t4_53_lm(t4):
    out = run_script(t4, "t4_53_lm.4th")
    assert "generated:" in out
    assert "vector[" in out


def test_t4_54_rope(t4, monkeypatch):
    out = run_script(t4, "t4_54_rope.4th")
    assert "greedy:" in out and "top-k2:" in out and "top-p.9:" in out


@pytest.mark.slow
def test_cli_subprocess_pipes_full_script():
    """the REAL launcher surface: `python ten4 < script` must execute
    every line to `bye`.  Regression for the r5 CLI bug: a top-level
    colon-word call left the VM in NEST, _run_pool skipped it, and
    main_loop silently drained the rest of stdin — piped scripts died
    at their first udf call (test_vmpool.py has the in-process unit;
    this one covers the launcher + native engine end-to-end)."""
    import subprocess
    import sys as _sys
    root = os.path.join(os.path.dirname(__file__), "..")
    script = ": sq dup * ;\n5 sq .\n6 sq .\nbye\n"
    r = subprocess.run([_sys.executable, os.path.join(root, "ten4")],
                       input=script, capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "25 " in r.stdout and "36 " in r.stdout
