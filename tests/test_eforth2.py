"""Additional eForth coverage: metacompiler, loop variants, hparams."""


def test_create_does(t4):
    out = t4.forth(": const3 create , does> @ 3 * ;\n"
                   "7 const3 x3\nx3 .")
    assert "21 " in out


def test_begin_until(t4):
    out = t4.forth("abort : cnt 0 begin 1 + dup 5 >= until ;\ncnt .")
    assert "5 " in out


def test_begin_while_repeat(t4):
    out = t4.forth("abort : w7 0 begin dup 7 < while 1 + repeat ;\nw7 .")
    assert "7 " in out


def test_for_aft_then_next(t4):
    # 3 for ." f" aft ." a" then next => f once, a three times
    out = t4.forth('abort : fa 3 for ." f" aft ." a" then next ;\nfa')
    assert "faaa" in out


def test_exec_and_tick(t4):
    out = t4.forth("abort : nine 9 ;\n' nine exec .")
    assert "9 " in out


def test_base_words(t4):
    out = t4.forth("hex ff decimal .")
    assert "255 " in out


def test_nested_colon_words(t4):
    out = t4.forth("abort : a 2 ; : b a a + ; : c b b * ;\nc .")
    assert "16 " in out


def test_deep_recursion_guard(t4):
    """for/next inside for/next (multiply-table shape)"""
    out = t4.forth("abort : inner 0 3 for 1 + next ;\n"
                   ": outer 0 3 for inner + next ;\nouter .")
    assert "16 " in out      # 4 iterations x 4


def test_hparams_writer(tmp_path):
    from tensorforth_tpu.tb.writer import EventWriter
    from tensorforth_tpu.tb.hparam import HParamWriter
    w = EventWriter(str(tmp_path), "hp")
    hp = HParamWriter(w)
    hp.experiment(["lr", "batch"], ["train/acc"])
    hp.session_start({"lr": 0.001, "batch": 100})
    hp.session_end()
    w.close()
    data = open(w.path, "rb").read()
    assert b"_hparams_/experiment" in data
    assert b"_hparams_/session_start_info" in data


def test_view_of_constant_mutation(t4):
    """constants holding tensors hand out views; mutation is shared"""
    t4.forth("2 2 matrix ones constant M")
    t4.forth("M 3 *= drop")
    out = t4.forth("M .")
    assert "+3.0000" in out


def test_cli_bench_flag():
    import subprocess, sys, os
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c",
         "from tensorforth_tpu.cli import main; main(['--bench','128','128','128'])"],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.join(os.path.dirname(__file__), ".."), env=env)
    assert r.returncode == 0
    assert "GFLOP/s" in r.stdout


def test_cli_list_devices():
    import subprocess, sys, os
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c",
         "from tensorforth_tpu.cli import main; main(['--list-devices'])"],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.join(os.path.dirname(__file__), ".."), env=env)
    assert r.returncode == 0 and "[0]" in r.stdout
