"""VM handle pool (reference ten4.cu:157-196: T4_VM_COUNT VMs sharing
the dictionary, each on its own stream; per-VM state tally + timers).
The TPU build realizes the pool with host-thread "streams" claimed by
the `task` word; VM 0 owns the REPL input."""
import io
import os

import pytest


@pytest.fixture()
def t4pool(monkeypatch):
    """fresh interpreter with a 4-VM pool.  Config.VM_COUNT is patched
    as an attribute (NOT via T4_VM_COUNT: the env var is only read at
    config.py import, and setting it before the first-ever import would
    make 4 the restore value, leaking into later tests)"""
    from tensorforth_tpu.config import Config
    monkeypatch.setattr(Config, "VM_COUNT", 4)
    from tensorforth_tpu.cli import TensorForth
    from tensorforth_tpu.system import System
    from tensorforth_tpu.mu.mmu import MMU
    from tensorforth_tpu.debug import Debug
    from tensorforth_tpu.io.aio import AIO
    os.environ.setdefault("T4_SEED", "42")
    System.free_sys()
    MMU.free_mmu()
    Debug.free_db()
    AIO.free_io()
    buf = io.StringIO()
    inst = TensorForth(fin=io.StringIO(""), fout=buf)
    inst.capture = buf

    def run(script: str) -> str:
        start = buf.tell()
        for line in script.split("\n"):
            inst.run_line(line)
        return buf.getvalue()[start:]

    inst.forth = run
    yield inst
    inst.teardown()


def test_pool_created_with_vm_count(t4pool):
    from tensorforth_tpu.vm.vm import VMState
    assert len(t4pool.pool) == 4
    assert t4pool.vm is t4pool.pool[0]
    assert t4pool.pool[0].state == VMState.QUERY
    # VMs 1..3 start STOP (reference _vm_init: only pool[0] QUERY)
    assert all(vm.state == VMState.STOP for vm in t4pool.pool[1:])
    # ids are the pool ordinals; the dictionary is shared
    assert [vm.id for vm in t4pool.pool] == [0, 1, 2, 3]
    d0 = t4pool.pool[0].dict
    assert all(vm.dict is d0 for vm in t4pool.pool[1:])


def test_tally_and_more_job(t4pool):
    from tensorforth_tpu.vm.vm import VMState
    cnt = t4pool._tally()
    assert cnt[VMState.STOP] == 3 and cnt[VMState.QUERY] == 1
    assert t4pool.more_job()
    t4pool.forth("bye")
    assert not t4pool.more_job()


def test_task_claims_pool_vm(t4pool):
    """`task` must claim a STOP pool VM (not allocate a detached one)
    and release it back to the pool at completion"""
    from tensorforth_tpu.vm.multitask import TaskPool
    from tensorforth_tpu.vm.vm import VMState
    pool = TaskPool.get()
    assert pool.vm_pool is t4pool.pool
    t4pool.forth(": worker 6 7 * ;")
    t4pool.forth("' worker task constant T1")
    claimed = [vm for vm in t4pool.pool[1:] if vm.state != VMState.STOP]
    assert len(claimed) == 1                 # claimed pool VM, HOLD
    assert claimed[0].task_claimed
    out = t4pool.forth("T1 start T1 join 1 T1 pull .")
    assert "42 " in out
    assert claimed[0].state == VMState.STOP  # recycled


def test_pool_exhaustion_falls_back_to_detached(t4pool):
    """claiming more tasks than pool VMs must still work (detached)"""
    from tensorforth_tpu.vm.multitask import TaskPool
    t4pool.forth(": w8 1 2 + drop ;")
    for i in range(5):
        t4pool.forth(f"' w8 task constant X{i}")
    tp = TaskPool.get()
    vms = [t.vm for t in tp.tasks.values()]
    in_pool = sum(1 for v in vms if v in t4pool.pool)
    assert in_pool == 3                      # VMs 1..3 claimed
    assert len(vms) >= 5                     # rest detached
    out = t4pool.forth("X0 start X1 start X2 start X3 start X4 start "
                       "X0 join X1 join X2 join X3 join X4 join 1 1 + .")
    assert "2 " in out


def test_pool_trace_line(t4pool):
    """main_loop trace prints the reference profile() census + per-VM
    dt (ten4.cu:199-220) when the pool is >1"""
    import io as _io
    t4pool.sys.fin = _io.StringIO("1 2 + .\nbye\n")
    t4pool.forth("1 trace")
    t4pool.main_loop()
    text = t4pool.capture.getvalue()
    assert "VM.state[STOP,HOLD,QUERY,NEST]=[ 3 0 1 0 ]" in text
    assert "dt=[ " in text


def test_single_vm_pool_unchanged(t4):
    """default T4_VM_COUNT=1 keeps the classic trace format"""
    import io as _io
    t4.sys.fin = _io.StringIO("1 2 + .\nbye\n")
    t4.forth("1 trace")
    t4.main_loop()
    assert "VM[0]" in t4.capture.getvalue()

def test_main_loop_continues_after_udf_word(t4):
    """regression: an interactively-executed colon word used to leave
    the VM in NEST, and main_loop's dispatcher (which, unlike the
    reference ten4.cu:78-86 _vm_exec0, reserves NEST for thread-busy
    task VMs) then skipped the VM while readline() silently drained
    the rest of stdin — scripts piped to `python ten4` died at their
    first udf call (t4_53_lm.4th stopped at `100 train`).  A completed
    top-level call must hand the VM back to QUERY."""
    import io as _io
    from tensorforth_tpu.vm.vm import VMState
    t4.sys.fin = _io.StringIO(": sq dup * ;\n3 sq .\n4 sq .\nbye\n")
    t4.main_loop()
    out = t4.capture.getvalue()
    assert "9 " in out and "16 " in out
    assert t4.vm.state == VMState.STOP       # bye reached


def test_main_loop_udf_word_multi_vm_pool(t4pool):
    """same regression through the pool dispatcher (_run_pool), which
    is the path the real CLI always takes"""
    import io as _io
    t4pool.sys.fin = _io.StringIO(": cube dup dup * * ;\n3 cube .\nbye\n")
    t4pool.main_loop()
    assert "27 " in t4pool.capture.getvalue()
