"""ten4 CLI — option parsing, VM pool, REPL loop.

Reference: src/ten4.{h,cu} + src/opt.h.
"""
from __future__ import annotations

import argparse
import os
import sys as _sys

from .config import Config
from .system import System
from .debug import Debug
from .mu.mmu import MMU
from .vm.vm import vm_factory, VMState


def _enable_compile_cache():
    """persistent XLA compilation cache — interactive words compile once
    per (op, shape) signature across sessions (SURVEY.md §7 hard-part #1)"""
    try:
        import jax
        if jax.default_backend() == "cpu":
            return        # XLA:CPU AOT cache entries are machine-flag
            #               sensitive and reload unreliably — TPU only
        cache = os.environ.get("T4_JAX_CACHE",
                               os.path.expanduser("~/.cache/t4_jax"))
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        pass


class TensorForth:
    def __init__(self, fin=None, fout=None, verbose: int = 0,
                 tb_logdir: str = None, tb_run_id: str = None):
        _enable_compile_cache()
        if os.environ.get("T4_COORD"):       # multi-host cluster bring-up
            from .parallel.dist import init_distributed
            rank, nproc = init_distributed()
            if verbose:
                print(f"\\ distributed: process {rank}/{nproc}, "
                      f"{__import__('jax').device_count()} global devices")
        self.sys = System.get_sys(fin, fout, verbose)
        self.sys.mu = MMU.get_mmu()
        self.sys.db = Debug.get_db(self.sys)
        if tb_logdir and Config.DO_TB:
            from .tb.summary import Summary
            self.sys.tb = Summary(tb_logdir, tb_run_id)
        level = "net" if (Config.DO_OBJ and Config.DO_NN) else (
            "tensor" if Config.DO_OBJ else "forth")
        # VM handle pool (reference ten4.cu:157-196): T4_VM_COUNT VMs
        # sharing the dictionary/pmem/MMU, each with its own stacks.
        # The per-VM CUDA stream analog is XLA's async dispatch queue
        # plus a host thread per started task (vm/multitask.py) — pool
        # VMs 1..N-1 start STOP and are claimed by the `task` word.
        self.pool = [vm_factory(level, i, self.sys)
                     for i in range(max(1, Config.VM_COUNT))]
        self.vm = self.pool[0]
        for vm in self.pool:
            vm.init()                        # dict built once (id 0)
        self.vm.state = VMState.QUERY
        from .vm.multitask import TaskPool
        TaskPool.get().attach_pool(self.pool)   # replaces any stale pool
        # reference Debug::self_tests (ten4.cu:225): silent integrity
        # pass at every boot, summary at -v1, full dumps at -v2
        self.sys.db.self_tests(verbose)

    def _run_pool(self):
        """one dispatcher sweep (reference ten4.cu:188-196 run()): VM 0
        consumes the input line; HOLD VMs resume; NEST VMs are busy on
        their own thread ("stream") and are skipped; returns per-VM ms"""
        import time as _t
        dts = []
        for vm in self.pool:
            t0 = _t.perf_counter()
            if (vm.state == VMState.HOLD
                    and not getattr(vm, "task_claimed", False)):
                vm.resume()
            elif vm.state == VMState.QUERY:
                vm.outer()
            dts.append((_t.perf_counter() - t0) * 1e3)
        return dts

    def _tally(self):
        """VM state census (reference _ten4_tally, ten4.cu:64-76)"""
        cnt = [0, 0, 0, 0]
        for vm in self.pool:
            cnt[vm.state] += 1
        return cnt

    def more_job(self) -> bool:
        """true while any VM is not STOP (reference ten4.cu:181-184)"""
        return self._tally()[VMState.STOP] < len(self.pool)

    def run_line(self, line: str):
        self.sys.load_line(line)
        if len(self.pool) == 1:
            self.vm.outer()
        else:
            self._run_pool()
        self.sys.flush()
        self.sys.mu.sweep()

    def main_loop(self):
        """REPL: readline -> pool sweep -> flush -> sweep (+ per-line
        profile at trace, reference ten4.cu:199-220 per-VM event timing)"""
        while self.more_job():
            if not self.sys.readline():
                break
            dts = self._run_pool()
            if self.sys.trace:
                if len(self.pool) > 1:       # reference profile() VM.dt
                    cnt = self._tally()
                    self.sys.pstr(
                        "\\ VM.state[STOP,HOLD,QUERY,NEST]=[ "
                        + " ".join(str(c) for c in cnt) + " ] dt=[ "
                        + " ".join(f"{d:.2f}" for d in dts) + " ]\n")
                else:
                    self.sys.pstr(
                        f"\\ VM[{self.vm.id}] {dts[0]:.2f} ms\n")
            self.sys.flush()
            self.sys.mu.sweep()

    def teardown(self):
        if self.sys.tb:
            self.sys.tb.close()
        System.free_sys()
        MMU.free_mmu()
        Debug.free_db()
        from .io.aio import AIO
        AIO.free_io()


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="ten4", description="tensorForth on TPU (JAX/XLA/Pallas)")
    ap.add_argument("-v", "--verbose", type=int, default=0,
                    help="verbosity 0:off 1:trace 2:detailed")
    ap.add_argument("-d", "--device", type=int, default=0,
                    help="device ordinal")
    ap.add_argument("-t", "--tb-logdir", default=None,
                    help="TensorBoard log directory")
    ap.add_argument("-r", "--run-id", default=None,
                    help="TensorBoard run id")
    ap.add_argument("-h2", "--list-devices", action="store_true",
                    help="list devices and properties")
    ap.add_argument("--bench", nargs=3, type=int, metavar=("M", "K", "N"),
                    help="run an MxKxN GEMM benchmark and exit "
                         "(reference opt.h GEMM bench dims)")
    ap.add_argument("--vu", metavar="CORPUS", default=None,
                    help="interactive corpus viewer: an X11 window when "
                         "a display is reachable (io/gui.py, reference "
                         "src/vu/gui.cpp), else the ANSI terminal loop "
                         "(e.g. --vu mnist_train; reference src/vu/)")
    args = ap.parse_args(argv)

    if args.vu:
        from .io.gui import vu_window
        if vu_window(args.vu) < 0:           # no X display: terminal loop
            from .io.vu import vu_loop
            vu_loop(args.vu)
        return 0

    if args.list_devices:
        import jax
        for d in jax.devices():
            print(f"  [{d.id}] {d.device_kind} platform={d.platform}")
        return 0

    if args.bench:
        import time
        import jax
        import jax.numpy as jnp
        m, k, n = args.bench
        a = jax.random.uniform(jax.random.PRNGKey(1), (m, k), jnp.float32)
        b = jax.random.uniform(jax.random.PRNGKey(2), (k, n), jnp.float32)
        c = jnp.dot(a, b, preferred_element_type=jnp.float32)
        float(c[0, 0])
        reps = max(1, (1 << 30) // max(1, 2 * m * k * n))
        t0 = time.perf_counter()
        for _ in range(reps):
            c = jnp.dot(a, b, preferred_element_type=jnp.float32)
        float(c[0, 0])
        dt = (time.perf_counter() - t0) / reps
        print(f"GEMM [{m},{k}]@[{k},{n}]: {dt * 1e3:.3f} ms "
              f"({2.0 * m * k * n / dt / 1e9:.1f} GFLOP/s)")
        return 0

    t4 = TensorForth(verbose=args.verbose,
                     tb_logdir=args.tb_logdir, tb_run_id=args.run_id)
    profile_dir = os.environ.get("T4_PROFILE")
    if profile_dir:                          # device-level tracing hook
        import jax
        jax.profiler.start_trace(profile_dir)
    try:
        t4.main_loop()
    finally:
        if profile_dir:
            import jax
            jax.profiler.stop_trace()
        t4.teardown()
    return 0


if __name__ == "__main__":
    _sys.exit(main())
