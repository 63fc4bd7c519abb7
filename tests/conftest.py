"""Test harness config.

Tests run on a virtual 8-device CPU mesh (JAX_PLATFORMS=cpu +
xla_force_host_platform_device_count=8).  The container's sitecustomize
registers the axon TPU backend at interpreter start, before conftest can
set env vars — so if we detect the axon env, we re-exec pytest with a
scrubbed environment.  Set T4_TEST_TPU=1 to run tests against the real
TPU chip instead (slow: tunneled device).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tests.platform_fix  # noqa: F401,E402  (re-exec fallback; normally
#                            triggered earlier via pytest.ini -p plugin)

import pytest  # noqa: E402


@pytest.fixture()
def t4():
    """fresh TensorForth instance writing to a capture buffer"""
    import io
    from tensorforth_tpu.cli import TensorForth
    from tensorforth_tpu.system import System
    from tensorforth_tpu.mu.mmu import MMU
    from tensorforth_tpu.debug import Debug
    from tensorforth_tpu.io.aio import AIO

    os.environ.setdefault("T4_SEED", "42")   # deterministic RNG for goldens
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
