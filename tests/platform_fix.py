"""Early pytest plugin (-p tests.platform_fix): re-exec with a CPU-mesh
JAX environment BEFORE pytest's capture starts.

The container's sitecustomize registers the axon TPU backend at
interpreter start; env vars must be scrubbed before Python launches.
Importing this module as an initial plugin happens pre-capture, so the
exec'd child inherits the real stdio.  Set T4_TEST_TPU=1 to run the
suite against the real TPU chip instead.
"""
import os
import sys

if os.environ.get("T4_TEST_TPU", "0") == "1":
    # reference-parity precision on real TPU hardware: the suite pins
    # 1e-5-class equalities that the default bf16-multiplicand matmul
    # class cannot hold (tensorforth_tpu/__init__.py applies this)
    os.environ.setdefault("T4_PRECISION", "strict")

if (os.environ.get("PALLAS_AXON_POOL_IPS")
        and os.environ.get("T4_TEST_TPU", "0") != "1"
        and not os.environ.get("_T4_REEXEC")):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=8").strip()
    env["_T4_REEXEC"] = "1"
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
