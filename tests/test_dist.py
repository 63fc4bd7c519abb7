"""Multi-host groundwork (parallel/dist.py): single-process no-op paths
run for real on the 8-device CPU mesh; the cluster bring-up glue is
pinned against a fake jax.distributed (a second process isn't available
in the test box)."""
import numpy as np
import pytest


def test_init_distributed_noop_without_env(monkeypatch, t4):
    from tensorforth_tpu.parallel import dist
    monkeypatch.delenv("T4_COORD", raising=False)
    rank, nproc = dist.init_distributed()
    assert (rank, nproc) == (0, 1)


def test_init_distributed_calls_initialize(monkeypatch, t4):
    from tensorforth_tpu.parallel import dist
    calls = {}

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None):
        calls.update(addr=coordinator_address, n=num_processes,
                     pid=process_id)

    import jax
    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setattr(dist, "_initialized", False)
    monkeypatch.setenv("T4_COORD", "10.0.0.1:8476")
    monkeypatch.setenv("T4_NPROC", "4")
    monkeypatch.setenv("T4_RANK", "2")
    dist.init_distributed()
    assert calls == {"addr": "10.0.0.1:8476", "n": 4, "pid": 2}
    # idempotent: a second call must not re-initialize
    calls.clear()
    dist.init_distributed()
    assert calls == {}
    monkeypatch.setattr(dist, "_initialized", False)


def _need8():
    import jax
    return pytest.mark.skipif(
        len(jax.devices()) < 8,
        reason="needs the 8-device virtual mesh (single real TPU chip)")
@_need8()
def test_global_mesh_single_process_delegates(t4):
    from tensorforth_tpu.parallel.dist import make_global_mesh
    m = make_global_mesh(dp=4, tp=2)
    assert m.axis_names == ("dp", "tp")
    assert m.devices.shape == (4, 2)


@_need8()
def test_global_mesh_multi_host_layout(monkeypatch, t4):
    """fake a 4-process x 2-local-device cluster: dp must be host-major
    (DCN outermost), tp within a host"""
    import jax
    from tensorforth_tpu.parallel import dist

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "local_device_count", lambda: 2)

    seen = {}

    def fake_hybrid(mesh_shape, dcn_mesh_shape, devices=None):
        seen.update(ici=tuple(mesh_shape), dcn=tuple(dcn_mesh_shape))
        return np.array(devices[:8]).reshape(4, 2)

    import jax.experimental.mesh_utils as mu
    monkeypatch.setattr(mu, "create_hybrid_device_mesh", fake_hybrid)
    m = dist.make_global_mesh(dp=4, tp=2)
    assert seen == {"ici": (1, 2), "dcn": (4, 1)}
    assert m.axis_names == ("dp", "tp")

    # a model axis wider than one host's devices must be refused
    with pytest.raises(ValueError, match="DCN"):
        dist.make_global_mesh(dp=2, tp=4)


def test_local_batch_slice(t4):
    from tensorforth_tpu.parallel.dist import local_batch_slice
    assert local_batch_slice(64) == slice(0, 64)


def test_two_process_train_matches_single(tmp_path):
    """REAL 2-process cluster on the CPU backend (VERDICT r2 #7): two
    workers form a dp2(x)tp4 global mesh via T4_COORD/T4_NPROC/T4_RANK
    and jax.distributed.initialize; nn.train's engine runs the same
    epochs as a single-process 8-device run; losses and final weights
    must agree across ranks AND with the single-process run."""
    import json
    import os
    import socket
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "dist_worker.py")

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    def env_for(rank, nproc, local_devs):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.pop("T4_MAX_BATCH", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                            f"{local_devs}")
        env["PYTHONPATH"] = repo + ":" + env.get("PYTHONPATH", "")
        env["T4_MESH"] = "dp2,tp4"
        if nproc > 1:
            env["T4_COORD"] = f"localhost:{port}"
            env["T4_NPROC"] = str(nproc)
            env["T4_RANK"] = str(rank)
        else:
            env.pop("T4_COORD", None)
        return env

    outs = [str(tmp_path / f"r{i}.json") for i in range(2)]
    procs = [subprocess.Popen([sys.executable, worker, outs[i]],
                              env=env_for(i, 2, 4),
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for i in range(2)]
    logs = [p.communicate(timeout=420)[0].decode(errors="replace")
            for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"rank {i} failed:\n{logs[i][-2500:]}"

    r0 = json.load(open(outs[0]))
    r1 = json.load(open(outs[1]))
    assert (r0["nproc"], r1["nproc"]) == (2, 2)
    assert r0["loss"] == r1["loss"], "ranks disagree on loss"
    assert r0["wsum"] == r1["wsum"], "ranks disagree on weights"

    # single-process 8-device reference
    ref_out = str(tmp_path / "ref.json")
    p = subprocess.Popen([sys.executable, worker, ref_out],
                         env=env_for(0, 1, 8),
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    log = p.communicate(timeout=420)[0].decode(errors="replace")
    assert p.returncode == 0, f"reference run failed:\n{log[-2500:]}"
    ref = json.load(open(ref_out))

    np.testing.assert_allclose(r0["loss"], ref["loss"], rtol=1e-5)
    np.testing.assert_allclose(r0["wsum"], ref["wsum"], rtol=1e-5)
