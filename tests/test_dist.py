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


def test_global_mesh_single_process_delegates(t4):
    from tensorforth_tpu.parallel.dist import make_global_mesh
    m = make_global_mesh(dp=4, tp=2)
    assert m.axis_names == ("dp", "tp")
    assert m.devices.shape == (4, 2)


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
