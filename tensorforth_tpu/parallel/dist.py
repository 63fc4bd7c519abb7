"""Multi-host scale-out.

Exercised by a REAL 2-process cluster in tests/test_dist.py (localhost
coordinator, Gloo collectives on the CPU backend, dp2 x tp4 global
mesh): `nn.train` over `make_global_mesh` produces rank-identical
losses/weights equal to the single-process 8-device run.

The reference is strictly single-process (SURVEY.md §2.7); its dormant
multi-VM scaffold maps here to multi-controller JAX: every host runs the
same interpreter, `jax.distributed.initialize` forms the cluster, and
the SPMD meshes in mesh.py span the GLOBAL device set with axis order
chosen so data parallelism crosses DCN (slice-to-slice network) while
tensor/sequence/expert parallelism stays on ICI.

Environment contract (mirrors the T4_MESH convention):

    T4_COORD = host:port        coordinator address (rank 0's)
    T4_NPROC = N                number of processes in the cluster
    T4_RANK  = i                this process's id (0..N-1)

With none of these set (or T4_NPROC=1) everything is a no-op and the
single-host paths are used unchanged — so the same script scales from
one chip to a pod without edits.  On Cloud TPU pods where JAX can
auto-detect the topology, set only T4_COORD=auto.
"""
from __future__ import annotations

import os

import jax
from jax.sharding import Mesh

_initialized = False


def init_distributed() -> tuple[int, int]:
    """idempotent cluster bring-up from the T4_* env; returns
    (process_index, process_count).  Single-process without the env."""
    global _initialized
    coord = os.environ.get("T4_COORD")
    if not coord or _initialized:
        return jax.process_index(), jax.process_count()
    if coord == "auto":                    # Cloud TPU pod metadata path
        jax.distributed.initialize()
    else:
        nproc = int(os.environ.get("T4_NPROC", "1"))
        rank = int(os.environ.get("T4_RANK", "0"))
        if nproc > 1:
            jax.distributed.initialize(coordinator_address=coord,
                                       num_processes=nproc,
                                       process_id=rank)
    _initialized = True
    return jax.process_index(), jax.process_count()


def make_global_mesh(dp: int | None = None, tp: int | None = None,
                     ep: int | None = None) -> Mesh:
    """(dp, tp|ep) mesh over the GLOBAL device set.  Multi-host: the dp
    axis is laid out host-major via create_hybrid_device_mesh so the
    gradient all-reduce segments that cross DCN carry only the dp
    collective, and tp/ep collectives ride ICI within a host/slice."""
    n_proc = jax.process_count()
    if n_proc == 1:
        from .mesh import make_mesh
        return make_mesh(dp=dp, tp=tp, ep=ep)

    from jax.experimental import mesh_utils
    local = jax.local_device_count()
    n = local * n_proc
    ax2 = "ep" if ep is not None else "tp"
    m2 = ep if ep is not None else tp
    if m2 is None:
        m2 = 1 if dp is None else n // dp
    if dp is None:
        dp = n // m2
    assert dp * m2 == n, f"mesh {dp}x{m2} != {n} global devices"
    if m2 > local:
        raise ValueError(
            f"model axis {ax2}={m2} larger than a host's {local} devices "
            f"would put its collectives on DCN — refuse (use dp across "
            f"hosts, {ax2} within)")
    assert dp % n_proc == 0, \
        f"dp={dp} must be a multiple of process_count={n_proc}"
    try:
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(dp // n_proc, m2),
            dcn_mesh_shape=(n_proc, 1),
            devices=jax.devices())
    except ValueError:
        # devices without slice metadata (CPU backend, some TPU
        # topologies): lay out process-major by hand — dp outermost
        # crossing processes, the model axis within a process.  Found
        # by the real 2-process test: create_hybrid_device_mesh counts
        # slices from device attrs and sees 1 on CPU.
        import numpy as np
        devs = sorted(jax.devices(),
                      key=lambda d: (d.process_index, d.id))
        devices = np.array(devs).reshape(dp, m2)
    return Mesh(devices, ("dp", ax2))


def local_batch_slice(global_batch: int) -> slice:
    """the rows of a [global_batch, ...] host-sharded input this process
    should feed (jax.make_array_from_process_local_data consumers)"""
    n_proc = jax.process_count()
    assert global_batch % n_proc == 0
    per = global_batch // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
