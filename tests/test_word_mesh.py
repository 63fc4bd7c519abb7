"""SPMD interactive word path (VERDICT r4 #1): with T4_MESH set, the
canonical ``for forward … backprop nn.adam next`` word loop — the
product's flagship surface — runs its fused-cycle / chunk executables
sharded over the mesh (batch over 'dp', features over 'tp'), exactly
like the nn.train SPMD tier.  Observable semantics must match
single-device execution: same hit counts, same losses, same weights
(up to reduction-order float noise), including the chunk-rollback path.

The reference's analog is the dormant multi-VM scaffold
(src/vm/vm.h:62-79, SURVEY §2.7) — realized here as sharding, not VM
scheduling."""
import numpy as np
import pytest


_MODEL = """0 trace
8 28 28 1 nn.model
flatten 16 linear relu 10 linear softmax
constant {name}
{name} batchsize dataset mnist_train constant {name}d
"""

_LOOP = ("variable {v}h 0 {v}h ! variable {v}l\n"
         ": {v}ep for forward loss.ce {v}l ! nn.hit {v}h +! "
         "backprop {lr} nn.adam next ;")


def _models():
    from tensorforth_tpu.mu.mmu import MMU
    return [o for o in MMU.get_mmu()._objs.values()
            if getattr(o, "is_model", lambda: False)()]


def _snap(m):
    return [tuple(np.array(w, np.float32) for w in pl)
            for pl in m._params()]


def _pin(m, snap):
    for j in range(m.numel - 1):
        for k, w in enumerate(snap[j]):
            g = m[j].grad[k]
            g.replace_data(np.asarray(w, np.float32).reshape(g.shape))


def _run_epochs(t4, name, epochs=2):
    for _ in range(epochs):
        t4.forth(f"{name}d rewind drop {name} {name}d {name}ep drop")
    hit = t4.forth(f"{name}h @ . cr").strip().split()[0]
    lox = t4.forth(f"{name}l @ . cr").strip().split()[0]
    ws = [np.array(w) for pl in _models()[-1]._params() for w in pl]
    return hit, lox, ws


def _compare(ref, got, what):
    ha, la, wa = ref
    hb, lb, wb = got
    assert ha == hb, f"{what}: hit counts differ: {ha} vs {hb}"
    assert abs(float(la) - float(lb)) < 5e-5, \
        f"{what}: losses differ: {la} vs {lb}"
    for i, (a, b) in enumerate(zip(wa, wb)):
        np.testing.assert_allclose(
            b, a, rtol=0, atol=2e-4,
            err_msg=f"{what}: param {i} sharded != single-device")


@pytest.mark.parametrize("mesh_spec", ["dp4", "dp2,tp2"])
def test_word_loop_mesh_matches_single_device(t4, monkeypatch, mesh_spec):
    """7-batch window, T4_CHUNK=3 (chunks of 3+3 + single-batch tail):
    the full fused+chunked word path under T4_MESH must reproduce the
    unsharded run batch-for-batch over 2 epochs"""
    monkeypatch.setenv("T4_MAX_BATCH", "7")
    monkeypatch.setenv("T4_CHUNK", "3")

    monkeypatch.delenv("T4_MESH", raising=False)
    t4.forth(_MODEL.format(name="wa"))
    snap = _snap(_models()[-1])
    t4.forth(_LOOP.format(v="wa", lr="0.001"))
    ref = _run_epochs(t4, "wa")

    monkeypatch.setenv("T4_MESH", mesh_spec)
    t4.forth(_MODEL.format(name="wb"))
    mb = _models()[-1]
    _pin(mb, snap)
    t4.forth(_LOOP.format(v="wb", lr="0.001"))
    got = _run_epochs(t4, "wb")

    from tensorforth_tpu.nn import funcs
    mesh = funcs.word_mesh()
    assert mesh is not None, "T4_MESH did not build a mesh"
    # the trained weights must actually LIVE on the mesh (the fused
    # optimizer constrains post-step params to their shard layout)
    w = mb[1].grad[0].ensure_data()
    assert getattr(w.sharding, "mesh", None) == mesh, \
        f"trained weight not mesh-committed: {w.sharding}"
    _compare(ref, got, mesh_spec)


def test_word_loop_mesh_chunk_rollback(t4, monkeypatch):
    """mid-loop introspection (nn.w) forces chunk rollback-replay every
    cycle; the sharded replay must still land on the single-device
    numbers"""
    monkeypatch.setenv("T4_MAX_BATCH", "5")
    monkeypatch.setenv("T4_CHUNK", "4")
    probe_loop = ("variable {v}h 0 {v}h ! variable {v}l\n"
                  ": {v}ep for forward loss.ce {v}l ! nn.hit {v}h +! "
                  "backprop 0.001 nn.adam 0 nn.w drop next ;")

    monkeypatch.delenv("T4_MESH", raising=False)
    t4.forth(_MODEL.format(name="ra"))
    snap = _snap(_models()[-1])
    t4.forth(probe_loop.format(v="ra"))
    ref = _run_epochs(t4, "ra", epochs=2)

    monkeypatch.setenv("T4_MESH", "dp4")
    t4.forth(_MODEL.format(name="rb"))
    _pin(_models()[-1], snap)
    t4.forth(probe_loop.format(v="rb"))
    got = _run_epochs(t4, "rb", epochs=2)
    _compare(ref, got, "dp4+rollback")


def test_word_mesh_unset_is_none(monkeypatch):
    """no T4_MESH -> no mesh -> executables compile exactly as before
    (zero single-chip overhead); oversubscribed specs degrade to None"""
    from tensorforth_tpu.nn import funcs
    monkeypatch.delenv("T4_MESH", raising=False)
    assert funcs.word_mesh() is None
    monkeypatch.setenv("T4_MESH", "dp4096")
    assert funcs.word_mesh() is None
