"""SPMD sharding tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


@needs_mesh
def test_mesh_shapes():
    from tensorforth_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("dp", "tp")


@needs_mesh
def test_sharded_train_step_runs_and_learns(t4):
    from tensorforth_tpu.models import mnist_cnn
    from tensorforth_tpu.parallel.trainer import ShardedTrainer
    model = mnist_cnn(batch=16)
    tr = ShardedTrainer(model, loss="ce", lr=1e-2)
    x = np.random.RandomState(0).rand(16, 28, 28, 1).astype(np.float32)
    y = np.zeros((16, 1, 10, 1), np.float32)
    y[np.arange(16), 0, np.arange(16) % 10, 0] = 1.0
    losses = [tr.step(x, y, seed=i) for i in range(8)]
    assert losses[-1] < losses[0], f"no learning: {losses}"


@needs_mesh
def test_sharded_matches_single_device(t4):
    """dp/tp-sharded forward must equal replicated forward"""
    from tensorforth_tpu.models import mnist_cnn
    from tensorforth_tpu.parallel.mesh import (make_mesh, shard_batch,
                                               shard_params)
    from tensorforth_tpu.parallel.trainer import _forward_pure
    model = mnist_cnn(batch=8)
    program = model._program()
    params = model._params()
    x = jnp.asarray(np.random.RandomState(1).rand(8, 28, 28, 1),
                    jnp.float32)
    key = jax.random.PRNGKey(0)
    ref = _forward_pure(program, x, params, key)

    mesh = make_mesh(8)
    psh = shard_params(mesh, program)
    sp = tuple(tuple(jax.device_put(w, s) for w, s in zip(pl, sl))
               for pl, sl in zip(params, psh))
    xs = jax.device_put(x, shard_batch(mesh))
    out = jax.jit(lambda x_, p_: _forward_pure(program, x_, p_, key))(xs, sp)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=2e-5, atol=2e-6)


def test_graft_entry_single():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "graft", os.path.join(os.path.dirname(__file__), "..",
                              "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (100, 1, 10, 1)


@needs_mesh
def test_remat_train_step_matches():
    """jax.checkpoint'd step must produce identical updates"""
    from tensorforth_tpu.models import mnist_cnn
    from tensorforth_tpu.parallel.trainer import (make_train_step,
                                                  init_opt_state)
    model = mnist_cnn(batch=8)
    program = model._program()
    params = model._params()
    x = jnp.asarray(np.random.RandomState(3).rand(8, 28, 28, 1), jnp.float32)
    y = jnp.zeros((8, 1, 10, 1), jnp.float32).at[:, 0, 0, 0].set(1.0)
    key = jax.random.PRNGKey(0)
    copy = lambda p: jax.tree.map(jnp.copy, p)   # steps donate their inputs
    p1, _, l1 = make_train_step(program)(copy(params),
                                         init_opt_state(params), x, y, key)
    p2, _, l2 = make_train_step(program, remat=True)(
        copy(params), init_opt_state(params), x, y, key)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p1[0][0]), np.asarray(p2[0][0]),
                               rtol=1e-5, atol=1e-7)


@needs_mesh
def test_nn_train_on_mesh(t4, monkeypatch):
    """T4_MESH routes the fused-epoch word through SPMD shardings"""
    monkeypatch.setenv("T4_MAX_BATCH", "4")
    monkeypatch.setenv("T4_MESH", "dp4,tp2")
    t4.forth("""0 trace
16 28 28 1 nn.model
flatten 64 linear relu 10 linear softmax
constant mm2
mm2 batchsize dataset mnist_train constant dm2
mm2 dm2 0.001 40 nn.train""")
    out = t4.forth("dm2 rewind\nmm2 dm2 forward nn.hit .")
    last = [l for l in out.strip().split("\n") if l][-1]
    assert int(float(last.split()[0])) >= 10


@needs_mesh
def test_seq_parallel_transformer_matches():
    """dp/sp/tp-sharded transformer forward == replicated forward"""
    from tensorforth_tpu.models import tiny_transformer
    from tensorforth_tpu.parallel.mesh import (make_mesh3, shard_seq_batch,
                                               shard_params_seq)
    from tensorforth_tpu.parallel.trainer import _forward_pure
    m = tiny_transformer(batch=4, seq=8, dim=16, heads=4, classes=4,
                         layers=1)
    program = m._program()
    params = m._params()
    x = jnp.asarray(np.random.RandomState(5).rand(4, 8, 16, 1), jnp.float32)
    key = jax.random.PRNGKey(0)
    ref = _forward_pure(program, x, params, key)

    mesh = make_mesh3(8, dp=2, sp=2, tp=2)
    psh = shard_params_seq(mesh, program)
    sp = tuple(tuple(jax.device_put(w, s) for w, s in zip(pl, sl))
               for pl, sl in zip(params, psh))
    xs = jax.device_put(x, shard_seq_batch(mesh))
    out = jax.jit(lambda x_, p_: _forward_pure(program, x_, p_, key))(xs, sp)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=2e-5, atol=2e-6)
