"""Fused epoch training — the device-resident TPU fast path behind the
``nn.train`` extension word.

Stages the whole corpus on device once, builds [n_batches, batch, ...]
views, and runs each epoch as ONE lax.scan-jitted XLA program
(forward -> CE -> grads -> Adam per batch inside the scan).  Trained
parameters are written back into the interpreter's Model object, so
``nn.w`` / ``forward`` / ``save`` observe the result exactly as if the
word-at-a-time loop had run.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .ntypes import Layer
from ..parallel.trainer import make_train_step, init_opt_state


def _stage_batches(ds, model, max_batches: int | None = None):
    """corpus -> device [n_batches, batch, H, W, C] + onehot labels"""
    cp = ds._corpus
    if cp is None:
        raise ValueError("dataset has no corpus bound")
    batch = ds.batch_sz
    import os
    size = cp.size
    max_b = int(os.environ.get("T4_MAX_BATCH", "0"))
    n_batches = size // batch
    if max_b:
        n_batches = min(n_batches, max_b)
    if max_batches:
        n_batches = min(n_batches, max_batches)
    data, labels = cp._read(0, n_batches * batch)
    x = (jnp.asarray(data, jnp.float32) - ds._mean) * ds._scale
    x = x.reshape((n_batches, batch) + tuple(model[0].shape[1:]))
    classes = model[-1].HWC()
    y = jax.nn.one_hot(jnp.asarray(labels, jnp.int32), classes,
                       dtype=jnp.float32)
    y = y.reshape(n_batches, batch, 1, classes, 1)
    return x, y, n_batches


def _mesh_from_env():
    """T4_MESH=dp4,tp2 -> (dp, tp) mesh over available devices"""
    import os
    spec = os.environ.get("T4_MESH")
    if not spec:
        return None
    from ..parallel.mesh import make_mesh
    dp = tp = None
    for part in spec.split(","):
        part = part.strip()
        if part.startswith("dp"):
            dp = int(part[2:])
        elif part.startswith("tp"):
            tp = int(part[2:])
    n = (dp or 1) * (tp or 1)
    return make_mesh(n, dp=dp, tp=tp)


def train_epochs(model, ds, lr: float = 1e-3, epochs: int = 1,
                 trace: int = 0) -> float:
    program = model._program()
    params = model._params()
    opt = init_opt_state(params)
    step = make_train_step(program, loss="ce", lr=lr, jit=False)
    x, y, n_batches = _stage_batches(ds, model)

    mesh = _mesh_from_env()
    if mesh is not None:                      # SPMD: dp batches, tp features
        from ..parallel.mesh import shard_params, shard_batch
        from jax.sharding import NamedSharding, PartitionSpec as P
        psh = shard_params(mesh, program)
        params = tuple(
            tuple(jax.device_put(w, s) for w, s in zip(pl_, sl))
            for pl_, sl in zip(params, psh))
        opt = init_opt_state(params)
        bsh = NamedSharding(mesh, P(None, "dp"))   # [n_batches, batch, ...]
        x = jax.device_put(x, bsh)
        y = jax.device_put(y, bsh)
        if trace:
            from ..system import System
            System.get_sys().pstr(
                f"\\   nn.train mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}\n")

    @jax.jit
    def epoch(params, opt_state, key):
        def body(carry, xy):
            p, o = carry
            p, o, l = step(p, o, xy[0], xy[1], key)
            return (p, o), l
        (p, o), ls = jax.lax.scan(body, (params, opt_state), (x, y))
        return p, o, ls.mean()

    loss = 0.0
    from ..system import System
    sys = System.get_sys()
    for e in range(epochs):
        params, opt, lv = epoch(params, opt, jax.random.PRNGKey(e))
        if trace:
            loss = float(lv)
            sys.pstr(f"\\   epoch {e}: {n_batches} batches, "
                     f"loss={loss:.6g}\n")
    loss = float(lv)
    model.tick()

    # write trained parameters back into the interpreter's model
    for j in range(model.numel - 1):
        t_in = model[j]
        if t_in.grad_fn in (Layer.CONV, Layer.DCONV, Layer.LINEAR,
                            Layer.BATCHNM):
            w, b = params[j]
            t_in.grad[0].replace_data(w.reshape(t_in.grad[0].shape))
            t_in.grad[1].replace_data(b.reshape(t_in.grad[1].shape))
    return loss
