"""Sharded functional trainer — one jitted SPMD train step over a Mesh.

This is the scaling path the reference never built (its VM-pool
multitasking scaffold is compiled out): the whole train step
(forward -> loss -> grads -> Adam) compiles to a single XLA program;
partitioned per the mesh shardings; collectives ride ICI.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..nn import funcs
from .mesh import make_mesh, shard_batch, shard_params


def _forward_pure(program, x, params, key):
    for j, spec in enumerate(program):
        kj = jax.random.fold_in(key, j)
        x, _m = funcs._apply_layer(spec, x, params[j], kj)
        x = x.reshape(spec[2])
    return x


def _loss_pure(program, params, x, tgt, key, loss: str):
    out = _forward_pure(program, x, params, key)
    n = out.shape[0]
    o = out.reshape(n, -1)
    t = tgt.reshape(n, -1)
    if loss == "ce":
        z = -jnp.sum(t * jnp.log(jnp.maximum(o, 1e-12)))
    elif loss == "bce":
        z = -jnp.sum(t * jnp.log(o + 1e-6)
                     + (1.0 - t) * jnp.log(1.0 - o + 1e-6))
    else:
        z = jnp.sum((o - t) ** 2)
    return z / n


def make_train_step(program, loss: str = "ce", lr: float = 1e-3,
                    b1: float = 0.9, b2: float = 0.999, jit: bool = True,
                    remat: bool = False):
    """returns (jitted) step(params, opt_state, x, tgt, key)
    -> (params', opt_state', loss); pass jit=False to compose the raw
    step into a larger program (e.g. a lax.scan epoch); remat=True
    rematerializes the forward pass in backward (trade FLOPs for HBM —
    use for activation-bound deep nets).

    NOTE: this is the *generic scaling* trainer — true autodiff grads of
    the mean loss and textbook bias-corrected Adam (eps 1e-8).  It does
    NOT reproduce the reference's word-path update (pass-through quirks,
    uncorrected Adam, eps 1e-6); the ``nn.train`` word uses
    nn/train.py's make_ref_batch_step for that (see
    docs/ARCHITECTURE.md §Deviations, tests/test_train_equiv.py)."""
    loss_fn = _loss_pure
    if remat:
        loss_fn = jax.checkpoint(_loss_pure, static_argnums=(0, 5))

    def step(params, opt_state, x, tgt, key):
        lval, grads = jax.value_and_grad(
            lambda p: loss_fn(program, p, x, tgt, key, loss))(params)
        m, v, t = opt_state
        t = t + 1
        lr_t = lr * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        new_p, new_m, new_v = [], [], []
        for pl, gl, ml, vl in zip(params, grads, m, v):
            np_l, nm_l, nv_l = [], [], []
            for pw, gw, mw, vw in zip(pl, gl, ml, vl):
                mw = b1 * mw + (1 - b1) * gw
                vw = b2 * vw + (1 - b2) * gw * gw
                pw = pw - lr_t * mw / (jnp.sqrt(vw) + 1e-8)
                np_l.append(pw)
                nm_l.append(mw)
                nv_l.append(vw)
            new_p.append(tuple(np_l))
            new_m.append(tuple(nm_l))
            new_v.append(tuple(nv_l))
        return (tuple(new_p), (tuple(new_m), tuple(new_v), t), lval)

    return jax.jit(step, donate_argnums=(0, 1)) if jit else step


def init_opt_state(params):
    zeros = tuple(tuple(jnp.zeros_like(w) for w in pl) for pl in params)
    return (zeros, tuple(tuple(jnp.zeros_like(w) for w in pl)
                         for pl in params), jnp.int32(0))


class ShardedTrainer:
    """drives a Model's program over a (dp, tp) mesh"""

    def __init__(self, model, mesh=None, loss: str = "ce", lr: float = 1e-3):
        self.mesh = mesh or make_mesh()
        self.program = model._program()
        params = model._params()
        psh = shard_params(self.mesh, self.program)
        self.params = tuple(
            tuple(jax.device_put(w, s) for w, s in zip(pl, sl))
            for pl, sl in zip(params, psh))
        self.opt_state = init_opt_state(self.params)
        self.x_sh = shard_batch(self.mesh)
        self._step = make_train_step(self.program, loss, lr)
        self._i = 0

    def step(self, x, tgt, seed: int = 0):
        x = jax.device_put(jnp.asarray(x, jnp.float32), self.x_sh)
        tgt = jax.device_put(jnp.asarray(tgt, jnp.float32), self.x_sh)
        key = jax.random.PRNGKey(seed + self._i)
        self._i += 1
        self.params, self.opt_state, lval = self._step(
            self.params, self.opt_state, x, tgt, key)
        return float(lval)

    def write_back(self, model):
        """copy trained params back into the interpreter's model object —
        table-driven over every parameterized layer _params() emits
        (CONV/DCONV/LINEAR/BATCHNM/ATTN alike)"""
        from ..nn.train import write_back
        write_back(model, self.params)
