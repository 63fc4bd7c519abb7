"""Pipeline parallelism — GPipe-style microbatch pipeline over a 'pp'
mesh axis.

The reference left this as a comment ("TODO: model execution becomes a
superscalar pipeline", forward.cu:42).  TPU-first realization: S
identical stages (e.g. repeated attention blocks) hold their parameters
stage-major on S devices; microbatches circulate with
`jax.lax.ppermute` inside a `shard_map`, so stage i computes microbatch
j while stage i+1 computes microbatch j-1.  The whole pipeline is
differentiable (ppermute has a transpose rule), so `jax.grad` of a
pipelined loss trains all stages.

Schedule: T = n_micro + S - 1 ticks; device d applies its stage at tick
t to the activation that entered the pipe at tick t-d.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map                      # jax >= 0.8
except ImportError:                                # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_pp_mesh(n_stages: int) -> Mesh:
    devs = jax.devices()[:n_stages]
    return Mesh(np.array(devs), ("pp",))


def pipeline_apply(stage_fn, mesh: Mesh, n_stages: int):
    """returns f(stacked_params, x_micro) -> y_micro

    stacked_params: pytree with leading axis n_stages (sharded over 'pp')
    x_micro:        [n_micro, mb, ...] microbatched input (replicated)
    stage_fn(params_slice, x) -> x'   applied by each stage in turn
    """

    def _shmap_body(params, xs):
        # params: this device's stage slice [1, ...]; xs: all microbatches
        p = jax.tree.map(lambda a: a[0], params)
        stage = jax.lax.axis_index("pp")
        n_micro = xs.shape[0]
        T = n_micro + n_stages - 1
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(carry, t):
            acc, ys = carry
            # stage 0 ingests microbatch t (others use the permuted acc)
            x_in = jnp.where(stage == 0,
                             xs[jnp.minimum(t, n_micro - 1)], acc)
            y = stage_fn(p, x_in)
            # active only while data is in this stage's window
            active = jnp.logical_and(t - stage >= 0, t - stage < n_micro)
            y = jnp.where(active, y, acc)
            # last stage banks finished microbatch t-(S-1)
            done = t - (n_stages - 1)
            ys = jax.lax.cond(
                jnp.logical_and(stage == n_stages - 1, done >= 0),
                lambda ys: jax.lax.dynamic_update_index_in_dim(
                    ys, y, jnp.maximum(done, 0), 0),
                lambda ys: ys, ys)
            nxt = jax.lax.ppermute(y, "pp", perm)
            return (nxt, ys), None

        acc0 = jnp.zeros_like(xs[0])
        ys0 = jnp.zeros_like(xs)
        (_, ys), _ = jax.lax.scan(tick, (acc0, ys0), jnp.arange(T))
        # the last stage holds the banked outputs; broadcast to all
        ys_all = jax.lax.all_gather(ys, "pp")            # [S, n_micro, ...]
        return ys_all[n_stages - 1]

    kwargs = dict(mesh=mesh, in_specs=(P("pp"), P()), out_specs=P())
    try:
        fn = shard_map(_shmap_body, check_vma=False, **kwargs)
    except TypeError:                              # older jax
        fn = shard_map(_shmap_body, check_rep=False, **kwargs)
    return fn


def pipeline_loss_fn(stage_fn, head_fn, mesh, n_stages):
    """loss over a pipelined body + replicated head; differentiable"""
    pipe = pipeline_apply(stage_fn, mesh, n_stages)

    def loss(stacked_params, head_params, x_micro, y_micro):
        h = pipe(stacked_params, x_micro)
        return head_fn(head_params, h, y_micro)

    return loss
