"""Pipeline-parallel tests: GPipe microbatch schedule over 'pp' must
match sequential stage application, for values AND gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

needs4 = pytest.mark.skipif(len(jax.devices()) < 4,
                            reason="needs 4 (virtual) devices")


def _stage_fn(p, x):
    """one MHA block + tanh (same structure per stage)"""
    from tensorforth_tpu.nn.funcs import _mha_fwd
    wqkv, wo = p
    return jnp.tanh(_mha_fwd(x, wqkv, wo, 2, flash=False))


def _make(n_stages=4, n_micro=8, mb=2, s=4, e=8, seed=0):
    rng = np.random.RandomState(seed)
    stacked = (jnp.asarray(rng.randn(n_stages, 3 * e, e) * 0.2,
                           jnp.float32),
               jnp.asarray(rng.randn(n_stages, e, e) * 0.2, jnp.float32))
    x = jnp.asarray(rng.randn(n_micro, mb, s, e, 1), jnp.float32)
    return stacked, x


def _sequential(stacked, x):
    n_stages = stacked[0].shape[0]
    ys = []
    for j in range(x.shape[0]):
        h = x[j]
        for i in range(n_stages):
            h = _stage_fn((stacked[0][i], stacked[1][i]), h)
        ys.append(h)
    return jnp.stack(ys)


@needs4
def test_pipeline_matches_sequential():
    from tensorforth_tpu.parallel.pipeline import (make_pp_mesh,
                                                   pipeline_apply)
    stacked, x = _make()
    mesh = make_pp_mesh(4)
    pipe = pipeline_apply(_stage_fn, mesh, 4)
    got = pipe(stacked, x)
    want = _sequential(stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


@needs4
def test_pipeline_gradients_match():
    from tensorforth_tpu.parallel.pipeline import (make_pp_mesh,
                                                   pipeline_apply)
    stacked, x = _make(seed=3)
    mesh = make_pp_mesh(4)
    pipe = pipeline_apply(_stage_fn, mesh, 4)

    def loss_pipe(p):
        return jnp.sum(pipe(p, x) ** 2)

    def loss_seq(p):
        return jnp.sum(_sequential(p, x) ** 2)

    g1 = jax.grad(loss_pipe)(stacked)
    g2 = jax.grad(loss_seq)(stacked)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)
