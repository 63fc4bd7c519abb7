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


needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 (virtual) devices")


@needs8
def test_expert_parallel_matches_replicated():
    """ep-sharded MoE forward + grads == replicated"""
    from tensorforth_tpu.parallel.moe import (moe_fwd, make_ep_mesh,
                                              shard_experts)
    rng = np.random.RandomState(7)
    n, t, d, f, e = 4, 6, 8, 16, 8
    x = jnp.asarray(rng.randn(n, t, d), jnp.float32)
    wr = jnp.asarray(rng.randn(e, d) * 0.3, jnp.float32)
    w1 = jnp.asarray(rng.randn(e, d, f) * 0.3, jnp.float32)
    w2 = jnp.asarray(rng.randn(e, f, d) * 0.3, jnp.float32)

    def loss(wr_, w1_, w2_):
        return jnp.sum(moe_fwd(x, wr_, w1_, w2_) ** 2)

    ref_y = moe_fwd(x, wr, w1, w2)
    ref_g = jax.grad(loss, argnums=(1,))(wr, w1, w2)[0]

    mesh = make_ep_mesh(8)
    swr, sw1, sw2 = shard_experts(mesh, wr, w1, w2)
    got_y = jax.jit(moe_fwd, static_argnames=("top_k",))(x, swr, sw1, sw2)
    got_g = jax.jit(jax.grad(loss, argnums=(1,)))(swr, sw1, sw2)[0]
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               rtol=5e-4, atol=5e-5)
