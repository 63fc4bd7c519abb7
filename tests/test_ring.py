"""Ring attention over the 'sp' axis (parallel/ring.py): sharded ==
full-attention numerics, causal and bidirectional, with and without an
extra dp axis."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the 8-device CPU mesh")


def _data(b=4, s=32, dh=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(ks[i], (b, s, dh), jnp.float32)
                 for i in range(3))


@needs_mesh
@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_full(t4, causal):
    from tensorforth_tpu.nn.funcs import _sdpa_ref
    from tensorforth_tpu.parallel.ring import ring_attention
    q, k, v = _data()
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    sh = NamedSharding(mesh, P(None, "sp"))
    qs, ks_, vs = (jax.device_put(x, sh) for x in (q, k, v))
    got = ring_attention(qs, ks_, vs, mesh, causal=causal)
    want = _sdpa_ref(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@needs_mesh
def test_ring_with_dp_axis(t4):
    from tensorforth_tpu.nn.funcs import _sdpa_ref
    from tensorforth_tpu.parallel.ring import ring_attention
    q, k, v = _data(b=8, s=16, dh=8, seed=3)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "sp"))
    sh = NamedSharding(mesh, P("dp", "sp"))
    qs, ks_, vs = (jax.device_put(x, sh) for x in (q, k, v))
    got = ring_attention(qs, ks_, vs, mesh, causal=True)
    want = _sdpa_ref(q, k, v, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # output keeps the input sharding (no implicit gather)
    assert got.sharding.spec == P("dp", "sp")


@needs_mesh
def test_ring_is_differentiable(t4):
    """grad through the ring (ppermute transpose) matches the full
    attention gradient — ring attention can TRAIN, not just serve"""
    from tensorforth_tpu.nn.funcs import _sdpa_ref
    from tensorforth_tpu.parallel.ring import ring_attention
    q, k, v = _data(b=2, s=16, dh=8, seed=5)
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    sh = NamedSharding(mesh, P(None, "sp"))
    qs, ks_, vs = (jax.device_put(x, sh) for x in (q, k, v))

    g_ring = jax.grad(
        lambda q_: jnp.sum(ring_attention(q_, ks_, vs, mesh, True) ** 2))(qs)
    g_full = jax.grad(
        lambda q_: jnp.sum(_sdpa_ref(q_, k, v, True) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_full),
                               rtol=2e-4, atol=2e-4)
