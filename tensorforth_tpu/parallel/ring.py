"""Ring attention over the sequence-parallel ('sp') mesh axis.

The pjit sp path lets XLA all-gather K/V when attention contracts over
a sharded sequence axis — O(S) memory per device but the whole K/V
lands on every chip at once.  Ring attention instead circulates K/V
shards around the ICI ring with `ppermute`, one hop per step: each
device combines per-chunk softmax partials with the log-sum-exp merge,
so peak memory is one K/V CHUNK and communication overlaps compute
(the scaling-book long-context recipe; Liu et al. 2023).

Each chunk's partial runs through the same sdpa core as the ATTN layer
(Pallas flash kernels on eligible TPU shapes, fused einsum elsewhere),
returning chunk-normalized outputs + lse; causal masking is exact
across chunks: the diagonal chunk is processed causally, future chunks
contribute -inf lse (their partials drop out of the merge).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map                      # jax >= 0.8
except ImportError:                                # pragma: no cover
    from jax.experimental.shard_map import shard_map

NEG_INF = -1.0e30


def _chunk_attn(q, k, v, causal: bool):
    """chunk-normalized attention + per-row lse; q [B,Sq,dh], k/v
    [B,Skv,dh].  Uses the flash kernels when eligible — through the
    differentiable (o, lse) wrapper, because the merge consumes lse and
    training differentiates through it (a raw pallas_call has no
    autodiff rule; the lse cotangent rides the backward kernels' delta
    stream, ops/attn_pallas.py flash_attention_lse)."""
    from ..nn.funcs import _flash_ok
    b, sq, dh = q.shape
    skv = k.shape[1]
    if sq == skv and _flash_ok(sq, dh):
        from ..ops.attn_pallas import flash_attention_lse
        return flash_attention_lse(q, k, v, causal)
    sc = jnp.einsum("nqd,nkd->nqk", q, k,
                    preferred_element_type=jnp.float32)
    sc = sc / jnp.sqrt(jnp.float32(dh))
    if causal:
        qi = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 0)
        ki = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 1)
        sc = jnp.where(ki <= qi, sc, NEG_INF)
    lse = jax.scipy.special.logsumexp(sc, axis=-1)         # [B, Sq]
    o = jnp.einsum("nqk,nkd->nqd", jax.nn.softmax(sc, axis=-1), v,
                   preferred_element_type=jnp.float32)
    return o, lse


def _merge(o1, l1, o2, l2):
    """combine two chunk-normalized partials via their lse weights"""
    m = jnp.maximum(l1, l2)
    m = jnp.maximum(m, NEG_INF)            # both -inf -> weights 0/0 guard
    w1 = jnp.exp(l1 - m)[..., None]
    w2 = jnp.exp(l2 - m)[..., None]
    den = jnp.maximum(w1 + w2, 1e-38)
    o = (o1 * w1 + o2 * w2) / den
    return o, m + jnp.log(jnp.maximum(w1[..., 0] + w2[..., 0], 1e-38))


def _ring_body(q, k, v, causal: bool, axis: str, n_shards: int):
    """per-device shard_map body: q/k/v [B, S_loc, dh] local shards"""
    i = jax.lax.axis_index(axis)
    perm = [(s, (s + 1) % n_shards) for s in range(n_shards)]

    def step(carry, t):
        o, lse, k_c, v_c = carry
        src = (i - t) % n_shards           # owner of the K/V we hold
        if causal:
            po, pl = jax.lax.cond(
                src == i,
                lambda: _chunk_attn(q, k_c, v_c, True),    # diagonal
                lambda: _chunk_attn(q, k_c, v_c, False))
            pl = jnp.where(src <= i, pl, NEG_INF)  # future chunks drop
        else:
            po, pl = _chunk_attn(q, k_c, v_c, False)
        o, lse = _merge(o, lse, po, pl)
        k_c = jax.lax.ppermute(k_c, axis, perm)
        v_c = jax.lax.ppermute(v_c, axis, perm)
        return (o, lse, k_c, v_c), None

    o0 = jnp.zeros_like(q)
    l0 = jnp.full(q.shape[:2], NEG_INF, jnp.float32)
    (o, _, _, _), _ = jax.lax.scan(step, (o0, l0, k, v),
                                   jnp.arange(n_shards))
    return o


def ring_attention(q, k, v, mesh: Mesh, causal: bool = False,
                   axis: str = "sp"):
    """q,k,v: [B, S, dh] with S sharded over `axis` -> [B, S, dh]
    (same sharding).  B may additionally shard over other mesh axes."""
    n_shards = mesh.shape[axis]
    names = mesh.axis_names
    bspec = P(names[0] if names[0] != axis else None, axis)
    body = partial(_ring_body, causal=causal, axis=axis,
                   n_shards=n_shards)
    kwargs = dict(mesh=mesh, in_specs=(bspec, bspec, bspec),
                  out_specs=bspec)
    try:
        fn = shard_map(body, check_vma=False, **kwargs)
    except TypeError:                              # pragma: no cover
        fn = shard_map(body, check_rep=False, **kwargs)
    return fn(q, k, v)
