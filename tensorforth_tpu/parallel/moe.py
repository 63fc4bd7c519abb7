"""Expert parallelism — a mixture-of-experts feed-forward block sharded
over an 'ep' mesh axis.

Soft top-k routing with dense expert compute: every expert evaluates the
tokens it owns a shard of (w1/w2 stacked expert-major and sharded over
'ep'), gates renormalize the top-k scores, and the combine contracts the
expert axis — XLA partitions the expert einsums per device and inserts
the psum.  Completes the parallelism axes alongside dp/tp/sp/pp
(the reference is single-device throughout, SURVEY.md §2.7).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def moe_fwd(x, wr, w1, w2, top_k: int = 2):
    """x [N, T, D]; wr [E, D]; w1 [E, D, F]; w2 [E, F, D] -> [N, T, D]"""
    scores = jnp.einsum("ntd,ed->nte", x, wr,
                        preferred_element_type=jnp.float32)
    gates = jax.nn.softmax(scores, axis=-1)
    e = gates.shape[-1]
    if top_k < e:                        # keep top-k, renormalize
        kth = jnp.sort(gates, axis=-1)[..., -top_k][..., None]
        gates = jnp.where(gates >= kth, gates, 0.0)
        gates = gates / jnp.sum(gates, axis=-1, keepdims=True)
    h = jnp.einsum("ntd,edf->ntef", x, w1,
                   preferred_element_type=jnp.float32)
    h = jax.nn.relu(h)
    y = jnp.einsum("ntef,efd->nted", h, w2,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("nted,nte->ntd", y, gates,
                      preferred_element_type=jnp.float32)


def make_ep_mesh(n_devices: int) -> Mesh:
    return Mesh(np.array(jax.devices()[:n_devices]), ("ep",))


def shard_experts(mesh: Mesh, wr, w1, w2):
    """experts over 'ep'; router replicated"""
    return (jax.device_put(wr, NamedSharding(mesh, P("ep"))),
            jax.device_put(w1, NamedSharding(mesh, P("ep", None, None))),
            jax.device_put(w2, NamedSharding(mesh, P("ep", None, None))))
