"""Expert parallelism — a mixture-of-experts feed-forward block sharded
over an 'ep' mesh axis.

Two routing paths, both top-k token-choice with renormalized gates:

* **soft path** (`moe_fwd`): dense expert compute — every expert
  evaluates every token, gates mask afterwards.  Exact, no token drops,
  but FLOPs scale with E.  Right for small E / few tokens where the
  dispatch bookkeeping would dominate.
* **dispatch path** (`moe_fwd_dispatch`): tokens are scattered into
  per-expert capacity buffers [E, C, D] (C = k·S·cf/E), each expert
  runs ONE batched matmul pair over its buffer, and a gather+gate
  combine restores token order.  FLOPs scale with k·cf/E of the dense
  cost.  Over an 'ep'-sharded mesh the scatter/gather become XLA
  all-to-alls — this is the scaling-book EP pattern (VERDICT r2 #5).

Completes the parallelism axes alongside dp/tp/sp/pp (the reference is
single-device throughout, SURVEY.md §2.7).
"""
from __future__ import annotations

import os

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


def moe_fwd_dispatch(x, wr, w1, w2, top_k: int = 2,
                     capacity_factor: float = 1.25):
    """Token-dispatch MoE: x [N, T, D]; wr [E, D]; w1 [E, D, F];
    w2 [E, F, D] -> [N, T, D].

    Each token's top-k experts are chosen from the softmaxed router
    scores (same gate math as `moe_fwd`: keep top-k, renormalize).
    Tokens are packed into static [E, C, D] buffers; assignments beyond
    an expert's capacity C = ceil(k·S/E · cf) are dropped (contribute
    zero), primary choices packing before secondary ones.  Everything
    is static-shaped: scatter with mode='drop' / gather with
    mode='fill' keep the drops inside XLA, no host sync.
    """
    n, t, d = x.shape
    e, _, f = w1.shape
    s = n * t
    k = min(top_k, e)
    xt = x.reshape(s, d)
    scores = jnp.einsum("sd,ed->se", xt, wr,
                        preferred_element_type=jnp.float32)
    gates = jax.nn.softmax(scores, axis=-1)                  # [S, E]
    g_top, idx = jax.lax.top_k(gates, k)                     # [S, k]
    g_top = g_top / jnp.sum(g_top, axis=-1, keepdims=True)

    cap = max(1, int(np.ceil(k * s / e * capacity_factor)))
    # flatten assignments j-major so every token's primary choice wins
    # a buffer slot before any token's secondary choice
    ef = idx.T.reshape(-1)                                   # [k*S]
    gf = g_top.T.reshape(-1)                                 # [k*S]
    tok = jnp.tile(jnp.arange(s), k)                         # [k*S]
    onehot = jax.nn.one_hot(ef, e, dtype=jnp.int32)          # [k*S, E]
    pf = jnp.sum((jnp.cumsum(onehot, axis=0) - 1) * onehot,
                 axis=-1)                                    # pos in expert
    # dispatch: all-to-all under an 'ep'-sharded mesh
    xe = jnp.zeros((e, cap, d), x.dtype).at[ef, pf].add(
        xt[tok], mode="drop")                                # [E, C, D]
    h = jax.nn.relu(jnp.einsum("ecd,edf->ecf", xe, w1,
                               preferred_element_type=jnp.float32))
    ye = jnp.einsum("ecf,efd->ecd", h, w2,
                    preferred_element_type=jnp.float32)      # [E, C, D]
    # combine: gather back (dropped assignments read 0), gate, sum k
    vals = ye.at[ef, pf].get(mode="fill", fill_value=0.0)    # [k*S, D]
    y = jnp.zeros((s, d), vals.dtype).at[tok].add(vals * gf[:, None])
    return y.reshape(n, t, d)


_DISPATCH_MIN_TOKENS = 256       # below this the buffers don't amortize


def moe_select(token_dims, e: int, top_k: int) -> bool:
    """True -> dispatch path.  `token_dims` are the token axes (e.g.
    (N, T)).  Static-shape decision (jit-safe): dispatch when it's
    actually cheaper (k·cf meaningfully below E) and there are enough
    tokens to fill capacity buffers.  T4_MOE_DISPATCH=1/0
    forces/forbids."""
    env = os.environ.get("T4_MOE_DISPATCH", "")
    if env == "1":
        return True
    if env == "0":
        return False
    s = int(np.prod(token_dims))
    cf = float(os.environ.get("T4_MOE_CAP", "1.25"))
    return (s >= _DISPATCH_MIN_TOKENS and e >= 4
            and top_k * cf <= e / 2)


def make_ep_mesh(n_devices: int) -> Mesh:
    return Mesh(np.array(jax.devices()[:n_devices]), ("ep",))


def shard_experts(mesh: Mesh, wr, w1, w2):
    """experts over 'ep'; router replicated"""
    return (jax.device_put(wr, NamedSharding(mesh, P("ep"))),
            jax.device_put(w1, NamedSharding(mesh, P("ep", None, None))),
            jax.device_put(w2, NamedSharding(mesh, P("ep", None, None))))
