"""Stateless device RNG — replaces the reference's 1024 cuRAND states
(src/util.cu:28-70) with JAX threefry keys folded per call.  Distribution
semantics match: v = scale * (bias + u), u ~ U[0,1) or N(0,1).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("shape", "dist"))
def _fill(key, shape, dist, bias, scale):
    k = jax.random.PRNGKey(key) if isinstance(key, int) else key
    u = (jax.random.normal(k, shape, dtype=jnp.float32) if dist == "normal"
         else jax.random.uniform(k, shape, dtype=jnp.float32))
    return scale * (bias + u)


def fill(shape, dist: str, bias: float, scale: float, seed: int):
    return _fill(jax.random.PRNGKey(seed), tuple(int(d) for d in shape),
                 dist, jnp.float32(bias), jnp.float32(scale))


def scalar(dist: str, seed: int) -> float:
    return float(_fill(jax.random.PRNGKey(seed), (1,), dist,
                       jnp.float32(0.0), jnp.float32(1.0))[0])


def uniform_mask(shape, seed: int):
    """dropout mask source, U[0,1)"""
    return fill(shape, "uniform", 0.0, 1.0, seed)
