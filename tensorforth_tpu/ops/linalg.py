"""Linear algebra words — inverse / LU / PLU / det / solve.

The reference implements pivoted Gauss-Jordan and PLU as per-column CUDA
kernel sequences with host-side pivot search (src/t4math.cu:742-978,
src/mu/tensor.cu:344-456).  Column-serial pivoting is TPU-hostile, so
these are XLA linalg HLOs (blocked LU on the MXU) with the reference's
word-level semantics preserved:

  inverse ( A -- A A' )    Gauss-Jordan equivalent
  luinv   ( A -- A A' )    PLU-based inverse
  plu     ( A -- A P LU )  A = P @ L @ U, LU packed as L\\U (unit diag L)
  upper/lower              triangle extraction from a packed L\\U
  det     ( A -- A d )
  solve   ( B A -- B A X ) solves A X = B
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# The linalg words are ALWAYS f32-strict: on TPU the default matmul
# class truncates multiplicands to bf16, which breaks the 1e-5
# verify-line contract these words carry (t4_22a inverse round-trips).
@jax.jit
def inverse(a):
    """f32 inverse + one Newton-Schulz refinement step: X' = X(2I - AX).
    Recovers the couple of ulps a blocked f32 LU loses, so `inverse @`
    round-trips print as the identity like the reference's Gauss-Jordan
    (acceptance bar: values within 1e-5 of the CUDA build)."""
    with jax.default_matmul_precision("highest"):
        x = jnp.linalg.inv(a)
        k = a.shape[-1]
        eye2 = 2.0 * jnp.eye(k, dtype=jnp.float32)
        return x @ (eye2 - a @ x)


@jax.jit
def _plu(a):
    with jax.default_matmul_precision("highest"):
        p, l, u = jax.scipy.linalg.lu(a)
        k = a.shape[-1]
        lu = l + u - jnp.eye(k, dtype=jnp.float32)
        return p, lu


def plu(a):
    """returns (P, packed L\\U) with A = P @ L @ U"""
    return _plu(a)


@jax.jit
def tri_upper(lu):
    return jnp.triu(lu)


@jax.jit
def tri_lower(lu):
    k = lu.shape[-1]
    return jnp.tril(lu, -1) + jnp.eye(k, dtype=jnp.float32)


@jax.jit
def _det(a):
    with jax.default_matmul_precision("highest"):
        return jnp.linalg.det(a)


def det(a) -> float:
    return float(_det(a))


@jax.jit
def solve(a, b):
    """f32 solve + one iterative-refinement step (x += A\\(b - Ax)):
    integer-exact systems print as integers, matching the reference"""
    with jax.default_matmul_precision("highest"):
        x = jnp.linalg.solve(a, b)
        r = b - a @ x
        return x + jnp.linalg.solve(a, r)
