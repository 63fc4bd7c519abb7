"""Device op engine — elementwise maps, broadcast binary ops, matmul,
reductions.  All compute dispatches through jitted XLA executables; the
jit cache is keyed by (op, shape, dtype) so the interpreter's eager
word-at-a-time execution costs one compile per new signature and then
replays compiled binaries (SURVEY.md §7 hard-part #1).

Reference behavior: src/t4math.cu (k_math/k_ts_op/k_tt_op/k_gemm*/k_sum/
k_nvar/k_max), src/mu/tensor.cu host wrappers.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# elementwise self-ops (reference k_math, t4math.cu:168-199)
# ---------------------------------------------------------------------------
_DU_LNX = 1.0e-12     # log clamp


@partial(jax.jit, static_argnames=("op",))
def _map_op(op: str, x, v):
    if op == "abs":   return jnp.abs(x)
    if op == "neg":   return -x
    if op == "exp":   return jnp.exp(x)
    if op == "ln":    return jnp.log(jnp.maximum(x, _DU_LNX))
    if op == "log":   return jnp.log10(jnp.maximum(x, _DU_LNX))
    if op == "tanh":  return jnp.tanh(x)
    if op == "relu":  return jnp.maximum(x, 0.0)
    if op == "sigm":  return jax.nn.sigmoid(x)
    if op == "sqrt":  return jnp.sqrt(jnp.maximum(x, 0.0))
    if op == "rcp":   return 1.0 / x
    if op == "sat":   return jnp.clip(x, 0.0, 1.0)
    if op == "fill":  return jnp.full_like(x, v)
    if op == "gfill":
        n = x.size
        j = jnp.arange(n, dtype=jnp.float32).reshape(x.shape)
        return v * j / n
    if op == "scale": return x * v
    if op == "pow":   return jnp.power(x, v)
    if op == "sin":   return jnp.sin(x)
    if op == "cos":   return jnp.cos(x)
    if op == "add":   return x + v
    if op == "sub":   return x - v
    if op == "mul":   return x * v
    if op == "div":   return x / v
    raise ValueError(f"map op {op}?")


def map_op(op: str, x, v=0.0):
    return _map_op(op, x, jnp.float32(v))


@jax.jit
def _identity_like(x):
    """eye over the (H, W) plane: rank-2 direct, rank-4 per (N, C) slice"""
    if x.ndim == 4:
        n, h, w, c = x.shape
        return jnp.broadcast_to(
            jnp.eye(h, w, dtype=jnp.float32)[None, :, :, None], x.shape)
    h, w = x.shape[-2], x.shape[-1]
    return jnp.broadcast_to(jnp.eye(h, w, dtype=jnp.float32), x.shape)


def identity(x):
    return _identity_like(x)


# ---------------------------------------------------------------------------
# deferred-scalar (future) ops — 0-d device arithmetic, asynchronous;
# names match the tenvm _MAP_NAME/_BIN_NAME tables.  Guards mirror the
# host scalar ALU (vm.py xop1) so a deferred chain matches the eager one.
# ---------------------------------------------------------------------------
_SC_UN = {
    "abs": jnp.abs, "neg": jnp.negative, "exp": jnp.exp,
    "tanh": jnp.tanh, "sqrt": jnp.sqrt, "sin": jnp.sin, "cos": jnp.cos,
    "relu": lambda x: jnp.maximum(x, 0.0),
    "sigm": jax.nn.sigmoid,
    "rcp": lambda x: 1.0 / x,
    "sat": lambda x: jnp.clip(x, 0.0, 1.0),
    "ln": lambda x: jnp.where(x > 1e-6, jnp.log(jnp.maximum(x, 1e-6)), 0.0),
    "log": lambda x: jnp.where(x > 1e-6, jnp.log10(jnp.maximum(x, 1e-6)), 0.0),
}


def sc_op1(name, x):
    """unary device-scalar op; None = no device mapping (host resolves)"""
    f = _SC_UN.get(name)
    if f is None:
        return None
    return f(jnp.asarray(x, jnp.float32))


def sc_op2(name, a, b):
    """binary device-scalar op; None = no device mapping (host resolves)"""
    if name not in ("add", "sub", "mul", "div", "max", "min"):
        return None
    return _bin_op(name, jnp.asarray(a, jnp.float32),
                   jnp.asarray(b, jnp.float32))


# ---------------------------------------------------------------------------
# broadcast binary ops (reference k_ts_op / k_tt_op, Tensor::ten_op)
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("op",))
def _bin_op(op: str, a, b):
    if op == "add": return a + b
    if op == "sub": return a - b
    if op == "mul": return a * b
    if op == "div": return a / b
    if op == "max": return jnp.maximum(a, b)
    if op == "min": return jnp.minimum(a, b)
    raise ValueError(f"bin op {op}?")


def ten_op_ts(op: str, a, v):
    """tensor (+) scalar broadcast"""
    return _bin_op(op, a, jnp.float32(v))


def ten_op_st(op: str, v, a):
    """scalar (+) tensor broadcast (for SUB/DIV ordering)"""
    return _bin_op(op, jnp.full_like(a, v), a)


def ten_op_tt(op: str, a, b, out_shape):
    """Hadamard with N-broadcast (reference tensor.cu ten_op w/ N bcast)"""
    numel = int(np.prod(out_shape))
    if a.size == b.size:
        r = _bin_op(op, a.reshape(-1), b.reshape(-1))
    else:
        # one side has N==1: broadcast over leading batch
        big, small, flip = (a, b, False) if a.size > b.size else (b, a, True)
        n = big.size // small.size
        bb = big.reshape(n, small.size)
        ss = small.reshape(1, small.size)
        r = _bin_op(op, ss, bb) if flip else _bin_op(op, bb, ss)
    return r.reshape(out_shape)


# ---------------------------------------------------------------------------
# matmul (reference Tensor::mm / k_gemm_tile_claude)
# ---------------------------------------------------------------------------
# Word-tier matmuls are ALWAYS f32-strict (precision="highest"): the
# interactive `@` tier's contract is the reference's 1e-5 verify-lines,
# and on TPU the default class truncates multiplicands to bf16.  The
# throughput tiers (nn/funcs training programs, gemm2..4, flash) keep
# their own documented precision classes.
@jax.jit
def _mm2d(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


@jax.jit
def _mv(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


@jax.jit
def _mm_batched(a, b):
    """a:[N,H,W,C] @ b:[N,W,K,C] -> [N,H,K,C] (channel as batch)"""
    return jnp.einsum("nhwc,nwkc->nhkc", a, b,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def matmul(a_arr, a_shape, b_arr, b_shape):
    """dispatch rank combinations like TensorVM::_tdot"""
    if len(a_shape) == 2 and len(b_shape) == 1:
        return _mv(a_arr, b_arr)
    if len(a_shape) == 2 and len(b_shape) == 2:
        return _mm2d(a_arr, b_arr)
    # rank-4 N-broadcast
    na = a_shape[0] if len(a_shape) == 4 else 1
    nb = b_shape[0] if len(b_shape) == 4 else 1
    n = max(na, nb)
    ca = a_shape[-1] if len(a_shape) == 4 else 1
    a4 = a_arr.reshape((na,) + ((a_shape[1], a_shape[2], a_shape[3])
                                if len(a_shape) == 4 else (a_shape[0], a_shape[1], 1)))
    b4 = b_arr.reshape((nb,) + ((b_shape[1], b_shape[2], b_shape[3])
                                if len(b_shape) == 4 else (b_shape[0], b_shape[1], 1)))
    a4 = jnp.broadcast_to(a4, (n,) + a4.shape[1:])
    b4 = jnp.broadcast_to(b4, (n,) + b4.shape[1:])
    return _mm_batched(a4, b4)


@partial(jax.jit, static_argnames=("ta", "tb"))
def _gemm_xla(a, b, c, alpha, beta, ta, tb):
    aa = a.T if ta else a
    bb = b.T if tb else b
    # gemm0/1 are the reference-parity A/B baseline — f32-strict
    return alpha * jnp.dot(aa, bb, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST) + beta * c


def gemm(a, b, c, alpha=1.0, beta=0.0, ta=False, tb=False, variant=0):
    """alpha*A@B + beta*C; variants 0..4 map to XLA + Pallas kernels
    (reference gemm..gemm4 A/B-comparison words, tenvm.cpp:585-589).
    A Pallas variant that cannot run NEVER falls back silently — the
    A/B words must benchmark what they claim — the failure is surfaced
    and the XLA result is returned only after the warning."""
    if variant >= 2:
        from .gemm_pallas import gemm_pallas
        try:
            return gemm_pallas(a, b, c, alpha, beta, ta, tb, variant)
        except Exception as e:                   # noqa: BLE001
            from ..system import System
            System.get_sys().pstr(
                f"\\ WARN gemm{variant} pallas kernel unavailable "
                f"({type(e).__name__}: {str(e).splitlines()[0][:80]}) "
                f"— result computed by XLA dot instead\n")
    return _gemm_xla(a, b, c, jnp.float32(alpha), jnp.float32(beta), ta, tb)


@jax.jit
def _transpose2d(a):
    return a.T


def transpose(a):
    return _transpose2d(a)


# ---------------------------------------------------------------------------
# reductions (reference tensor.cu:224-287; note the reference's std()
# computes sqrt(sum((x-mu)^2))/numel — kept verbatim for output parity)
# ---------------------------------------------------------------------------
@jax.jit
def _sum(x):
    return jnp.sum(x)


@jax.jit
def _nvar(x, mu):
    return jnp.sum((x - mu) ** 2)


@jax.jit
def _max(x):
    return jnp.max(x)


@jax.jit
def _min(x):
    return jnp.min(x)


@jax.jit
def _dot(a, b):
    return jnp.dot(a.reshape(-1), b.reshape(-1),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def t_sum(x) -> float:
    return float(_sum(x))


def t_avg(x) -> float:
    return float(_sum(x)) / x.size


def t_std(x) -> float:
    mu = t_avg(x)
    return float(np.sqrt(float(_nvar(x, mu)))) / x.size if x.size else 0.0


def t_norm(x) -> float:
    return float(np.sqrt(float(_nvar(x, 0.0))))


def t_max(x) -> float:
    return float(_max(x))


def t_min(x) -> float:
    return float(_min(x))


def t_dot(a, b) -> float:
    return float(_dot(a, b))


@jax.jit
def _has_nan(x):
    return jnp.sum(~jnp.isfinite(x))


def has_nan(x) -> int:
    return int(_has_nan(x))


# ---------------------------------------------------------------------------
# dispatch-order barrier: the interpreter issues async device work word by
# word; `clock` (and benchmarks) must observe completed device time, not
# queue time — track the most recent result and block on it.
# ---------------------------------------------------------------------------
_last_dispatch = None


def track(arr):
    global _last_dispatch
    _last_dispatch = arr
    return arr


_sync_hooks: list = []                      # weakrefs to hook owners


def add_sync_hook(owner):
    """register an object with a _sync() method (weakly referenced) —
    run at every engine barrier (e.g. the device arena's pool)"""
    import weakref
    _sync_hooks.append(weakref.ref(owner))


def sync():
    """barrier on the most recent dispatch.  block_until_ready resolves
    optimistically on the tunneled axon backend, so force REAL
    completion with a one-element readback — `clock`-bracketed script
    benchmarks must measure finished device work, like the reference's
    cudaDeviceSynchronize (one ~25 ms round-trip per `clock`, amortized
    over the timed region)."""
    global _last_dispatch
    if _last_dispatch is not None:
        try:
            # ONE round-trip: the scalar readback is itself the real
            # barrier.  A block_until_ready first costs a SECOND ~28 ms
            # tunnel RTT (r4 measurement: sync was 57-80 ms even with
            # the queue already drained).
            float(jnp.ravel(_last_dispatch)[0])
        except Exception:
            pass
        _last_dispatch = None
    dead = []
    for ref in _sync_hooks:
        owner = ref()
        if owner is None:
            dead.append(ref)
        else:
            owner._sync()
    for ref in dead:
        _sync_hooks.remove(ref)
