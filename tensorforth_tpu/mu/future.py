"""Deferred device scalars ("futures") — ROADMAP item 2.

A Future is a tagged stack object (same NaN-boxed handle scheme as
tensors, du.py) wrapping a 0-d device value that has been *dispatched*
but not *read back*.  Producing words (``loss.ce``, ``nn.hit``) push a
Future instead of blocking on the ~25 ms tunnel round-trip; scalar
arithmetic on futures stays on device (still asynchronous); the value
materializes only when the host genuinely needs it — printing (``.``),
comparisons, control flow, int conversion.

This pipelines the reference's canonical training loop
(examples/t4_30e.4th `for forward loss.ce lox ! nn.hit hit +! backprop
nn.adam next`): the per-batch device->host syncs disappear and one
readback per epoch remains (the `stat` print).

The reference has no analog — its kernels and host share one address
space, so `loss.ce` (src/vm/netvm.cpp) is a synchronous device read.
On a remote/tunneled accelerator the deferred design is what makes the
word-at-a-time interface usable at speed.
"""
from __future__ import annotations

import math

import numpy as np

# err-bit NaN sentinel (nn/model.py wires this to Model._nan_alarm):
# called whenever a non-finite scalar materializes on the host, so a
# NaN produced inside a trace chunk surfaces as the reference's err
# STOP at the faulting batch instead of propagating silently
NAN_HOOK = None


class LazyIdx:
    """deferred element `vec[i]` of a device vector — the chunked word
    cycle (funcs.get_fused_chunk_ds) returns per-batch loss/hit scalars
    as K-vectors; serving each batch as a LazyIdx costs ZERO device
    dispatches (no per-batch gather on the tunnel).  Resolution happens
    inside Future.dev(): a lazy SUM of LazyIdx addends over the same
    vector collapses into one `take(...).sum()` dispatch (or `vec.sum()`
    when the indices cover the whole vector)."""
    __slots__ = ("vec", "i")

    def __init__(self, vec, i: int):
        self.vec = vec
        self.i = int(i)


def _collapse_lazy(host: float, devs: list, lazies: list):
    """one device expression for (host + sum(devs) + sum(vec[i]...))"""
    import jax.numpy as jnp
    groups: dict = {}
    for a in lazies:
        groups.setdefault(id(a.vec), (a.vec, []))[1].append(a.i)
    for vec, idxs in groups.values():
        if len(idxs) == int(vec.shape[0]) and sorted(idxs) == list(
                range(int(vec.shape[0]))):
            devs.append(jnp.sum(vec))
        elif len(idxs) == 1:
            devs.append(vec[idxs[0]])
        else:
            devs.append(jnp.sum(jnp.take(vec, jnp.asarray(idxs))))
    if devs:
        d = devs[0] if len(devs) == 1 else jnp.sum(jnp.stack(devs))
        return d + np.float32(host) if host else d
    return np.float32(host)


class Future:
    """0-d device scalar pending host materialization.

    When ``pending`` is set (a list of addends, each a jax 0-d array or
    a host number) the future is a LAZY SUM: ``+!`` accumulation (the
    per-batch `nn.hit hit +!` counter) costs ZERO device dispatches per
    batch — the whole chain collapses into one stacked device sum on
    first real use (typically the end-of-epoch `hit @ .`)."""
    __slots__ = ("data", "oid", "pending")

    def __init__(self, data, pending=None):
        self.data = data          # jax 0-d array, np scalar, or python num
        self.pending = pending    # lazy-sum addend list (data is None)
        self.oid = 0

    # --- T4Base duck-type -------------------------------------------------
    @property
    def numel(self) -> int:
        return 1

    def is_tensor(self) -> bool:
        return False

    def is_model(self) -> bool:
        return False

    def is_dataset(self) -> bool:
        return False

    def is_future(self) -> bool:
        return True

    # --- resolution ---------------------------------------------------------
    def dev(self):
        """device-side value: collapses a lazy sum (one stacked device
        reduction for ALL accumulated addends) without reading back"""
        if self.pending is not None:
            host = 0.0
            devs, lazies = [], []
            for a in self.pending:
                if isinstance(a, (int, float, np.floating, np.integer)):
                    host += float(a)
                elif isinstance(a, LazyIdx):
                    lazies.append(a)
                else:
                    devs.append(a)
            self.data = _collapse_lazy(host, devs, lazies)
            self.pending = None
        elif isinstance(self.data, LazyIdx):
            self.data = self.data.vec[self.data.i]
        return self.data

    def value(self) -> float:
        """synchronize: device -> host float32"""
        v = float(np.float32(float(self.dev())))
        if not math.isfinite(v) and NAN_HOOK is not None:
            NAN_HOOK()
        return v

    def __repr__(self):
        return f"Future(oid={self.oid})"
