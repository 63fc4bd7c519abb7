"""Device mesh & sharding helpers.

The reference is single-process/single-GPU with a dormant multi-VM
scaffold (SURVEY.md §2.7: T4_VM_COUNT pool, DO_MULTITASK send/recv words
compiled out).  The TPU-native realization of that scaling seam is SPMD
over a ``jax.sharding.Mesh``: data parallelism shards the batch axis
('dp'), tensor parallelism shards linear/conv output features ('tp'),
and XLA inserts the psum/all-gather collectives over ICI.
"""
from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nn.ntypes import Layer


def make_mesh(n_devices: int | None = None, dp: int | None = None,
              tp: int | None = None) -> Mesh:
    """build a (dp, tp) mesh over available devices"""
    devs = jax.devices()
    n = n_devices or len(devs)
    if dp is None and tp is None:
        # favor data parallelism; give tp the largest power-of-2 <= sqrt(n)
        tp = 1
        while tp * 2 <= int(math.sqrt(n)) and n % (tp * 2) == 0:
            tp *= 2
        dp = n // tp
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    assert dp * tp == n, f"mesh {dp}x{tp} != {n} devices"
    grid = np.array(devs[:n]).reshape(dp, tp)
    return Mesh(grid, ("dp", "tp"))


def shard_batch(mesh: Mesh) -> NamedSharding:
    """activations: batch axis over 'dp', features replicated"""
    return NamedSharding(mesh, P("dp"))


def make_mesh3(n_devices: int | None = None, dp: int = 2, sp: int = 2,
               tp: int = 2) -> Mesh:
    """3-axis mesh for sequence models: data / sequence / tensor parallel"""
    devs = jax.devices()
    n = n_devices or len(devs)
    assert dp * sp * tp == n, f"mesh {dp}x{sp}x{tp} != {n} devices"
    grid = np.array(devs[:n]).reshape(dp, sp, tp)
    return Mesh(grid, ("dp", "sp", "tp"))


def shard_seq_batch(mesh: Mesh) -> NamedSharding:
    """sequence activations [N, S, E, 1]: batch over 'dp', seq over 'sp'
    (attention contracts over S — XLA inserts the all-gather/psum over
    the 'sp' ring, the ICI-resident analog of ring attention)"""
    return NamedSharding(mesh, P("dp", "sp"))


def shard_params_seq(mesh: Mesh, program) -> tuple:
    """attention/linear weights row-sharded over 'tp', rest replicated"""
    out = []
    for kind, _opts, _shape in program:
        if kind in (Layer.LINEAR, Layer.ATTN):
            out.append((NamedSharding(mesh, P("tp", None)),
                        NamedSharding(mesh, P("tp", None))
                        if kind == Layer.ATTN
                        else NamedSharding(mesh, P("tp"))))
        elif kind in (Layer.CONV, Layer.DCONV):
            out.append((NamedSharding(mesh, P(None, None, None, "tp")),
                        NamedSharding(mesh, P("tp"))))
        elif kind == Layer.BATCHNM:
            out.append((NamedSharding(mesh, P()), NamedSharding(mesh, P())))
        else:
            out.append(())
    return tuple(out)


def _param_spec(kind: int, arr_ndim: int, which: str) -> P:
    """weight shardings: linear W[E0,E1] row-sharded over 'tp' (output
    features), conv filters [C1,K,K,C0] sharded on C0; biases sharded on
    their only axis; batchnorm gamma/beta replicated (tiny)."""
    if kind == Layer.LINEAR:
        return P("tp", None) if which == "w" else P("tp")
    if kind in (Layer.CONV, Layer.DCONV):
        return (P(None, None, None, "tp") if which == "w" else P("tp"))
    return P()


def shard_params(mesh: Mesh, program) -> tuple:
    """per-layer NamedShardings matching funcs.py param tuples"""
    out = []
    for kind, _opts, _shape in program:
        if kind in (Layer.CONV, Layer.DCONV, Layer.LINEAR):
            out.append((NamedSharding(mesh, _param_spec(kind, 2, "w")),
                        NamedSharding(mesh, _param_spec(kind, 1, "b"))))
        elif kind == Layer.ATTN:
            # wqkv [3E, E] row-sharded (heads split over 'tp'),
            # wo [E, E] column-sharded (contracts the head outputs)
            out.append((NamedSharding(mesh, P("tp", None)),
                        NamedSharding(mesh, P(None, "tp"))))
        elif kind == Layer.BATCHNM:
            out.append((NamedSharding(mesh, P()), NamedSharding(mesh, P())))
        else:
            out.append(())
    return tuple(out)
