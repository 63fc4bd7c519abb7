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
              tp: int | None = None, ep: int | None = None) -> Mesh:
    """build a (dp, tp) mesh — or (dp, ep) when ep is given (expert
    parallelism: the model axis shards MoE experts instead of features)"""
    devs = jax.devices()
    n = n_devices or len(devs)
    ax2 = "ep" if ep is not None else "tp"
    m2 = ep if ep is not None else tp
    if dp is None and m2 is None:
        # favor data parallelism; give tp the largest power-of-2 <= sqrt(n)
        m2 = 1
        while m2 * 2 <= int(math.sqrt(n)) and n % (m2 * 2) == 0:
            m2 *= 2
        dp = n // m2
    elif dp is None:
        dp = n // m2
    elif m2 is None:
        m2 = n // dp
    assert dp * m2 == n, f"mesh {dp}x{m2} != {n} devices"
    grid = np.array(devs[:n]).reshape(dp, m2)
    return Mesh(grid, ("dp", ax2))


def mesh_from_spec(spec: str) -> Mesh | None:
    """'dp4' / 'dp4,tp2' / 'dp2,ep4' -> Mesh, or None when the spec is
    empty or asks for more devices than exist (the interactive word
    path degrades to single-device rather than erroring — a laptop run
    with a pod T4_MESH in the env should still work)."""
    spec = (spec or "").strip()
    if not spec:
        return None
    dp = tp = ep = None
    for part in spec.split(","):
        part = part.strip()
        if part.startswith("dp"):
            dp = int(part[2:])
        elif part.startswith("tp"):
            tp = int(part[2:])
        elif part.startswith("ep"):
            ep = int(part[2:])
    n = (dp or 1) * (tp or 1) * (ep or 1)
    if n <= 1 or n > len(jax.devices()):
        return None
    return make_mesh(n, dp=dp, tp=tp, ep=ep)


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
        if kind in (Layer.LINEAR, Layer.ATTN, Layer.PROJ):
            out.append((NamedSharding(mesh, P("tp", None)),
                        NamedSharding(mesh, P("tp", None))
                        if kind == Layer.ATTN
                        else NamedSharding(mesh, P("tp"))))
        elif kind in (Layer.CONV, Layer.DCONV):
            out.append((NamedSharding(mesh, P(None, None, None, "tp")),
                        NamedSharding(mesh, P("tp"))))
        elif kind in (Layer.BATCHNM, Layer.LNORM, Layer.EMBED):
            out.append((NamedSharding(mesh, P()), NamedSharding(mesh, P())))
        elif kind == Layer.MOE:
            out.append((NamedSharding(mesh, P("tp", None, None)),
                        NamedSharding(mesh, P("tp", None, None))))
        else:
            out.append(())
    return tuple(out)


def _param_spec(kind: int, arr_ndim: int, which: str) -> P:
    """weight shardings: linear W[E0,E1] row-sharded over 'tp' (output
    features), conv filters [C1,K,K,C0] sharded on C0; biases sharded on
    their only axis; batchnorm gamma/beta replicated (tiny)."""
    if kind in (Layer.LINEAR, Layer.PROJ):
        return P("tp", None) if which == "w" else P("tp")
    if kind in (Layer.CONV, Layer.DCONV):
        return (P(None, None, None, "tp") if which == "w" else P("tp"))
    return P()


def shard_params(mesh: Mesh, program) -> tuple:
    """per-layer NamedShardings matching funcs.py param tuples.
    On a (dp, tp) mesh features shard over 'tp'; on a (dp, ep) mesh only
    MoE expert axes shard (over 'ep') and dense layers replicate."""
    has_tp = "tp" in mesh.axis_names
    model_ax = "tp" if has_tp else "ep"
    out = []
    for kind, _opts, _shape in program:
        if kind in (Layer.CONV, Layer.DCONV, Layer.LINEAR, Layer.PROJ):
            if has_tp:
                out.append((NamedSharding(mesh, _param_spec(kind, 2, "w")),
                            NamedSharding(mesh, _param_spec(kind, 1, "b"))))
            else:
                out.append((NamedSharding(mesh, P()),
                            NamedSharding(mesh, P())))
        elif kind == Layer.EMBED:
            # vocab tables replicate (small at this tier; row-sharding a
            # gather costs an all-gather per lookup)
            out.append((NamedSharding(mesh, P()), NamedSharding(mesh, P())))
        elif kind == Layer.ATTN:
            # wqkv [3E, E] row-sharded (heads split over 'tp'),
            # wo [E, E] column-sharded (contracts the head outputs)
            if has_tp:
                out.append((NamedSharding(mesh, P("tp", None)),
                            NamedSharding(mesh, P(None, "tp"))))
            else:
                out.append((NamedSharding(mesh, P()),
                            NamedSharding(mesh, P())))
        elif kind == Layer.MOE:
            # w1aug [E, D, F+1] / w2 [E, F, D]: experts over the model
            # axis — expert parallelism (each device holds E/ep experts)
            out.append((NamedSharding(mesh, P(model_ax, None, None)),
                        NamedSharding(mesh, P(model_ax, None, None))))
        elif kind in (Layer.BATCHNM, Layer.LNORM):
            out.append((NamedSharding(mesh, P()), NamedSharding(mesh, P())))
        else:
            out.append(())
    return tuple(out)
