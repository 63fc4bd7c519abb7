"""Tensor — rank-1/2/4 row-major NHWC F32 tensor object backed by a JAX
device array.

Reference behavior: src/mu/tensor.{h,cu} + src/t4base.h.  The header
(shape/rank/grad slots/stride/params) lives on host; the payload is an
immutable ``jax.Array`` on TPU — "destructive" reference semantics are
realized by swapping the payload in place, so stack views (which alias
the same Tensor object) observe mutations exactly like the reference's
shared-pointer views.
"""
from __future__ import annotations

import numpy as np

from ..config import Config


class T4Type:
    TENSOR, MODEL, DATASET, XXX = range(4)


class Tensor:
    """host header + device payload"""

    def __init__(self, *dims, oid: int = 0):
        dims = tuple(int(d) for d in dims)
        if len(dims) not in (1, 2, 4):
            raise ValueError(f"rank {len(dims)} not supported")
        self.oid = oid
        self.ttype = T4Type.TENSOR
        self.rank = len(dims)
        self.shape = dims
        self.data = None                   # jax.Array, logical shape
        # layer-tensor extensions (reference tensor.h:53-57)
        self.grad_fn = None                # t4_layer tag when part of a model
        self.grad = [None] * 5             # w, b, dw, db, extra(mask/xhat)
        self.mtum = [None] * 5             # momentum/velocity (+tmp)
        self.stride = [1, 1, 1, 1]         # conv stride/padding storage
        self.xparm = 0.0
        self.iparm = 0
        self.train = 1
        self.err = 0
        self._host = None                  # host mirror (valid when set)
        self._shape_cache = None           # (payload, shape, view) memo
        self.aoff = None                   # HBM-arena word offset (T4_ARENA)
        self._ainit = True                 # arena slot holds defined data

    # --- dimensional accessors (reference NHWC) ---------------------------
    @property
    def numel(self) -> int:
        n = 1
        for d in self.shape:
            n *= d
        return n

    def N(self) -> int:
        return self.shape[0] if self.rank == 4 else 1

    def H(self) -> int:
        if self.rank == 4:
            return self.shape[1]
        if self.rank == 2:
            return self.shape[0]
        return 1

    def W(self) -> int:
        if self.rank == 4:
            return self.shape[2]
        if self.rank == 2:
            return self.shape[1]
        return self.numel

    def C(self) -> int:
        return self.shape[3] if self.rank == 4 else 1

    def HWC(self) -> int:
        return self.numel // self.N()

    def is_tensor(self) -> bool:
        return self.ttype == T4Type.TENSOR

    def is_model(self) -> bool:
        return self.ttype == T4Type.MODEL

    def is_dataset(self) -> bool:
        return self.ttype == T4Type.DATASET

    def is_future(self) -> bool:
        return False

    def is_same_shape(self, other: "Tensor") -> bool:
        return self.shape == other.shape

    # --- payload management ------------------------------------------------
    def _arena(self):
        if self.aoff is None:
            return None
        from .mmu import MMU
        return MMU.get_mmu().arena

    def ensure_data(self):
        if self.data is None:
            ar = self._arena()
            if ar is not None:             # payload lives in the HBM pool
                if not self._ainit:        # lazy zero of a fresh slot
                    ar.fill(self.aoff, 0.0, self.numel)
                    self._ainit = True
                return ar.read(self.aoff, self.shape)
            import jax.numpy as jnp
            self.data = jnp.zeros(self.shape, dtype=jnp.float32)
        return self.data

    def data_as(self, *shape):
        """ensure_data() reshaped, memoized per payload object — the
        word-path hot loop reads weights as 2-D views every batch and a
        fresh `reshape` is a device dispatch each time (the r2 42.8 vs
        31.9 ms/batch gap was mostly these); the cache is keyed by the
        payload's identity so any replace_data invalidates it naturally"""
        d = self.ensure_data()
        if tuple(d.shape) == shape:
            return d
        c = self._shape_cache
        if c is not None and c[0] is d and c[1] == shape:
            return c[2]
        r = d.reshape(shape)
        self._shape_cache = (d, shape, r)
        return r

    def replace_data(self, arr):
        """destructive update — views alias this object and see the change"""
        orig = arr
        if tuple(arr.shape) != self.shape:
            arr = arr.reshape(self.shape)
        ar = self._arena()
        if ar is not None:                 # in-place into the device pool
            ar.write(self.aoff, arr)
            self.data = None
            self._host = None
            self._ainit = True
            self._shape_cache = None
            return self
        self.data = arr
        self._host = None                  # device is now authoritative
        # remember the caller's shaped view so the next data_as() on the
        # round-trip shape costs nothing (optimizer/backward cycles)
        self._shape_cache = ((arr, tuple(orig.shape), orig)
                             if orig is not arr else None)
        from ..ops.engine import track
        track(arr)
        return self

    def numpy(self) -> np.ndarray:
        """host copy; mirrors host-staged payloads to avoid device
        round-trips for prints of literal-built tensors"""
        if getattr(self, "_host", None) is not None:
            return self._host
        a = np.asarray(self.ensure_data(), dtype=np.float32)
        self._host = a
        return a

    def set_numpy(self, a: np.ndarray):
        import jax.numpy as jnp
        a = np.asarray(a, dtype=np.float32)
        ar = self._arena()
        if ar is not None:
            # validate size BEFORE touching the pool: an oversized load
            # must raise, not overwrite neighbouring tensors' slots
            a = a.reshape(self.shape)
            ar.write(self.aoff, a)
            self.data = None
            self._ainit = True
        else:
            self.data = jnp.asarray(a, dtype=jnp.float32).reshape(self.shape)
        self._host = a.reshape(self.shape)
        self._shape_cache = None
        return self

    # --- reshape (header-only, payload reshaped lazily) ---------------------
    def reshape(self, *dims) -> "Tensor":
        dims = tuple(int(d) for d in dims)
        n = 1
        for d in dims:
            n *= d
        if n != self.numel:
            raise ValueError(f"reshape {self.shape} -> {dims} numel mismatch")
        if self.data is not None:
            self.data = self.data.reshape(dims)
        if getattr(self, "_host", None) is not None:
            self._host = self._host.reshape(dims)
        self.shape = dims
        self.rank = len(dims)
        return self

    def __repr__(self):
        t = "TND?"[self.ttype]
        return f"<{t}{self.rank}{list(self.shape)} oid={self.oid}>"
