"""MMU — memory/object controller.

Owns: the dictionary, parameter memory, the object table (tagged-DU
handle -> Tensor/Model/Dataset), deferred-free (mark/sweep) list, and
arena accounting.

Reference: src/mu/mmu.{h,cu}.  Where the reference sub-allocates a 2 GB
CUDA managed arena with a TLSF allocator, device memory here is owned by
the XLA runtime (HBM BFC arena) — the MMU keeps the same object-handle
scheme and byte accounting (``mstat``) on top of it, and the optional
native TLSF (csrc/) tracks arena occupancy for parity.
"""
from __future__ import annotations

import numpy as np

from ..config import Config
from ..du import IS_OBJ, IS_VIEW, mk_obj, obj_id
from ..vm.pmem import PMem
from ..vm.dict import Dictionary
from .tensor import Tensor, T4Type


class MMU:
    _inst = None

    def __init__(self):
        self.pmem = PMem()
        self.dict = Dictionary(self.pmem)
        self._objs: dict[int, object] = {}
        self._next_id = 1
        self._marked: list[int] = []
        self._alloc_bytes = 0
        self._peak_bytes = 0
        self._num_alloc = 0
        # native TLSF arena accounting (csrc/t4alloc; reference mu/tlsf)
        from ..runtime.native import get_alloc
        self._tlsf = get_alloc()
        if self._tlsf is not None:
            self._tlsf.t4_tlsf_init(Config.OSTORE_SZ)
        self._offs: dict[int, int] = {}       # oid -> arena offset

    @classmethod
    def get_mmu(cls) -> "MMU":
        if cls._inst is None:
            cls._inst = MMU()
        return cls._inst

    @classmethod
    def free_mmu(cls):
        cls._inst = None

    # --- handle scheme ------------------------------------------------------
    def register(self, obj) -> object:
        oid = self._next_id
        self._next_id += 1
        obj.oid = oid
        self._objs[oid] = obj
        self._num_alloc += 1
        if hasattr(obj, "numel"):
            nbytes = obj.numel * 4
            self._alloc_bytes += nbytes
            self._peak_bytes = max(self._peak_bytes, self._alloc_bytes)
            if self._tlsf is not None and not obj.is_model() \
                    and not obj.is_future():
                off = self._tlsf.t4_tlsf_malloc(max(nbytes, 4))
                if off != (1 << 64) - 1:
                    self._offs[oid] = off
        return obj

    def du2obj(self, v):
        return self._objs.get(obj_id(v))

    def obj2du(self, obj) -> np.float32:
        return mk_obj(obj.oid)

    # --- factories -----------------------------------------------------------
    def tensor(self, *dims) -> Tensor:
        # payload materializes lazily: factory-then-overwrite patterns
        # (matmul results, literal capture) never allocate the zeros
        t = Tensor(*dims)
        self.register(t)
        return t

    def model(self, trace: int = 0):
        from ..nn.model import Model
        m = Model(self, trace)
        self.register(m)
        return m

    def dataset(self, batch_sz: int):
        from .dataset import Dataset
        d = Dataset(batch_sz)
        self.register(d)
        return d

    def future(self, data):
        """deferred device scalar (mu/future.py) — resolves on host use"""
        from .future import Future
        f = Future(data)
        self.register(f)
        return f

    def copy(self, src: Tensor) -> Tensor:
        """deep copy of payload + shape (not grads)"""
        t = Tensor(*src.shape)
        t.data = src.ensure_data()            # jax arrays are immutable: alias is safe
        t.stride = list(src.stride)
        t.xparm = src.xparm
        t.iparm = src.iparm
        self.register(t)
        return t

    def slice(self, t0: Tensor, x0: int, x1: int, y0: int, y1: int) -> Tensor:
        t1 = Tensor(y1 - y0, x1 - x0)
        t1.data = t0.ensure_data()[y0:y1, x0:x1]
        self.register(t1)
        return t1

    # --- free / sweep ----------------------------------------------------------
    def free_obj(self, obj):
        if obj is None or obj.oid not in self._objs:
            return
        if hasattr(obj, "numel"):
            self._alloc_bytes -= obj.numel * 4
        off = self._offs.pop(obj.oid, None)
        if off is not None and self._tlsf is not None:
            self._tlsf.t4_tlsf_free(off)
        del self._objs[obj.oid]
        # free grad/momentum chains (reference mmu.cu:247-265)
        if isinstance(obj, Tensor):
            for g in list(obj.grad) + list(obj.mtum):
                if isinstance(g, Tensor) and g is not obj \
                        and g.oid in self._objs:
                    self.free_obj(g)
            obj.data = None
        elif getattr(obj, "is_model", lambda: False)():
            # free all layer tensors + onehot/loss (reference mmu free(Model&))
            for t in list(getattr(obj, "data", [])):
                if isinstance(t, Tensor) and t.oid in self._objs:
                    self.free_obj(t)
            for t in (getattr(obj, "_hot", None), getattr(obj, "_loss", None)):
                if isinstance(t, Tensor) and t.oid in self._objs:
                    self.free_obj(t)
            obj.data = []

    def mark_free(self, v):
        """deferred free — swept per REPL cycle (reference mmu.cu:169-196)"""
        if IS_OBJ(v) and not IS_VIEW(v):
            self._marked.append(obj_id(v))

    def sweep(self):
        for oid in self._marked:
            self.free_obj(self._objs.get(oid))
        self._marked.clear()

    def rd(self, i: int):
        return self.pmem.rd_du(i)

    # --- stats (mstat) -------------------------------------------------------------
    def status(self, hdr: bool = False):
        from ..system import System
        sys = System.get_sys()
        if hdr:
            sys.pstr(
                f"\\ MMU.stat dict[{len(self.dict)}/{Config.DICT_SZ}], "
                f"pmem[{self.pmem.here}]={100.0 * self.pmem.here / self.pmem.size:0.1f}%, "
                f"tfree[{len(self._marked)}/{Config.TFREE_SZ}]\n")
        live = len(self._objs)
        sys.pstr(f"\\   Mpool obj#used[{live}] id#next[{self._next_id}]\n")
        if self._tlsf is not None:
            import ctypes
            st = (ctypes.c_uint64 * 5)()
            self._tlsf.t4_tlsf_status(st)
            sys.pstr(
                f"\\   Ostore(TLSF) arena[{st[0]}] used[{st[1]}] "
                f"peak[{st[2]}] alloc#[{st[3]}] free#[{st[4]}]\n")
        else:
            sys.pstr(
                f"\\   Ostore used[{self._alloc_bytes}] "
                f"peak[{self._peak_bytes}] alloc#[{self._num_alloc}]\n")

    def clear(self, i: int):
        self.dict.clear(i)
