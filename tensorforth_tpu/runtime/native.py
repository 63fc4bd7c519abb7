"""Native runtime bindings (csrc/ -> ctypes).

t4core: the inner interpreter runs compiled words at native speed;
        primitive opcodes + the scalar word set execute in C++, object/
        IO words trampoline back into Python (reference analog: the
        host-mode eForth VM, src/vm/eforth.cpp nest()).
t4alloc: TLSF arena accounting + status (reference src/mu/tlsf.cpp).

Both libraries are built on demand with csrc/Makefile; everything
degrades gracefully to the pure-Python paths when a compiler is
unavailable (set T4_NO_NATIVE=1 to force the fallback).
"""
from __future__ import annotations

import ctypes as C
import os
import subprocess

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_BUILD = os.path.join(_ROOT, "build")

# native word ids — must match csrc/t4core.cpp enum order
_NAMES = [
    "nop", "dup", "drop", "over", "swap", "rot", "-rot", "pick", "nip",
    "?dup", "2dup", "2drop", "2over", "2swap",
    "+", "-", "*", "/", "mod", "fmod", "/mod", "*/",
    "*/mod", "and", "or", "xor", "abs", "negate", "invert", "rshift",
    "lshift", "max", "min", "2*", "2/", "1+", "1-",
    "f>s", "round", "ceil", "floor",
    "0=", "0<", "0>", "=", ">", "<", "<>", ">=", "<=", "u<", "u>",
    ">r", "r>", "r@", "i", "exit", "bl", "depth",
]
NATIVE_WORDS = {nm: i for i, nm in enumerate(_NAMES)}


class T4VMStruct(C.Structure):
    _fields_ = [
        ("pmem", C.POINTER(C.c_uint8)),
        ("ss", C.POINTER(C.c_float)),
        ("rs", C.POINTER(C.c_float)),
        ("ss_idx", C.c_int32),
        ("rs_idx", C.c_int32),
        ("ip", C.c_int32),
        ("tos", C.c_float),
        ("state", C.c_int32),
        ("ss_sz", C.c_int32),
        ("rs_sz", C.c_int32),
        ("dropped", C.c_uint32 * 256),
        ("n_dropped", C.c_int32),
    ]


_CB = C.CFUNCTYPE(None, C.c_int32)


def _build_and_load(name: str):
    so = os.path.join(_BUILD, f"lib{name}.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", os.path.join(_ROOT, "csrc"),
                            f"{os.path.relpath(_BUILD, os.path.join(_ROOT, 'csrc'))}/lib{name}.so"],
                           check=True, capture_output=True)
        except Exception:
            return None
    try:
        return C.CDLL(so)
    except OSError:
        return None


_core = None
_alloc = None
_tb = None


def get_tb():
    global _tb
    if _tb is None and not os.environ.get("T4_NO_NATIVE"):
        lib = _build_and_load("t4tb")
        if lib is not None:
            lib.t4_crc32c.restype = C.c_uint32
            lib.t4_crc32c.argtypes = [C.c_char_p, C.c_uint64, C.c_uint32]
            lib.t4_masked_crc32c.restype = C.c_uint32
            lib.t4_masked_crc32c.argtypes = [C.c_char_p, C.c_uint64]
            lib.t4_tfrecord_frame.restype = C.c_uint64
            lib.t4_tfrecord_frame.argtypes = [C.c_char_p, C.c_uint64,
                                              C.c_char_p]
            _tb = lib
    return _tb


def get_core():
    global _core
    if _core is None and not os.environ.get("T4_NO_NATIVE"):
        lib = _build_and_load("t4core")
        if lib is not None:
            lib.t4_nest.restype = C.c_int32
            lib.t4_nest.argtypes = [C.POINTER(T4VMStruct),
                                    C.POINTER(C.c_int16), C.c_int32, _CB]
            _core = lib
    return _core


def get_alloc():
    global _alloc
    if _alloc is None and not os.environ.get("T4_NO_NATIVE"):
        lib = _build_and_load("t4alloc")
        if lib is not None:
            lib.t4_tlsf_init.argtypes = [C.c_uint64]
            lib.t4_tlsf_malloc.restype = C.c_uint64
            lib.t4_tlsf_malloc.argtypes = [C.c_uint64]
            lib.t4_tlsf_free.argtypes = [C.c_uint64]
            lib.t4_tlsf_free.restype = C.c_int32
            lib.t4_tlsf_status.argtypes = [C.POINTER(C.c_uint64)]
            lib.t4_tlsf_check.restype = C.c_int32
            _alloc = lib
    return _alloc


class NativeEngine:
    """drives t4_nest() over a Python VM's shared buffers"""

    def __init__(self, vm):
        self.vm = vm
        self.lib = get_core()
        self.st = T4VMStruct()
        self.st.pmem = vm.pmem.buf.ctypes.data_as(C.POINTER(C.c_uint8))
        self.st.ss = vm.ss.buf.ctypes.data_as(C.POINTER(C.c_float))
        self.st.rs = vm.rs.buf.ctypes.data_as(C.POINTER(C.c_float))
        self.st.ss_sz = vm.ss.buf.size
        self.st.rs_sz = vm.rs.buf.size
        self._table = None
        self._table_len = 0
        self._cb = _CB(self._callback)

    # --- dictionary dispatch table --------------------------------------
    def _ensure_table(self):
        d = self.vm.dict
        if self._table is not None and self._table_len == len(d):
            return
        t = np.full(len(d), -1, dtype=np.int16)
        native = getattr(d, "native", {})
        for idx, nid in native.items():
            t[idx] = nid
        self._table_np = t
        self._table = t.ctypes.data_as(C.POINTER(C.c_int16))
        self._table_len = len(d)

    # --- state marshalling ------------------------------------------------
    def _to_vm(self):
        vm = self.vm
        vm.ss.idx = self.st.ss_idx
        vm.rs.idx = self.st.rs_idx
        vm.ip = self.st.ip
        vm.tos = np.float32(self.st.tos)
        vm.state = self.st.state
        self._drain_dropped()

    def _from_vm(self):
        vm = self.vm
        self.st.ss_idx = vm.ss.idx
        self.st.rs_idx = vm.rs.idx
        self.st.ip = vm.ip
        self.st.tos = float(vm.tos)
        self.st.state = vm.state

    def _drain_dropped(self):
        from ..du import u2f
        n = self.st.n_dropped
        if n:
            mmu = self.vm.mmu
            for i in range(n):
                mmu.mark_free(u2f(self.st.dropped[i]))
            self.st.n_dropped = 0

    # --- python trampoline ---------------------------------------------------
    def _callback(self, widx: int):
        from ..vm.pmem import IU_SZ
        vm = self.vm
        self._to_vm()
        try:
            if widx >= 0:
                vm.dict[widx].fn(vm)
            elif widx == -1:                     # dataset-aware NEXT
                p = vm.pmem.rd_param(vm.ip)
                vm.ip += IU_SZ
                vm._ds_next(p.ioff)
            elif widx == -2:                     # DOTQ
                p = vm.pmem.rd_param(vm.ip)
                vm.ip += IU_SZ
                vm.sys.pstr(vm.pmem.rd_str(vm.ip))
                vm.ip += p.ioff
            elif widx == -3:                     # KEY
                vm.ip += IU_SZ
                vm.PUSH(np.float32(ord(vm.sys.key())))
            elif widx == -4:                     # ZBRAN on an object flag
                from ..du import ZEQ
                p = vm.pmem.rd_param(vm.ip)
                vm.ip += IU_SZ
                if ZEQ(vm.fpop()):               # resolves deferred scalars
                    vm.ip = p.ioff
        except Exception as ex:                  # surface, don't crash C
            vm.sys.perr("", f"native-cb error: {ex} ")
            from ..vm.vm import VMState
            vm.state = VMState.STOP
        self._from_vm()

    # --- entry ------------------------------------------------------------------
    def nest(self):
        from ..vm.vm import VMState
        self._ensure_table()
        self.vm.state = VMState.NEST
        self._from_vm()
        self.lib.t4_nest(C.byref(self.st), self._table,
                         self._table_len, self._cb)
        self._to_vm()
