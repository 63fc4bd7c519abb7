"""Dataset — Tensor subclass with corpus bookkeeping.

Reference: src/mu/dataset.{h,cu}.  Batch data is normalized
(x - mean) * 1/scale from U8 corpus bytes and placed on device; labels
stay on host (U32) for onehot/hit.  Dimensions are discovered on the
first fetch (reference dataset.cu:64-121).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

from .tensor import Tensor, T4Type


@lru_cache(maxsize=32)
def _fetch_prog(batch: int, mean: float, scale: float, out_shape: tuple):
    """ONE device program per (batch, normalize, shape) signature:
    slice the device-resident U8 corpus, normalize, and slice the
    labels — the word-path epoch loop previously issued ~5 EAGER
    device ops per fetch (each a tunnel RPC), which dominated the
    27-31 ms/batch word-epoch cost (r3 fusion measurements)"""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(buf, labels, pos):
        d = jax.lax.dynamic_slice_in_dim(buf, pos, batch, 0)
        x = ((d.astype(jnp.float32) - mean) * scale).reshape(out_shape)
        lab = jax.lax.dynamic_slice_in_dim(labels, pos, batch, 0)
        return x, lab

    return f


class Dataset(Tensor):
    def __init__(self, batch_sz: int):
        super().__init__(batch_sz, 1, 1, 1)
        self.ttype = T4Type.DATASET
        self.batch_sz = batch_sz
        self.batch_id = -1
        self.dataset_size = 0
        self.done = False
        self.label = np.zeros(batch_sz, dtype=np.uint32)
        self.label_dev = None              # device-resident labels (set
        #                                    by the fused fetch program)
        self._mean = 0.0
        self._scale = 1.0 / 256.0
        self._corpus = None
        self._fetch_spec = None            # deferred (corpus, pos) batch

    def normalize(self, mean: float, scale: float):
        self._mean = float(mean)
        self._scale = 1.0 / float(scale) if abs(scale) > 1e-12 else 1.0

    def fetch(self, ds_name: str | None = None, rewind: int = 0,
              trace: int = 0) -> "Dataset":
        from ..io.loader import Loader
        if ds_name is not None and self._corpus is None:
            cp = Loader.get(self, ds_name)
            if cp is None:
                from ..system import System
                System.get_sys().perr("", f"dataset {ds_name}? ")
                return self
            self._corpus = cp
            cp.init()
            cp.rewind()        # a NEW binding starts at record 0 — the
            #                    registry corpus is process-shared and
            #                    may sit at another dataset's EOF
            #                    (reference: each dataset loads its own
            #                    corpus from the top, ld/loader.cpp)
            self.shape = (self.batch_sz, cp.H, cp.W, cp.C)   # re-dimension
            self.rank = 4
            self.data = None
            self._shape_cache = None
            self.dataset_size = cp.size
            self.batch_id = -1
            from .mmu import MMU
            MMU.get_mmu().rebind(self)       # arena slot at the real size
        cp = self._corpus
        if cp is None:
            return self
        if rewind:
            cp.rewind()
            self.batch_id = -1
            self.done = False
        dev_live = (getattr(cp, "_dev_cache", None) is not None
                    and cp._dev_cache is not False)
        data, label = cp.fetch(self.batch_sz, meta_only=dev_live)
        self.done = cp.eof
        if label is not None:
            self._load(data, label)
            self.batch_id += 1
        return self

    def rewind(self, trace: int = 0):
        return self.fetch(None, rewind=1, trace=trace)

    def ensure_data(self):
        """materialize a deferred batch (unfused consumers: eval-only
        forwards, printing, host readbacks).  A set _fetch_spec is
        ALWAYS newer than .data (_load clears it before serving), so it
        wins — e.g. after a trace-chunk rollback re-materialized the
        previous batch while the next batch's spec was already staged"""
        if self._fetch_spec is not None and self._corpus is not None \
                and getattr(self._corpus, "_dev_cache", None) is not None \
                and self._corpus._dev_cache is not False:
            cp = self._corpus
            fp = _fetch_prog(self.batch_sz, float(self._mean),
                             float(self._scale), tuple(self.shape))
            x, lab = fp(cp._dev_cache, cp._dev_labels, self._fetch_spec)
            self._fetch_spec = None
            self.replace_data(x)
            self.label_dev = lab
        return super().ensure_data()

    def _load(self, data: np.ndarray | None, label: np.ndarray):
        """stage batch on device: normalize (x-mean)*1/scale runs as a
        jitted device op over a device-resident U8 corpus cache, so the
        per-batch H2D transfer happens once per corpus, not per epoch.
        data is None when Corpus.fetch served a meta-only full batch
        (device cache live — no host bytes were materialized at all)"""
        import jax
        import jax.numpy as jnp
        self._fetch_spec = None            # drop any unconsumed defer
        n = self.batch_sz if data is None else data.shape[0]
        cp = self._corpus
        if getattr(cp, "_dev_cache", None) is None and hasattr(cp, "_read"):
            try:                                   # whole-corpus upload
                full, full_lbl = cp._read(0, cp.size)
                cp._dev_cache = jax.device_put(
                    jnp.asarray(full, dtype=jnp.uint8))
                cp._dev_labels = jax.device_put(
                    jnp.asarray(full_lbl, dtype=jnp.int32))
                cp._lbl_cache = np.asarray(full_lbl)   # meta-only fetches
            except Exception:
                cp._dev_cache = False
        if getattr(cp, "_dev_cache", None) is not None and \
                cp._dev_cache is not False and n == self.batch_sz:
            pos = self._pos_of_batch()
            if self._arena() is None:
                # DEFER the device slice: record only the corpus offset.
                # The fetch-folded fused cycle (funcs.get_fused_cycle_ds)
                # slices + normalizes inside the one training program —
                # zero separate fetch dispatch; any other consumer
                # materializes lazily via ensure_data()
                self._fetch_spec = np.int32(pos)
                self.data = None
                self.label = label.astype(np.uint32)
                self.label_dev = None
                return
            fp = _fetch_prog(self.batch_sz, float(self._mean),
                             float(self._scale), tuple(self.shape))
            x, lab = fp(cp._dev_cache, cp._dev_labels, np.int32(pos))
            self.replace_data(x)
            self.label = label.astype(np.uint32)
            self.label_dev = lab               # device labels for the
            return                             # forward/fused word path
        self.label_dev = None                      # host path: no device labels
        d = (data.astype(np.float32) - self._mean) * self._scale
        if n < self.batch_sz:                      # partial tail batch
            pad = np.zeros((self.batch_sz - n,) + d.shape[1:], np.float32)
            d = np.concatenate([d, pad], axis=0)
            lbl = np.zeros(self.batch_sz, np.uint32)
            lbl[:n] = label
        else:
            lbl = label.astype(np.uint32)
        self.set_numpy(d.reshape(self.shape))
        self.label = lbl

    def _pos_of_batch(self) -> int:
        """corpus offset of the batch just fetched"""
        return self._corpus._pos - self.batch_sz
