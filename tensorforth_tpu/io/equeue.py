"""Deferred host-op event queue.

Reference: src/io/ostream.h:25-112 + sys.cpp:110-273 — the VM posts
host-side operations (TensorBoard records, file IO) into a binary event
queue that the system drains after the VM yields, so device compute and
host IO overlap.

TPU-first realization: a single daemon worker drains a FIFO of python
closures.  Posting captures an *immutable* snapshot (jax arrays are
immutable, so holding the array reference is a zero-copy snapshot; the
device->host transfer happens on the worker, off the interpreter
thread).  A single worker preserves the reference's strict ordering
contract — event files are byte-identical in content to the synchronous
path.  `flush` (the Forth word / close paths) joins the queue.

T4_SYNC_IO=1 restores fully synchronous host ops (the round-1
behavior) for debugging.
"""
from __future__ import annotations

import os
import queue
import threading


class EventQueue:
    def __init__(self):
        self._q: queue.Queue = queue.Queue()
        self._worker: threading.Thread | None = None
        self._sync = bool(int(os.environ.get("T4_SYNC_IO", "0")))
        self.errors: list[str] = []

    def _ensure(self):
        if self._worker is None or not self._worker.is_alive():
            self._worker = threading.Thread(target=self._run, daemon=True,
                                            name="t4-equeue")
            self._worker.start()

    def _run(self):
        while True:
            fn = self._q.get()
            try:
                fn()
            except Exception as ex:              # noqa: BLE001
                self.errors.append(f"{type(ex).__name__}: {ex}")
            finally:
                self._q.task_done()

    def post(self, fn):
        """enqueue a host op; runs inline under T4_SYNC_IO=1"""
        if self._sync:
            fn()
            return
        self._ensure()
        self._q.put(fn)

    def flush(self):
        """drain every posted op (the reference's sys->flush contract)"""
        if self._worker is not None:
            self._q.join()
        if self.errors:
            errs, self.errors = self.errors, []
            raise RuntimeError("deferred host ops failed: "
                               + "; ".join(errs[:4]))
