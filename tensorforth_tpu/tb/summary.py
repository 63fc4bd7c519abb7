"""Summary — PyTorch-SummaryWriter equivalent driving the Forth TB words.

Reference: tb/summary.{h,cpp}: run-dir management, scalar/text/image/
tile/histo/graph/embed, model-graph op-name mapping.

Host-op deferral (reference ostream.h event queue, sys.cpp flush): every
public method captures an immutable snapshot (jax arrays are immutable —
holding the reference IS the snapshot) and posts the encode+write work
to the io.equeue worker, so TB IO overlaps device compute.  A single
FIFO worker preserves record ordering; `close`/`flush` join the queue.
"""
from __future__ import annotations

import os

import numpy as np

from .writer import EventWriter
from .projector import Projector
from ..io.equeue import EventQueue


def _tile_pixels(d: np.ndarray, n_per_row: int) -> np.ndarray:
    """N images [N,H,W,C] -> bordered grid, mean/std auto-scaled RGB
    (reference Summary::tile / AIO::t2png scaling)"""
    N, H, W, C = d.shape
    mean, std = float(d.mean()), float(d.std())
    scale = 64.0 / std if std > 1e-6 else 64.0
    d = np.clip((d - mean) * scale + 128.0, 0, 255).astype(np.uint8)
    if C == 1:
        d = np.repeat(d, 3, axis=-1)
    rows = (N + n_per_row - 1) // n_per_row
    px = np.zeros((rows * (H + 1), n_per_row * (W + 1), 3), np.uint8)
    for n in range(N):
        r, c = divmod(n, n_per_row)
        px[r * (H + 1):r * (H + 1) + H,
           c * (W + 1):c * (W + 1) + W] = d[n][:, :, :3]
    return px


# reference summary.cpp:115-160 layer -> TF op name mapping
_TF_OPS = {
    0: "Identity", 1: "Conv2D", 2: "MatMul", 3: "Reshape", 4: "Relu",
    5: "Tanh", 6: "Sigmoid", 7: "Selu", 8: "LeakyRelu", 9: "Elu",
    10: "Dropout", 11: "Softmax", 12: "LogSoftmax", 13: "AvgPool",
    14: "MaxPool", 15: "MinPool", 16: "FusedBatchNorm", 17: "UpSample",
    18: "Conv2DBackpropInput",
}


def _snap(t):
    """immutable device snapshot + NHWC shape of a Tensor object
    (captured at post time — later replace_data on t cannot race)"""
    return t.ensure_data(), (t.N(), t.H(), t.W(), t.C())


class Summary:
    def __init__(self, logdir: str, run_id: str | None = None):
        self.logdir = logdir
        self.run_id = run_id
        self.path = os.path.join(logdir, run_id) if run_id else logdir
        self._w: EventWriter | None = None
        self._proj: Projector | None = None
        self._q = EventQueue()

    def _writer(self) -> EventWriter:
        if self._w is None:
            self._w = EventWriter(self.logdir, self.run_id)
        return self._w

    def flush(self):
        self._q.flush()

    def init(self, tag: str):
        """re-point to a new run directory (.tbinit word)"""
        self.close()
        self.run_id = tag
        self.path = os.path.join(self.logdir, tag)

    def set_step(self, i: int):
        self._q.post(lambda: setattr(self._writer(), "step", int(i)))

    def scalar(self, tag: str, v: float):
        self._q.post(lambda: self._writer().add_scalar(tag, v))

    def text(self, tag: str, txt: str):
        self._q.post(lambda: self._writer().add_text(tag, txt))

    def image(self, tag: str, t):
        d, shape = _snap(t)

        def work():
            from .png import raw2png
            px = _tile_pixels(np.asarray(d, np.float32).reshape(shape), 1)
            self._writer().add_image(tag, raw2png(px), px.shape[0],
                                     px.shape[1])
        self._q.post(work)

    def tile(self, tag: str, t, n_per_row: int):
        d, shape = _snap(t)

        def work():
            from .png import raw2png
            px = _tile_pixels(np.asarray(d, np.float32).reshape(shape),
                              max(1, int(n_per_row)))
            self._writer().add_image(tag, raw2png(px), px.shape[0],
                                     px.shape[1])
        self._q.post(work)

    def histo(self, tag: str, t, bins: int):
        d = t.ensure_data()
        self._q.post(lambda: self._writer().add_histo(
            tag, np.asarray(d, np.float32), max(1, int(bins))))

    def graph(self, m):
        if m is None or not m.is_model():
            return
        nodes = []                      # snapshot topology at post time
        prev = "input"
        nodes.append(("input", "Placeholder", []))
        for i in range(m.numel - 1):
            fn = m[i].grad_fn if m[i].grad_fn is not None else 0
            name = f"layer{i}_{_TF_OPS.get(fn, 'Identity')}"
            nodes.append((name, _TF_OPS.get(fn, "Identity"), [prev]))
            prev = name
        self._q.post(lambda: self._writer().add_graph(nodes))

    def embed(self, tag: str, t):
        d = t.ensure_data()
        n = t.N()

        def work():
            if self._proj is None:
                self._proj = Projector(self.path)
            self._proj.add_embedding(
                tag, np.asarray(d, np.float32).reshape(n, -1))
        self._q.post(work)

    def hparam(self, name: str, value):
        """record a hyperparameter for the HParams dashboard (the
        reference ships tb/hparam.h unwired; here `.hparam` drives it)"""
        if not hasattr(self, "_hparams"):
            self._hparams = {}
        self._hparams[name] = value

    def _flush_hparams(self):
        hp = getattr(self, "_hparams", None)
        if not hp or self._w is None:
            return
        from .hparam import HParamWriter
        w = HParamWriter(self._w)
        w.experiment(list(hp.keys()), [])
        w.session_start(hp)
        w.session_end()
        self._hparams = {}

    def close(self):
        self._q.flush()
        if self._w:
            self._flush_hparams()
            self._w.close()
            self._w = None
