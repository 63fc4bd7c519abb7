"""Summary — PyTorch-SummaryWriter equivalent driving the Forth TB words.

Reference: tb/summary.{h,cpp}: run-dir management, scalar/text/image/
tile/histo/graph/embed, model-graph op-name mapping.
"""
from __future__ import annotations

import os

import numpy as np

from .writer import EventWriter
from .projector import Projector


def _tile_pixels(t, n_per_row: int) -> np.ndarray:
    """N images -> bordered grid, mean/std auto-scaled RGB
    (reference Summary::tile / AIO::t2png scaling)"""
    d = t.numpy().reshape(t.N(), t.H(), t.W(), t.C())
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


class Summary:
    def __init__(self, logdir: str, run_id: str | None = None):
        self.logdir = logdir
        self.run_id = run_id
        self.path = os.path.join(logdir, run_id) if run_id else logdir
        self._w: EventWriter | None = None
        self._proj: Projector | None = None

    def _writer(self) -> EventWriter:
        if self._w is None:
            self._w = EventWriter(self.logdir, self.run_id)
        return self._w

    def init(self, tag: str):
        """re-point to a new run directory (.tbinit word)"""
        self.close()
        self.run_id = tag
        self.path = os.path.join(self.logdir, tag)

    def set_step(self, i: int):
        self._writer().step = int(i)

    def scalar(self, tag: str, v: float):
        self._writer().add_scalar(tag, v)

    def text(self, tag: str, txt: str):
        self._writer().add_text(tag, txt)

    def image(self, tag: str, t):
        from .png import raw2png
        px = _tile_pixels(t, 1)
        self._writer().add_image(tag, raw2png(px), px.shape[0], px.shape[1])

    def tile(self, tag: str, t, n_per_row: int):
        from .png import raw2png
        px = _tile_pixels(t, max(1, int(n_per_row)))
        self._writer().add_image(tag, raw2png(px), px.shape[0], px.shape[1])

    def histo(self, tag: str, t, bins: int):
        self._writer().add_histo(tag, t.numpy(), max(1, int(bins)))

    def graph(self, m):
        if m is None or not m.is_model():
            return
        nodes = []
        prev = "input"
        nodes.append(("input", "Placeholder", []))
        for i in range(m.numel - 1):
            fn = m[i].grad_fn if m[i].grad_fn is not None else 0
            name = f"layer{i}_{_TF_OPS.get(fn, 'Identity')}"
            nodes.append((name, _TF_OPS.get(fn, "Identity"), [prev]))
            prev = name
        self._writer().add_graph(nodes)

    def embed(self, tag: str, t):
        if self._proj is None:
            self._proj = Projector(self.path)
        self._proj.add_embedding(tag, t.numpy().reshape(t.N(), -1))

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
        if self._w:
            self._flush_hparams()
            self._w.close()
            self._w = None
