"""Worker for the two-process distributed test (VERDICT r2 #7).

Launched by tests/test_dist.py with T4_COORD/T4_NPROC/T4_RANK set and 4
virtual CPU devices per process (2 x 4 = the dp2,tp4 global topology) —
or with none of them for the single-process 8-device reference run.
Builds a deterministic model, trains it through the `nn.train` engine
(train_epochs) over the T4_MESH global mesh, and writes
{loss, wsum} JSON to argv[1].
"""
import json
import sys

import numpy as np


class _Corpus:
    def __init__(self, data, labels):
        self._d, self._l = data, labels
        self.size = data.shape[0]

    def _read(self, s, n):
        return self._d[s:s + n], self._l[s:s + n]


class _DS:
    def __init__(self, data, labels, batch):
        self._corpus = _Corpus(data, labels)
        self.batch_sz = batch
        self._mean, self._scale = 0.0, 1.0


def main(out_path: str) -> None:
    from tensorforth_tpu.parallel.dist import init_distributed
    rank, nproc = init_distributed()

    from tensorforth_tpu.models import tiny_transformer
    from tensorforth_tpu.nn.train import train_epochs

    model = tiny_transformer(batch=8, seq=8, dim=16, heads=4, classes=4,
                             layers=2)
    # identical weights on every process (and in the reference run)
    rs = np.random.RandomState(7)
    for j in range(model.numel - 1):
        t_in = model[j]
        for g in t_in.grad[:2]:
            if g is None:
                break
            g.replace_data(
                (rs.rand(*g.shape).astype(np.float32) - 0.5) * 0.2)

    rs = np.random.RandomState(3)
    data = rs.rand(16, 8, 16, 1).astype(np.float32)
    labels = rs.randint(0, 4, 16)

    loss = train_epochs(model, _DS(data, labels, 8), lr=0.01, epochs=2)

    wsum = 0.0
    for j in range(model.numel - 1):
        for g in model[j].grad[:2]:
            if g is None:
                break
            wsum += float(np.sum(np.abs(g.numpy())))

    with open(out_path, "w") as f:
        json.dump({"rank": rank, "nproc": nproc,
                   "loss": float(loss), "wsum": wsum}, f)


if __name__ == "__main__":
    main(sys.argv[1])
