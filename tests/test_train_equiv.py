"""Cross-path equivalence: the fused ``nn.train`` scan-epoch must land
parameters exactly where the word-at-a-time loop
(``forward backprop nn.adam``) lands them — same reference backward
quirks, same uncorrected Adam (VERDICT r1 weak #1/#2 regression tests).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


class _StubCorpus:
    def __init__(self, data, labels):
        self._data = data
        self._labels = labels
        self.size = data.shape[0]

    def _read(self, start, n):
        return self._data[start:start + n], self._labels[start:start + n]


class _StubDataset:
    """duck-types the bits _stage_batches needs"""
    def __init__(self, data, labels, batch, mean=0.0, scale=1.0):
        self._corpus = _StubCorpus(data, labels)
        self.batch_sz = batch
        self._mean = mean
        self._scale = scale


def _snapshot(model):
    return [tuple(np.array(w, np.float32) for w in pl)
            for pl in model._params()]


def _restore(model, snap):
    for j in range(model.numel - 1):
        t_in = model[j]
        for k, w in enumerate(snap[j]):
            g = t_in.grad[k]
            g.replace_data(np.asarray(w, np.float32).reshape(g.shape))


def _word_loop(t4, model, x_batches, hot_batches, lr, epochs):
    """the literal word path: forward / backprop / nn.adam per batch"""
    from tensorforth_tpu.mu.mmu import MMU
    mmu = MMU.get_mmu()
    batch = x_batches.shape[1]
    inp = mmu.tensor(*((batch,) + x_batches.shape[2:]))
    out = model[-1]
    hot = mmu.tensor(batch, 1, out.HWC(), 1)
    for _ in range(epochs):
        for b in range(x_batches.shape[0]):
            inp.set_numpy(np.asarray(x_batches[b]))
            hot.set_numpy(np.asarray(hot_batches[b]).reshape(hot.shape))
            model.forward(inp)
            model.backprop(hot)
            model.adam(lr)


def _stage(model, n_batches, batch, seed=7):
    rs = np.random.RandomState(seed)
    shp = tuple(model[0].shape[1:])
    data = rs.rand(n_batches * batch, *shp).astype(np.float32)
    classes = model[-1].HWC()
    labels = rs.randint(0, classes, size=n_batches * batch)
    ds = _StubDataset(data, labels, batch)
    x = data.reshape((n_batches, batch) + shp)
    hot = np.eye(classes, dtype=np.float32)[labels].reshape(
        n_batches, batch, 1, classes, 1)
    return ds, x, hot


@pytest.mark.parametrize("zoo_name", ["mnist_cnn", "tiny_transformer"])
def test_nn_train_matches_word_path(t4, monkeypatch, zoo_name):
    monkeypatch.delenv("T4_MAX_BATCH", raising=False)
    monkeypatch.delenv("T4_MESH", raising=False)
    from tensorforth_tpu import models
    from tensorforth_tpu.nn.train import train_epochs

    if zoo_name == "mnist_cnn":
        model = models.mnist_cnn(batch=8)
        twin = models.mnist_cnn(batch=8)
    else:
        model = models.tiny_transformer(batch=4, seq=8, dim=16, heads=4,
                                        classes=4, layers=1)
        twin = models.tiny_transformer(batch=4, seq=8, dim=16, heads=4,
                                       classes=4, layers=1)
    p0 = _snapshot(model)
    _restore(twin, p0)                       # identical starting weights

    batch = model[0].N()
    ds, x, hot = _stage(model, n_batches=3, batch=batch)
    lr = 0.01

    _word_loop(t4, model, x, hot, lr, epochs=2)
    train_epochs(twin, ds, lr=lr, epochs=2)

    p_word = _snapshot(model)
    p_fused = _snapshot(twin)
    changed = False
    for j, (pw, pf) in enumerate(zip(p_word, p_fused)):
        for k, (w1, w2) in enumerate(zip(pw, pf)):
            np.testing.assert_allclose(
                w1, w2, rtol=5e-4, atol=5e-6,
                err_msg=f"layer {j} param {k} diverges between the word "
                        f"path and nn.train")
            if not np.allclose(w1, p0[j][k]):
                changed = True
    assert changed, "training changed nothing"


def test_nn_train_writes_back_attn(t4, monkeypatch):
    """r1 bug: nn.train silently dropped trained attention weights"""
    monkeypatch.delenv("T4_MAX_BATCH", raising=False)
    monkeypatch.delenv("T4_MESH", raising=False)
    from tensorforth_tpu import models
    from tensorforth_tpu.nn.ntypes import Layer
    from tensorforth_tpu.nn.train import train_epochs

    m = models.tiny_transformer(batch=4, seq=8, dim=16, heads=4,
                                classes=4, layers=1)
    p0 = _snapshot(m)
    ds, _, _ = _stage(m, n_batches=2, batch=4)
    train_epochs(m, ds, lr=0.01, epochs=1)
    p1 = _snapshot(m)
    for j in range(m.numel - 1):
        if m[j].grad_fn == Layer.ATTN:
            assert not np.allclose(p0[j][0], p1[j][0]), "wqkv not written back"
            assert not np.allclose(p0[j][1], p1[j][1]), "wo not written back"


def test_sharded_trainer_writes_back_attn(t4):
    """ShardedTrainer.write_back covers every parameterized layer kind"""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from tensorforth_tpu import models
    from tensorforth_tpu.nn.ntypes import Layer
    from tensorforth_tpu.parallel.trainer import ShardedTrainer

    m = models.tiny_transformer(batch=8, seq=8, dim=16, heads=4,
                                classes=4, layers=1)
    p0 = _snapshot(m)
    tr = ShardedTrainer(m, loss="ce", lr=0.01)
    rs = np.random.RandomState(3)
    x = rs.rand(8, 8, 16, 1).astype(np.float32)
    y = np.eye(4, dtype=np.float32)[rs.randint(0, 4, 8)].reshape(8, 1, 4, 1)
    for i in range(3):
        tr.step(x, y, seed=i)
    tr.write_back(m)
    p1 = _snapshot(m)
    for j in range(m.numel - 1):
        if m[j].grad_fn == Layer.ATTN:
            assert not np.allclose(p0[j][0], p1[j][0]), "wqkv not written back"
            assert not np.allclose(p0[j][1], p1[j][1]), "wo not written back"
