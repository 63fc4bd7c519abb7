"""Real-corpus path: when IDX/CIFAR files exist under T4_DATA they are
used instead of the synthetic stand-in (VERDICT r1 missing #1 — the
IDX reader was never exercised against real-format files)."""
import gzip
import os
import struct

import numpy as np
import pytest


def _write_mnist(root, n=64):
    d = os.path.join(root, "MNIST", "raw")
    os.makedirs(d, exist_ok=True)
    rs = np.random.RandomState(7)
    imgs = rs.randint(0, 256, size=(n, 28, 28), dtype=np.uint8)
    lbls = rs.randint(0, 10, size=n, dtype=np.uint8)
    with open(os.path.join(d, "train-images-idx3-ubyte"), "wb") as f:
        f.write(struct.pack(">IIII", 0x803, n, 28, 28))
        f.write(imgs.tobytes())
    # labels as .gz to exercise the gzip branch
    with gzip.open(os.path.join(d, "train-labels-idx1-ubyte.gz"),
                   "wb") as f:
        f.write(struct.pack(">II", 0x801, n))
        f.write(lbls.tobytes())
    return imgs, lbls


def _write_cifar(root, n=32):
    d = os.path.join(root, "CIFAR10", "cifar-10-batches-bin")
    os.makedirs(d, exist_ok=True)
    rs = np.random.RandomState(9)
    lbls = rs.randint(0, 10, size=n, dtype=np.uint8)
    chw = rs.randint(0, 256, size=(n, 3, 32, 32), dtype=np.uint8)
    with open(os.path.join(d, "data_batch.bin"), "wb") as f:
        for i in range(n):
            f.write(bytes([lbls[i]]))
            f.write(chw[i].tobytes())
    return chw, lbls


@pytest.fixture()
def data_root(tmp_path, monkeypatch):
    from tensorforth_tpu.config import Config
    from tensorforth_tpu.io.loader import Loader
    monkeypatch.setenv("T4_DATA", str(tmp_path))
    old_roots = Config.DATA_ROOTS
    Config.DATA_ROOTS = [str(tmp_path)]
    Loader._map = {}                       # reset registry
    yield tmp_path
    Config.DATA_ROOTS = old_roots
    Loader._map = {}


def test_mnist_idx_reader(data_root, t4):
    imgs, lbls = _write_mnist(str(data_root))
    from tensorforth_tpu.io.loader import Loader
    cp = Loader.get(None, "mnist_train")
    cp.init()
    assert type(cp).__name__ == "Mnist", "real IDX files not picked up"
    assert cp.size == 64 and cp.H == 28
    d, l = cp._read(0, 10)
    np.testing.assert_array_equal(d.reshape(10, 28, 28), imgs[:10])
    np.testing.assert_array_equal(l, lbls[:10])


def test_mnist_idx_bad_magic(data_root, t4):
    d = os.path.join(str(data_root), "MNIST", "raw")
    os.makedirs(d, exist_ok=True)
    for nm, payload in (("train-images-idx3-ubyte",
                         struct.pack(">IIII", 0xBAD, 1, 28, 28)),
                        ("train-labels-idx1-ubyte",
                         struct.pack(">II", 0x801, 1) + b"\0")):
        with open(os.path.join(d, nm), "wb") as f:
            f.write(payload)
    from tensorforth_tpu.io.loader import Loader
    cp = Loader.get(None, "mnist_train")
    with pytest.raises(AssertionError):
        cp.init()


def test_cifar_reader(data_root, t4):
    chw, lbls = _write_cifar(str(data_root))
    from tensorforth_tpu.io.loader import Loader
    cp = Loader.get(None, "cifar10_train")
    cp.init()
    assert type(cp).__name__ == "Cifar10"
    assert cp.size == 32 and cp.C == 3
    d, l = cp._read(0, 4)
    np.testing.assert_array_equal(
        d, chw[:4].transpose(0, 2, 3, 1))    # NCHW -> NHWC
    np.testing.assert_array_equal(l, lbls[:4])


def test_real_data_trains_through_words(data_root, t4, monkeypatch):
    """end-to-end: the dataset word loads the REAL files (no synthetic
    WARN) and an epoch trains on them"""
    _write_mnist(str(data_root))
    monkeypatch.setenv("T4_MAX_BATCH", "2")
    out = t4.forth("""0 trace
16 28 28 1 nn.model flatten 16 linear relu 10 linear softmax constant rm
rm batchsize dataset mnist_train constant rds""")
    assert "synthetic" not in out, "real corpus not used"
    out = t4.forth("rm rds forward loss.ce . backprop 0.01 nn.adam drop drop")
    v = float(out.strip().split()[0])
    assert 0.0 < v < 50.0
