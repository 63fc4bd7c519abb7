"""Native IO library (csrc/t4io.cpp): TB event records must be
byte-identical to the pure-Python encoder path, and the native
IDX/CIFAR readers must agree with the Python fallback on the same
files (incl. the gzip branch)."""
import gzip
import os
import struct

import numpy as np
import pytest

from tensorforth_tpu.runtime import native

pytestmark = pytest.mark.skipif(native.get_io() is None,
                                reason="libt4io not available")


def _write_all_events(writer):
    writer.add_scalar("loss/train", 0.4375)
    writer.step = 3
    writer.add_scalar("loss/train", -1.25e-3)
    writer.add_text("cfg", "batch=100 lr=0.01")
    png = b"\x89PNG\r\n\x1a\n" + bytes(range(64))
    writer.add_image("gen/tile", png, 28, 56)
    rs = np.random.RandomState(5)
    writer.add_histo("w/conv1", rs.randn(257).astype(np.float32))
    writer.add_histo("const", np.full(8, 2.5))
    writer.add_graph([("conv1", "Conv2D", ["input"]),
                      ("relu1", "Relu", ["conv1"])])
    writer.close()


def test_tb_native_bytes_identical(tmp_path, monkeypatch):
    from tensorforth_tpu.tb.writer import EventWriter
    monkeypatch.setattr("tensorforth_tpu.tb.writer.time.time",
                        lambda: 1755300000.125)
    w_native = EventWriter(str(tmp_path / "nat"))
    assert w_native._lib is not None, "native writer not engaged"
    _write_all_events(w_native)

    monkeypatch.setattr("tensorforth_tpu.tb.writer.native.get_io",
                        lambda: None)
    w_py = EventWriter(str(tmp_path / "py"))
    assert w_py._lib is None
    _write_all_events(w_py)

    with open(w_native.path, "rb") as f:
        nat = f.read()
    with open(w_py.path, "rb") as f:
        py = f.read()
    assert nat == py
    assert len(nat) > 200


def test_tb_native_real_reader(tmp_path):
    """the native-written file loads through the real TensorBoard /
    tensorflow event reader when one is installed (same check the
    Python writer passed in round 1)"""
    try:
        from tensorboard.backend.event_processing.event_file_loader \
            import RawEventFileLoader
    except Exception:
        pytest.skip("tensorboard reader not installed")
    from tensorforth_tpu.tb.writer import EventWriter
    w = EventWriter(str(tmp_path))
    assert w._lib is not None
    w.add_scalar("x", 1.5)
    w.close()
    records = list(RawEventFileLoader(w.path).Load())
    assert len(records) == 2      # file_version + scalar


def _idx_files(root, gz_labels=True, n=32):
    d = os.path.join(root, "MNIST", "raw")
    os.makedirs(d, exist_ok=True)
    rs = np.random.RandomState(3)
    imgs = rs.randint(0, 256, size=(n, 28, 28), dtype=np.uint8)
    lbls = rs.randint(0, 10, size=n, dtype=np.uint8)
    with open(os.path.join(d, "train-images-idx3-ubyte"), "wb") as f:
        f.write(struct.pack(">IIII", 0x803, n, 28, 28))
        f.write(imgs.tobytes())
    opener = gzip.open if gz_labels else open
    suffix = ".gz" if gz_labels else ""
    with opener(os.path.join(d, "train-labels-idx1-ubyte" + suffix),
                "wb") as f:
        f.write(struct.pack(">II", 0x801, n))
        f.write(lbls.tobytes())
    return imgs, lbls


@pytest.fixture()
def data_root(tmp_path, monkeypatch):
    from tensorforth_tpu.config import Config
    from tensorforth_tpu.io.loader import Loader
    old_roots = Config.DATA_ROOTS
    Config.DATA_ROOTS = [str(tmp_path)]
    Loader._map = {}
    yield str(tmp_path)
    Config.DATA_ROOTS = old_roots
    Loader._map = {}


def test_idx_native_matches_python(data_root, monkeypatch):
    imgs, lbls = _idx_files(data_root)
    from tensorforth_tpu.io.loader import Mnist
    nat = Mnist("MNIST/raw/train-images-idx3-ubyte",
                "MNIST/raw/train-labels-idx1-ubyte")
    nat.init()
    np.testing.assert_array_equal(nat._img.reshape(-1, 28, 28), imgs)
    np.testing.assert_array_equal(nat._lbl, lbls)

    monkeypatch.setattr("tensorforth_tpu.runtime.native.get_io",
                        lambda: None)
    py = Mnist("MNIST/raw/train-images-idx3-ubyte",
               "MNIST/raw/train-labels-idx1-ubyte")
    py.init()
    np.testing.assert_array_equal(nat._img, py._img)
    np.testing.assert_array_equal(nat._lbl, py._lbl)


def _cifar_file(root, gz=False, n=16):
    d = os.path.join(root, "CIFAR10", "cifar-10-batches-bin")
    os.makedirs(d, exist_ok=True)
    rs = np.random.RandomState(11)
    lbls = rs.randint(0, 10, size=n, dtype=np.uint8)
    chw = rs.randint(0, 256, size=(n, 3, 32, 32), dtype=np.uint8)
    opener = gzip.open if gz else open
    name = "data_batch.bin" + (".gz" if gz else "")
    with opener(os.path.join(d, name), "wb") as f:
        for i in range(n):
            f.write(bytes([lbls[i]]))
            f.write(chw[i].tobytes())
    return chw, lbls


@pytest.mark.parametrize("gz", [False, True])
def test_cifar_native_matches_python(data_root, monkeypatch, gz):
    chw, lbls = _cifar_file(data_root, gz=gz)
    from tensorforth_tpu.io.loader import Cifar10
    nat = Cifar10("CIFAR10/cifar-10-batches-bin/data_batch.bin")
    nat.init()
    assert nat.size == 16
    np.testing.assert_array_equal(nat._data, chw.transpose(0, 2, 3, 1))
    np.testing.assert_array_equal(nat._lbl, lbls)

    monkeypatch.setattr("tensorforth_tpu.runtime.native.get_io",
                        lambda: None)
    py = Cifar10("CIFAR10/cifar-10-batches-bin/data_batch.bin")
    py.init()
    np.testing.assert_array_equal(nat._data, py._data)
    np.testing.assert_array_equal(nat._lbl, py._lbl)
