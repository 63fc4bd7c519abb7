"""Validate our hand-built TFRecord/proto event files with the REAL
TensorBoard reader (tensorboard is installed in this image) — the
strongest format-parity proof available offline.
"""
import numpy as np
import pytest

tb_ea = pytest.importorskip(
    "tensorboard.backend.event_processing.event_accumulator")


def test_real_tensorboard_reads_our_events(tmp_path, t4):
    from tensorforth_tpu.tb.summary import Summary
    s = Summary(str(tmp_path), "rr")
    s.set_step(7)
    s.scalar("train/acc", 0.5)
    s.set_step(8)
    s.scalar("train/acc", 0.75)
    s.text("progress/text", "step 8 looking good")
    t = t4.sys.mu.tensor(4, 8, 8, 1)
    t.set_numpy(np.random.RandomState(0).rand(4, 8, 8, 1).astype("f4"))
    s.tile("imgs/x", t, 2)
    s.histo("nn/w", t, 10)
    from tensorforth_tpu.models import mnist_cnn
    s.graph(mnist_cnn(batch=4))
    s.close()

    acc = tb_ea.EventAccumulator(str(tmp_path / "rr"),
                                 size_guidance={"images": 10,
                                                "histograms": 10,
                                                "scalars": 100,
                                                "tensors": 10})
    acc.Reload()
    tags = acc.Tags()
    assert "train/acc" in tags["scalars"]
    sc = acc.Scalars("train/acc")
    assert [e.step for e in sc] == [7, 8]
    assert abs(sc[1].value - 0.75) < 1e-6
    assert "imgs/x" in tags["images"]
    img = acc.Images("imgs/x")[0]
    assert img.encoded_image_string[:8] == b"\x89PNG\r\n\x1a\n"
    assert "nn/w" in tags["histograms"]
    h = acc.Histograms("nn/w")[0]
    assert int(h.histogram_value.num) == t.numel
    assert "progress/text" in tags["tensors"]
    assert acc.Graph() is not None
