"""TensorBoard stack tests — verify TFRecord framing, masked CRC32C, and
proto payloads round-trip through an independent parser.
"""
import os
import struct

import numpy as np
import pytest


def _read_records(path):
    from tensorforth_tpu.tb.crc32c import masked_crc32c
    out = []
    with open(path, "rb") as f:
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            (ln,) = struct.unpack("<Q", hdr)
            (crc_h,) = struct.unpack("<I", f.read(4))
            assert crc_h == masked_crc32c(hdr), "length crc mismatch"
            data = f.read(ln)
            (crc_d,) = struct.unpack("<I", f.read(4))
            assert crc_d == masked_crc32c(data), "data crc mismatch"
            out.append(data)
    return out


def _parse_fields(buf):
    """minimal protobuf decoder: returns {field: [values]}"""
    fields = {}
    i = 0
    while i < len(buf):
        key = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        fid, wire = key >> 3, key & 7
        if wire == 0:
            v = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:
            v = struct.unpack("<d", buf[i:i + 8])[0]
            i += 8
        elif wire == 5:
            v = struct.unpack("<f", buf[i:i + 4])[0]
            i += 4
        elif wire == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = buf[i:i + ln]
            i += ln
        else:
            raise ValueError(f"wire {wire}")
        fields.setdefault(fid, []).append(v)
    return fields


def test_crc32c_vectors():
    from tensorforth_tpu.tb.crc32c import crc32c
    # RFC 3720 test vector: 32 zero bytes -> 0x8a9136aa
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"123456789") == 0xE3069283


def test_event_file_roundtrip(tmp_path):
    from tensorforth_tpu.tb.writer import EventWriter
    w = EventWriter(str(tmp_path), "run1")
    w.step = 5
    w.add_scalar("train/acc", 0.75)
    w.add_text("progress/text", "hello tb")
    w.add_histo("nn/w", np.arange(100, dtype=np.float32), 10)
    w.close()
    recs = _read_records(w.path)
    assert len(recs) == 4                       # file_version + 3 events
    ev0 = _parse_fields(recs[0])
    assert ev0[3][0] == b"brain.Event:2"
    ev1 = _parse_fields(recs[1])
    assert ev1[2][0] == 5                       # step
    summ = _parse_fields(ev1[5][0])
    val = _parse_fields(summ[1][0])
    assert val[1][0] == b"train/acc"
    assert abs(val[2][0] - 0.75) < 1e-6
    ev3 = _parse_fields(recs[3])
    histo = _parse_fields(_parse_fields(_parse_fields(ev3[5][0])[1][0])[5][0])
    assert histo[3][0] == 100.0                 # num


def test_png_encoder():
    from tensorforth_tpu.tb.png import raw2png
    import zlib
    px = np.zeros((4, 4, 3), np.uint8)
    px[0, 0] = [255, 0, 0]
    data = raw2png(px)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data and b"IDAT" in data and b"IEND" in data
    w, h = struct.unpack(">II", data[16:24])
    assert (w, h) == (4, 4)


def test_tb_words_write_events(t4, tmp_path):
    from tensorforth_tpu.tb.summary import Summary
    t4.sys.tb = Summary(str(tmp_path), "rx")
    t4.forth("3 .tbstep")
    t4.forth('0.5 s" train/loss" .scalar')
    t4.forth('2 2 matrix ones 1 s" img/x" .tile')
    t4.forth('4 vector{ 1 2 3 4 } 4 s" h/x" .histo')
    t4.sys.tb.close()
    files = os.listdir(tmp_path / "rx")
    assert any("tfevents" in f for f in files)


def test_deferred_queue_matches_sync(t4, tmp_path, monkeypatch):
    """the async event queue (reference ostream.h deferral) must produce
    the same records in the same order as the synchronous path"""
    from tensorforth_tpu.tb.summary import Summary

    def drive(run):
        t4.sys.tb = Summary(str(tmp_path), run)
        t4.forth("1 .tbstep")
        t4.forth('0.25 s" q/loss" .scalar')
        t4.forth("2 .tbstep")
        t4.forth('0.125 s" q/loss" .scalar')
        t4.forth('2 2 matrix ones 1 s" q/img" .tile')
        t4.sys.tb.close()
        d = tmp_path / run
        f = [x for x in os.listdir(d) if "tfevents" in x][0]
        recs = _read_records(str(d / f))
        # strip the wall_time field (field 1, fixed64) from each Event
        out = []
        for r in recs:
            fields = {k: v for k, v in _parse_fields(r).items() if k != 1}
            out.append(fields)
        return out

    sync = None
    async_ = None
    monkeypatch.setenv("T4_SYNC_IO", "1")
    sync = drive("sync")
    monkeypatch.delenv("T4_SYNC_IO")
    async_ = drive("async")
    assert sync == async_, "deferred queue changed record content/order"


def test_projector(t4, tmp_path):
    from tensorforth_tpu.tb.summary import Summary
    t4.sys.tb = Summary(str(tmp_path), "re")
    t4.forth('2 1 2 1 tensor ones s" e0" .embed')
    cfg = tmp_path / "re" / "projector_config.pbtxt"
    assert cfg.exists()
    assert "e0_tensors.tsv" in cfg.read_text()


def test_flatbuffer_builder():
    from tensorforth_tpu.tb.flatbuf import FlatBufferBuilder
    b = FlatBufferBuilder()
    s = b.create_string("hello")
    v = b.create_vector_f32([1.0, 2.0, 3.0])
    b.start_table(2)
    b.slot_offset(0, s)
    b.slot_offset(1, v)
    root = b.end_table()
    data = b.finish(root)
    assert b"hello" in data
    import struct
    root_rel = struct.unpack_from("<I", data, 0)[0]
    assert 0 < root_rel < len(data)


def test_tb2gif(t4, tmp_path):
    from tensorforth_tpu.tb.summary import Summary
    s = Summary(str(tmp_path), "gif")
    t = t4.sys.mu.tensor(4, 8, 8, 1)
    import numpy as np
    for i in range(3):
        s.set_step(i)
        t.set_numpy(np.random.RandomState(i).rand(4, 8, 8, 1)
                    .astype("f4"))
        s.tile("gen/image", t, 2)
    s.close()
    import subprocess, sys, os
    out = str(tmp_path / "x.gif")
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "tb2gif.py"),
         str(tmp_path / "gif"), "gen/image", out],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "3 frames" in r.stdout
    assert open(out, "rb").read(6) in (b"GIF87a", b"GIF89a")


def test_hparam_word(t4, tmp_path):
    from tensorforth_tpu.tb.summary import Summary
    t4.sys.tb = Summary(str(tmp_path), "hp2")
    t4.forth('0.5 s" train/x" .scalar')      # open the writer
    t4.forth('0.001 s" lr" .hparam')
    t4.forth('100 s" batch" .hparam')
    t4.sys.tb.close()
    import os
    f = [n for n in os.listdir(tmp_path / "hp2") if "tfevents" in n][0]
    data = open(tmp_path / "hp2" / f, "rb").read()
    assert b"_hparams_/session_start_info" in data
    assert b"lr" in data and b"batch" in data
