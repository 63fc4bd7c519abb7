"""End-to-end test of the raw xcb binding (io/gui.py XcbDisplay)
against an in-process fake X server.

The container has no X server, so this spins up a protocol-level fake:
a unix-socket listener that speaks just enough X11 — connection setup
reply, GetKeyboardMapping reply, request-stream parsing, and scripted
Expose/KeyPress events — to drive the REAL libxcb binding through
gui_init/gui_add/gui_loop.  This covers everything the DISPLAY-gated
test in test_gui.py would: ctypes prototypes, struct layouts, setup
parsing, keycode→keysym mapping, chunked PutImage, and the event loop.

X11 wire format reference: X Window System Protocol, X11R7.7
(request opcodes: CreateWindow=1, MapWindow=8, ChangeProperty=18,
CreateGC=55, PutImage=72, GetKeyboardMapping=101)."""
import os
import socket
import struct
import threading

import numpy as np
import pytest

try:
    import ctypes
    ctypes.CDLL("libxcb.so.1")
    HAVE_XCB = True
except OSError:                                   # pragma: no cover
    HAVE_XCB = False

pytestmark = pytest.mark.skipif(not HAVE_XCB, reason="libxcb absent")

_OP_CREATE_WINDOW = 1
_OP_MAP_WINDOW = 8
_OP_CHANGE_PROPERTY = 18
_OP_CREATE_GC = 55
_OP_PUT_IMAGE = 72
_OP_GET_KEYBOARD_MAPPING = 101

_MIN_KC = 8
_KEYS = "jknpqr"                        # keycode 8+i -> ord(_KEYS[i])


def _setup_reply() -> bytes:
    """success setup blob: 1 screen, 1 depth-24 format, 1 visual"""
    vendor = b"t4fk"
    fmt = struct.pack("<BBB5x", 24, 32, 32)              # depth bpp pad
    visual = struct.pack("<IBBHIII4x", 0x21, 4, 8, 256,  # TrueColor
                         0xFF0000, 0x00FF00, 0x0000FF)
    depth = struct.pack("<BxH4x", 24, 1) + visual
    screen = struct.pack(
        "<IIIIIHHHHHHIBBBB",
        0x2A,            # root window
        0x20,            # default colormap
        0xFFFFFF, 0,     # white, black pixel
        0,               # current input masks
        1024, 768, 270, 203,
        1, 1,            # min/max installed maps
        0x21,            # root visual
        0, 0,            # backing stores, save unders
        24,              # root depth
        1,               # allowed depths len
    ) + depth
    body = struct.pack(
        "<IIIIHHBBBBBBBB4x",
        11000000,            # release
        0x00400000,          # resource id base
        0x003FFFFF,          # resource id mask
        256,                 # motion buffer
        len(vendor),
        65535,               # max request length (4-byte units)
        1, 1,                # roots len, formats len
        0, 0,                # image byte order, bitmap bit order (LSB)
        32, 32,              # scanline unit / pad
        _MIN_KC, _MIN_KC + len(_KEYS) - 1,
    ) + vendor + fmt + screen
    assert len(body) % 4 == 0
    return struct.pack("<BxHHH", 1, 11, 0, len(body) // 4) + body


def _event(kind: int, seq: int, **kw) -> bytes:
    if kind == 12:                                       # Expose
        e = struct.pack("<BxHIHHHHH14x", 12, seq, kw.get("window", 0),
                        0, 0, 64, 64, 0)
    elif kind in (2, 4):                     # KeyPress / ButtonPress
        e = struct.pack("<BBHIIIIhhhhHBx", kind, kw["keycode"], seq,
                        0, 0x2A, kw.get("window", 0), 0, 0,
                        kw.get("x", 0), kw.get("y", 0), 0, 0, 1)
    else:                                                # pragma: no cover
        raise ValueError(kind)
    assert len(e) == 32
    return e


class FakeXServer(threading.Thread):
    """accepts ONE client; scripts: expose -> 'n' redraw -> 'q' quit.
    Records every request opcode for post-run assertions."""

    def __init__(self, display_no: int):
        super().__init__(daemon=True)
        self.opcodes: list[int] = []
        self.put_images: list[tuple[int, int]] = []      # (w, h) per chunk
        self.error: str | None = None
        self._srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        # libxcb tries the Linux ABSTRACT socket @/tmp/.X11-unix/XN
        # before the filesystem one — bind that: no filesystem touch
        self._srv.bind(f"\0/tmp/.X11-unix/X{display_no}")
        self._srv.listen(1)

    def _recv(self, c, n) -> bytes:
        buf = b""
        while len(buf) < n:
            got = c.recv(n - len(buf))
            if not got:
                raise ConnectionError("client closed")
            buf += got
        return buf

    def run(self):                                        # noqa: C901
        try:
            c, _ = self._srv.accept()
            c.settimeout(20)
            # --- connection setup: order byte + versions + auth lens
            head = self._recv(c, 12)
            order, maj, _min, alen, dlen = struct.unpack("<BxHHHH2x", head)
            assert order == 0x6C and maj == 11, (order, maj)
            pad = (-alen % 4) + (-dlen % 4)
            if alen + dlen + pad:
                self._recv(c, alen + dlen + pad)
            c.sendall(_setup_reply())

            seq = 0
            keys_sent = 0
            win_h = 0
            while True:
                head = self._recv(c, 4)
                opcode, _detail, rlen = struct.unpack("<BBH", head)
                body = self._recv(c, rlen * 4 - 4) if rlen > 1 else b""
                seq += 1
                self.opcodes.append(opcode)
                if opcode == _OP_CREATE_WINDOW:
                    win_h = struct.unpack("<H", body[14:16])[0]
                elif opcode == _OP_GET_KEYBOARD_MAPPING:
                    syms = b"".join(struct.pack("<I", ord(ch))
                                    for ch in _KEYS)
                    c.sendall(struct.pack("<BBHI24x", 1, 1, seq,
                                          len(_KEYS)) + syms)
                elif opcode == _OP_MAP_WINDOW:
                    # window is up: script the browsing session
                    c.sendall(_event(12, seq))                   # expose
                elif opcode == _OP_PUT_IMAGE:
                    w, h = struct.unpack("<HH", body[8:12])
                    self.put_images.append((w, h))
                    # a blit may arrive as several chunked PutImage
                    # requests; advance the script once per FRAME
                    if sum(ch for _, ch in self.put_images) % win_h:
                        continue
                    keys_sent += 1
                    if keys_sent == 1:                   # 'n' key: page
                        c.sendall(_event(2, seq,
                                         keycode=_MIN_KC + _KEYS.index("n")))
                    elif keys_sent == 2:                 # right-click: back
                        c.sendall(_event(4, seq, keycode=3, x=9, y=9))
                    elif keys_sent == 3:                 # 'q': quit
                        c.sendall(_event(2, seq,
                                         keycode=_MIN_KC + _KEYS.index("q")))
        except (ConnectionError, OSError):
            pass                         # client disconnect ends the run
        except Exception as e:           # pragma: no cover
            self.error = f"{type(e).__name__}: {e}"
        finally:
            self._srv.close()


def test_xcb_binding_against_fake_server(monkeypatch):
    from tensorforth_tpu.io import gui
    from tensorforth_tpu.io.loader import Loader

    display_no = 7000 + os.getpid() % 1000       # avoid collisions
    srv = FakeXServer(display_no)
    srv.start()
    monkeypatch.setenv("DISPLAY", f":{display_no}")
    monkeypatch.delenv("XAUTHORITY", raising=False)

    assert gui.gui_init() is True, "binding failed to connect"
    cp = Loader.get(None, "mnist_test")
    vu = gui.CorpusVu(cp, per_row=2)
    gui.gui_add(vu)
    frames = gui.gui_loop()
    srv.join(timeout=20)

    assert srv.error is None, srv.error
    # expose blit + 'n' redraw + right-click redraw (q exits after)
    assert frames == 3, (frames, srv.opcodes)
    assert vu.pos == 0                       # 'n' paged fwd, click back
    # full request trail: keyboard map, window+title+gc+map, blits
    assert _OP_GET_KEYBOARD_MAPPING in srv.opcodes
    assert _OP_CREATE_WINDOW in srv.opcodes
    assert _OP_CHANGE_PROPERTY in srv.opcodes
    assert _OP_CREATE_GC in srv.opcodes
    assert _OP_MAP_WINDOW in srv.opcodes
    assert len(srv.put_images) >= 3
    # every chunk is full-width and the chunk heights sum to 3 pages
    w, h = vu.width(), vu.height()
    assert all(cw == w for cw, _ in srv.put_images)
    assert sum(ch for _, ch in srv.put_images) == 3 * h
