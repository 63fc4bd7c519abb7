"""Windowed (xcb) corpus viewer tests — io/gui.py.

The container is display-less, so the raw libxcb binding is exercised
only up to its graceful-failure contract; the event loop, paging, and
pixel-page logic run against a FakeDisplay with the same semantic
surface as XcbDisplay (the layering io/gui.py documents)."""
import numpy as np
import pytest

from tensorforth_tpu.io import gui
from tensorforth_tpu.io.loader import Loader


def _corpus():
    cp = Loader.get(None, "mnist_test")
    assert cp is not None
    return cp


class FakeDisplay:
    """records create/blit calls; replays a scripted event stream"""

    def __init__(self, events):
        self.events = list(events)
        self.windows = []
        self.blits = []
        self.closed = False

    def create_window(self, w, h, title):
        self.windows.append((w, h, title))
        return 100 + len(self.windows)

    def put_image(self, win, img):
        assert img.dtype == np.uint8 and img.ndim == 3
        self.blits.append((win, img.shape))

    def wait_event(self):
        return self.events.pop(0) if self.events else ("close", None)

    def close(self):
        self.closed = True


def test_gui_init_headless_returns_false(monkeypatch):
    """no X server reachable -> False, never raises (CLI falls back to
    the ANSI terminal viewer; the reference's GLUT build would abort)"""
    monkeypatch.delenv("DISPLAY", raising=False)
    assert gui.gui_init() is False


def test_corpus_vu_paging_bounds():
    vu = gui.CorpusVu(_corpus(), per_row=4)
    assert vu.pos == 0
    assert vu.keyboard("k") is False            # clamped at 0
    assert vu.keyboard("n") is True
    assert vu.pos == 4
    assert vu.keyboard("j") is True and vu.pos == 5
    assert vu.keyboard("r") is True and vu.pos == 0
    vu.keyboard("q")
    assert vu.done
    # page past the end clamps to the last full page
    vu2 = gui.CorpusVu(_corpus(), per_row=4)
    for _ in range(10_000):
        vu2.keyboard("n")
    assert vu2.pos == vu2.n_show - 4


def test_corpus_vu_pixels_page():
    vu = gui.CorpusVu(_corpus(), per_row=3)
    px = vu.pixels()
    assert px.shape == (vu.height(), vu.width(), 3)
    assert px.dtype == np.uint8
    assert px.max() > 0                          # samples actually drawn
    # paging changes the rendered page
    vu.keyboard("n")
    assert not np.array_equal(px, vu.pixels())
    # integer upscale: window dims are multiples of the corpus dims
    assert vu.width() % 3 == 0 and (vu.width() // 3 - 2) % vu.corpus.W == 0


def test_gui_loop_expose_key_quit():
    """expose blits one frame per source, paging keys redraw, q exits"""
    fake = FakeDisplay([("expose", None), ("key", "n"), (None, None),
                        ("key", "x"), ("key", "q"), ("expose", None)])
    assert gui.gui_init(display=fake) is True
    win = gui.gui_add(gui.CorpusVu(_corpus(), per_row=2))
    frames = gui.gui_loop()
    # expose(1) + 'n' redraw(1); 'x' is a no-op; 'q' exits before the
    # trailing expose is consumed
    assert frames == 2
    assert fake.blits[0][0] == win
    assert fake.closed
    assert len(fake.events) == 1                 # post-quit event unread


def test_corpus_vu_mouse():
    """IRenderSource::mouse analog: click/wheel paging"""
    vu = gui.CorpusVu(_corpus(), per_row=4)
    assert vu.mouse(1, 10, 10) is True and vu.pos == 4    # left: page fwd
    assert vu.mouse(3, 10, 10) is True and vu.pos == 0    # right: back
    assert vu.mouse(5, 0, 0) is True and vu.pos == 1      # wheel down
    assert vu.mouse(4, 0, 0) is True and vu.pos == 0      # wheel up
    assert vu.mouse(2, 0, 0) is False                     # middle: no-op


def test_gui_loop_button_event():
    fake = FakeDisplay([("expose", None), ("button", (1, 5, 5)),
                        ("key", "q")])
    gui.gui_init(display=fake)
    vu = gui.CorpusVu(_corpus(), per_row=2)
    gui.gui_add(vu)
    assert gui.gui_loop() == 2                  # expose + click redraw
    assert vu.pos == 2


def test_gui_loop_close_event():
    fake = FakeDisplay([("expose", None), ("close", None)])
    gui.gui_init(display=fake)
    gui.gui_add(gui.CorpusVu(_corpus(), per_row=2))
    assert gui.gui_loop() == 1
    assert fake.closed


def test_vu_window_headless_falls_back(monkeypatch):
    monkeypatch.delenv("DISPLAY", raising=False)
    assert gui.vu_window("mnist_test") == -1


@pytest.mark.skipif("DISPLAY" not in __import__("os").environ,
                    reason="needs a real X display")
def test_real_x_display_roundtrip():      # pragma: no cover (headless CI)
    d = gui.XcbDisplay()
    win = d.create_window(64, 32, "ten4 gui test")
    d.put_image(win, np.zeros((32, 64, 3), np.uint8))
    d.close()
