"""Headless dataset viewer.

The reference ships an OpenGL/GLUT/SDL3 corpus viewer (src/vu/, used by
test binaries only).  A zero-egress TPU host has no display, so the
equivalent here renders corpus samples / tensors to tiled PNG files —
same CUDA-texture-tile layout, file-backed.
"""
from __future__ import annotations

import numpy as np

from .loader import Loader
from ..tb.png import raw2png


def view_corpus(name: str, out_path: str, n: int = 64,
                n_per_row: int = 8) -> str:
    """render the first n corpus samples into a tiled PNG"""
    cp = Loader.get(None, name)
    if cp is None:
        raise FileNotFoundError(name)
    cp.init()
    data, labels = cp.fetch(n)
    cp.rewind()
    h, w, c = cp.H, cp.W, cp.C
    rows = (len(data) + n_per_row - 1) // n_per_row
    px = np.zeros((rows * (h + 1), n_per_row * (w + 1), 3), np.uint8)
    for i, img in enumerate(data):
        r, col = divmod(i, n_per_row)
        img3 = img if c == 3 else np.repeat(img, 3, axis=-1)
        px[r * (h + 1):r * (h + 1) + h,
           col * (w + 1):col * (w + 1) + w] = img3[:, :, :3]
    with open(out_path, "wb") as f:
        f.write(raw2png(px))
    return out_path


def view_tensor(t, out_path: str, n_per_row: int = 8) -> str:
    """render a rank-4 tensor as a tiled PNG (auto-scaled)"""
    from ..tb.summary import _tile_pixels
    px = _tile_pixels(t, n_per_row)
    with open(out_path, "wb") as f:
        f.write(raw2png(px))
    return out_path
