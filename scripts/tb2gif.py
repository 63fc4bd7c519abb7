#!/usr/bin/env python3
"""tb2gif — stitch TensorBoard image events into an animated GIF.

Reference: examples/tb2gif.py (the reference's only Python utility:
reads a tfevents file's image summaries — e.g. the GAN's per-epoch
generated tiles — and writes an animation).

Usage: python scripts/tb2gif.py <logdir-or-eventfile> [tag] [out.gif]
"""
import io
import os
import struct
import sys


def _records(path):
    with open(path, "rb") as f:
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                return
            (ln,) = struct.unpack("<Q", hdr)
            f.read(4)
            data = f.read(ln)
            f.read(4)
            yield data


def _fields(buf):
    i, out = 0, {}
    while i < len(buf):
        key = 0
        shift = 0
        while True:
            b = buf[i]; i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        fid, wire = key >> 3, key & 7
        if wire == 0:
            v = 0; shift = 0
            while True:
                b = buf[i]; i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:
            v = buf[i:i + 8]; i += 8
        elif wire == 5:
            v = buf[i:i + 4]; i += 4
        elif wire == 2:
            ln = 0; shift = 0
            while True:
                b = buf[i]; i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = buf[i:i + ln]; i += ln
        else:
            raise ValueError(wire)
        out.setdefault(fid, []).append(v)
    return out


def collect_images(path, tag=None):
    """yield (tag, png_bytes) from every image summary in the file"""
    for rec in _records(path):
        ev = _fields(rec)
        for summ in ev.get(5, []):
            for val in _fields(summ).get(1, []):
                vf = _fields(val)
                vtag = vf.get(1, [b""])[0].decode()
                if tag and vtag != tag:
                    continue
                for img in vf.get(4, []):
                    png = _fields(img).get(4, [None])[0]
                    if png:
                        yield vtag, png


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "."
    tag = sys.argv[2] if len(sys.argv) > 2 else None
    out = sys.argv[3] if len(sys.argv) > 3 else "out.gif"
    files = []
    if os.path.isdir(src):
        for root, _, names in os.walk(src):
            files += [os.path.join(root, n) for n in names
                      if "tfevents" in n]
    else:
        files = [src]
    from PIL import Image
    frames = []
    for f in sorted(files):
        for _tag, png in collect_images(f, tag):
            frames.append(Image.open(io.BytesIO(png)).convert("P"))
    if not frames:
        print("no image events found")
        return 1
    frames[0].save(out, save_all=True, append_images=frames[1:],
                   duration=200, loop=0)
    print(f"{out}: {len(frames)} frames")
    return 0


if __name__ == "__main__":
    sys.exit(main())
