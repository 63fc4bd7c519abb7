#!/usr/bin/env python3
"""One-command fetch of the genuine MNIST IDX files into ./data.

Usage:  python scripts/fetch_mnist.py [dest_root]

Downloads the four IDX files (gzipped; the loader reads .gz directly)
into <dest_root>/MNIST/raw — the layout tensorforth_tpu/io/loader.py
searches (Config.DATA_ROOTS).  MNIST is public domain (LeCun et al.);
mirrors tried in order.  When this container has no network egress,
run it on any connected machine and copy the directory across, or
point T4_DATA at an existing torchvision-style MNIST/raw directory.

Reference parity: the CUDA build reads the same files from ./data
(/root/reference/src/ld/mnist.cpp:19-92, loader.cpp:31-45).
"""
import os
import sys
import urllib.request

FILES = [
    "train-images-idx3-ubyte.gz",
    "train-labels-idx1-ubyte.gz",
    "t10k-images-idx3-ubyte.gz",
    "t10k-labels-idx1-ubyte.gz",
]
MIRRORS = [
    "https://ossci-datasets.s3.amazonaws.com/mnist/",
    "https://storage.googleapis.com/cvdf-datasets/mnist/",
]


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "./data"
    raw = os.path.join(root, "MNIST", "raw")
    os.makedirs(raw, exist_ok=True)
    for name in FILES:
        dst = os.path.join(raw, name)
        if os.path.exists(dst) or os.path.exists(dst[:-3]):
            print(f"  have {name}")
            continue
        for base in MIRRORS:
            try:
                print(f"  {base}{name} ...", flush=True)
                urllib.request.urlretrieve(base + name, dst)
                break
            except Exception as e:
                print(f"    failed: {e}")
        else:
            print(f"ERROR: could not fetch {name} from any mirror; "
                  f"download it manually into {raw}/")
            return 1
    print(f"MNIST ready under {raw}; the loader will prefer it over "
          f"the synthetic stand-in automatically.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
