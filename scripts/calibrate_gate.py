"""Accuracy-gate difficulty calibration (VERDICT r2 #9).

Sweeps Synthetic-corpus difficulty params x init seeds and reports the
t4_30e 20-epoch held-out accuracy for each, so the shipped (NOISE,
WL_JITTER) lands the gate in (0.98, 1.0) exclusive WITH MARGIN across
random inits (the REPL seeds from the clock, reference CURAND style —
the gate is stochastic run to run).

Run on the TPU:  python scripts/calibrate_gate.py [epochs]
One process sweeps every config (jit programs are shape-keyed, so the
compile is paid once); each config change re-materializes the corpus
memmap cache (~30-50 s, then disk-cached by param hash).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench                                                   # noqa: E402
from tensorforth_tpu.io.loader import Loader, Synthetic        # noqa: E402

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
# (NOISE, WL_JITTER) candidates, current shipping config first
CONFIGS = [(128, 0.25), (112, 0.25), (128, 0.15), (96, 0.20)]
SEEDS = (1, 2, 3)

if __name__ == "__main__":
    for noise, wlj in CONFIGS:
        Synthetic.NOISE = noise
        Synthetic.WL_JITTER = wlj
        Loader._map = {}            # rebuild synth corpora w/ new params
        for seed in SEEDS:
            os.environ["T4_SEED"] = str(seed)
            t0 = time.perf_counter()
            acc = bench.run_accuracy_gate(epochs=EPOCHS)
            print(f"NOISE={noise} WL_JITTER={wlj} seed={seed} "
                  f"acc={acc:.4f} ({time.perf_counter() - t0:.0f}s)",
                  flush=True)
