"""Sweep T4_CHUNK (trace-chunk length) on the word-at-a-time training
loop and report ms/batch per setting.

Methodology matches bench.py: each round times every K back-to-back in
one tunnel window (interleaved), so window drift cancels inside a
round; the report is median-of-rounds with [min, max] spread.  All
chunk executables are warmed before any timed round.

Run on the TPU (single client!):  python scripts/chunk_sweep.py
"""
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KS = (0, 8, 16, 32, 64, 100)
N_BATCHES = 100
ROUNDS = 5


def main():
    import bench

    os.environ["T4_MAX_BATCH"] = str(N_BATCHES)
    _, run = bench._repl()
    run(f"""0 trace
100 28 28 1 nn.model
0.5 10 conv2d 2 maxpool relu flatten 100 linear relu 10 linear softmax
constant bm
bm batchsize dataset mnist_train constant bds
variable hit 0 hit ! variable lox
: ep for forward loss.ce lox ! nn.hit hit +! backprop 0.001 nn.adam next ;""")

    def one_epoch():
        run("bds rewind")
        out = run('clock bm bds ep drop clock swap - ." EPMS= " . cr '
                  'hit @ . 0 hit !')
        return float(re.search(r"EPMS= ([-+\d.eE]+) ", out).group(1))

    for k in KS:                                    # warm every executable
        os.environ["T4_CHUNK"] = str(k)
        print(f"[sweep] warming K={k} ...", file=sys.stderr, flush=True)
        one_epoch()

    samples = {k: [] for k in KS}
    for r in range(ROUNDS):
        for k in KS:                                # interleaved window
            os.environ["T4_CHUNK"] = str(k)
            samples[k].append(one_epoch() / N_BATCHES)
        print(f"[sweep] round {r}: "
              + " ".join(f"K{k}={samples[k][-1]:.2f}" for k in KS),
              file=sys.stderr, flush=True)

    report = {}
    for k in KS:
        m, s = bench._med_spread(samples[k], 3)
        report[f"chunk_{k}_ms_per_batch_med"] = m
        report[f"chunk_{k}_spread"] = s
    print(json.dumps(report))


if __name__ == "__main__":
    main()
