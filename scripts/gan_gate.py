"""GAN convergence gate — BASELINE.md's last unmeasured row.

Drives the t4_40b.4th GAN (same D/G topologies, losses, Adam betas and
lr decay, word-for-word) for GAN_EPOCHS epochs (default 40) and reports
the final generator/real/fake BCE losses.  The reference's convergence
criterion (examples/t4_40b.4th:2,82) is loss -> ln 0.5 ~ 0.69 — the
discriminator can no longer tell fake from real.

Run on the TPU (single client!):  GAN_EPOCHS=40 python scripts/gan_gate.py
"""
import json
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPOCHS = int(os.environ.get("GAN_EPOCHS", "40"))


def main():
    import bench

    os.environ.setdefault("T4_SEED", "42")
    _, run = bench._repl()
    # t4_40b.4th verbatim minus the TB/progress words (no logdir here)
    run("""0 trace
256 constant N
0.0001 value d_lr 0.0004 value g_lr
0 value _gr 0 value _dr 0 value _df
N 1 1 1 tensor ones  constant REAL
N 1 1 1 tensor zeros constant FAKE
: loss_dr ( D -- D ) REAL loss.bce [to] _dr ;
: loss_df ( D -- D ) FAKE loss.bce [to] _df ;
: loss_gr ( D -- D ) REAL loss.bce [to] _gr ;
: adj_lr ( n -- ) 50 > if d_lr 0.96 * [to] d_lr g_lr 0.96 * [to] g_lr then ;
N 28 28 1 nn.model
512 linear 0.2 leakyrelu 0.3 dropout
256 linear 0.2 leakyrelu 0.3 dropout
1 linear sigmoid
constant D
N 128 1 1 nn.model
256 linear 0.2 leakyrelu
512 linear 0.2 leakyrelu
784 linear tanh
constant G
N dataset mnist_train
128 128 normalize
constant ds0
: X N 128 1 1 tensor randn ;
: F ( -- t4 ) G X forward -1 n@ N 28 28 1 reshape4 ( G t ) swap drop ;
: train_d ( D -- D' ) 1 trainable
  ds0 forward loss_dr REAL backprop
  F   forward loss_df FAKE backprop
  d_lr 0.5 nn.adam ;
: train_g ( D -- D' ) 0 trainable
  F   forward loss_gr REAL backprop
  0 n@ G swap ( D G t4 ) backprop
  g_lr 0.5 nn.adam ( D G ) drop ;
: epoch ( D ds -- D' ) for train_d train_g next ;""")

    if EPOCHS < 1:
        raise SystemExit("GAN_EPOCHS must be >= 1")
    run("D ds0")
    g = dr = df = float("nan")
    for ep in range(EPOCHS):
        run("epoch")
        out = run('." E= " _gr . _dr . _df . cr')
        m = re.findall(r"([-+\d.eE]+)\s", out)
        if len(m) >= 3:              # keep the last good reading even
            g, dr, df = (float(v) for v in m[:3])   # if one line garbles
        print(f"[gan] epoch {ep}: G={g:.4f} Dr={dr:.4f} Df={df:.4f}",
              file=sys.stderr, flush=True)
        run(f"{ep} adj_lr ds0 rewind")
    ok = all(abs(v - math.log(2.0)) < 0.35 for v in (g, dr, df))
    print(json.dumps({
        "gan_epochs": EPOCHS, "gan_gen_loss": round(g, 4),
        "gan_real_loss": round(dr, 4), "gan_fake_loss": round(df, 4),
        "ln2_equilibrium": round(math.log(2.0), 4),
        "converged_within_0.35": ok,
    }))


if __name__ == "__main__":
    main()
