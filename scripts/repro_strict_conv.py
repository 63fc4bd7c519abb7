"""Minimal repro: 'highest'-precision convolutions wedge the XLA TPU
compiler (docs/ROADMAP.md r5 #4; CLAUDE.md environment gotchas).

Observed on the tunneled v5e backend (jax 0.x, libtpu in this image):

  * ONE 3x3 conv forward at precision='highest' takes >9 minutes to
    compile (vs seconds at 'high' or default).
  * A batch-256 conv BACKWARD at 'highest' did not return within 30
    minutes — indistinguishable from a hung relay.
  * The same graphs at precision='high' (3-pass bf16) compile in
    seconds and deliver f32-class accuracy; matmuls at 'highest'
    compile fine, so the pathology is specific to convolution
    lowering.

This framework's workaround: `T4_PRECISION=strict` maps convs to
'high' (config.py; ops/engine.py conv dots), which is why no shipping
path ever hits the pathology.  This script exists so the issue can be
reproduced and reported upstream in isolation.

Usage:
    python scripts/repro_strict_conv.py              # safe control only
    python scripts/repro_strict_conv.py --pathological
        # ALSO compiles the 'highest' conv under a watchdog.  On the
        # shared tunneled backend this can wedge the relay for other
        # clients for many minutes — only run when you own the chip.
"""
import argparse
import sys
import threading
import time

import jax
import jax.numpy as jnp


def _conv(x, w, precision):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision)


def compile_timed(name, precision, timeout_s):
    x = jnp.ones((8, 28, 28, 1), jnp.float32)
    w = jnp.ones((3, 3, 1, 16), jnp.float32)
    fn = jax.jit(lambda a, b: _conv(a, b, precision))
    done = {}

    def work():
        t0 = time.perf_counter()
        fn.lower(x, w).compile()
        done["s"] = time.perf_counter() - t0

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(timeout_s)
    if "s" in done:
        print(f"{name}: compiled in {done['s']:.1f} s")
        return done["s"]
    print(f"{name}: NOT COMPILED after {timeout_s} s "
          f"(compiler wedged — the repro)", flush=True)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pathological", action="store_true",
                    help="also compile the 'highest' conv (may wedge "
                         "the tunneled backend for many minutes)")
    ap.add_argument("--timeout", type=float, default=120.0)
    args = ap.parse_args()
    print(f"backend: {jax.devices()[0].platform} "
          f"({jax.devices()[0].device_kind})")
    compile_timed("conv precision=default", jax.lax.Precision.DEFAULT,
                  args.timeout)
    compile_timed("conv precision='high'", jax.lax.Precision.HIGH,
                  args.timeout)
    if not args.pathological:
        print("control done; pass --pathological to attempt the "
              "'highest' conv (read the docstring first)")
        return 0
    s = compile_timed("conv precision='highest'",
                      jax.lax.Precision.HIGHEST, args.timeout)
    return 0 if s is not None else 1


if __name__ == "__main__":
    sys.exit(main())
