"""tensorforth_tpu — a TPU-native rebuild of the tensorForth framework.

An interactive Forth REPL whose data stack holds F32 scalars *and* TPU
tensor objects.  Three stacked VM tiers provide:

  1. a full eForth interpreter/compiler (dictionary, colon words,
     control flow) running on the host,
  2. NumPy/SciPy-tier tensor & linear-algebra words (matmul, GEMM,
     LU/Gauss-Jordan inverse, solve, det, transpose) dispatching
     jitted XLA ops and hand-written Pallas kernels on TPU,
  3. PyTorch-tier NN words (model container, conv2d/linear/pool/
     batchnorm/upsample layers, backprop, SGD/Adam/AdamW, MNIST/
     CIFAR-10 loaders, TensorBoard event output).

Reference behavior: chochain/tensorForth (CUDA).  This package is a
ground-up TPU-first redesign, not a port: device compute goes through
JAX/XLA/Pallas; the host runtime (interpreter, dictionary, arena
accounting, event formats) mirrors the reference's observable
semantics (see SURVEY.md for the file-by-file parity map).
"""

__version__ = "0.1.0"

import os as _os

from .config import Config  # noqa: F401

if Config.PRECISION == "strict":
    # f32-class matmuls framework-wide (reference-parity mode on TPU;
    # the default 'fast' keeps the XLA bf16-multiplicand class for the
    # NN training tier).  'high' = 3-pass bf16 — f32-class accuracy
    # with sane compiles; 'highest' makes the tunneled backend's conv
    # compiles pathological (>9 min for ONE 3x3 conv, measured r3).
    # The word-tier matmuls/linalg pin Precision.HIGHEST explicitly
    # (ops/engine.py, ops/linalg.py) — no convs there, so they are
    # unaffected.  Env var covers a not-yet-imported jax; the config
    # update covers one imported earlier.
    # respect an explicit user override of the class (e.g. a user
    # forcing true-f32 NN training accepts the conv-compile cost)
    _lvl = _os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "high")
    try:
        import jax as _jax
        _jax.config.update("jax_default_matmul_precision", _lvl)
    except Exception:                                  # noqa: BLE001
        pass


def repl(*args, **kw):
    from .cli import main
    return main(*args, **kw)
