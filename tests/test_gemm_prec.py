"""Precision-class machinery of the Pallas GEMM kernels (r4).

Round-4 find: Mosaic only lowers in-kernel dots at DEFAULT and HIGHEST;
the HIGH (3-pass bf16x3) setting raises NotImplementedError.  An
unpinned ``jnp.dot`` inside a kernel therefore CRASHED every Pallas
GEMM/attention kernel whenever T4_PRECISION=strict set the process
default to 'high' — and, conversely, the default-precision build's
"f32-strict" gemm3 label was wrong (its dot silently lowered to
single-pass bf16, err ~3e-3 vs an f64 oracle at 1024^3; genuine f32 is
~2e-7).  ops/gemm_pallas.py now pins every kernel dot and resolves an
explicit class ('default' | '3pass' | 'highest'); these tests pin the
resolution logic and the numerics of each class (interpret mode, CPU).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorforth_tpu.ops.gemm_pallas import _kdot, _mm_pallas, _prec_class


def _rand(m, n, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((m, n)), jnp.float32)


def test_prec_class_resolution():
    """the strict-mode global ('high') must map onto the manual 3-pass
    class, 'highest' onto the pinned-HIGHEST class"""
    assert _prec_class() == "default"        # suite runs unstricted
    with jax.default_matmul_precision("high"):
        assert _prec_class() == "3pass"
    with jax.default_matmul_precision("BF16_BF16_F32_X3"):
        assert _prec_class() == "3pass"
    with jax.default_matmul_precision("highest"):
        assert _prec_class() == "highest"
    with jax.default_matmul_precision("float32"):
        assert _prec_class() == "highest"
    with jax.default_matmul_precision("bfloat16"):
        assert _prec_class() == "default"
    assert _prec_class() == "default"


def test_kdot_3pass_is_f32_class():
    """the manual bf16x3 split-accumulate must land in the f32 accuracy
    class (~1e-5 of an f64 oracle), far tighter than single-pass bf16
    (~3e-3) — the r4 TPU capture measured 5.0e-06 at 1024^3 vs 1.53e-05
    for the XLA 'high' dot"""
    a, b = _rand(256, 384, 1), _rand(384, 256, 2)
    ref = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    scale = np.max(np.abs(ref))

    got = np.asarray(_kdot(a, b, "3pass"), np.float64)
    err3 = np.max(np.abs(got - ref)) / scale
    assert err3 < 2e-5, err3

    # the decomposition really drops to the bf16 class when the low
    # parts are discarded — guards against the split silently becoming
    # a plain f32 dot on CPU (where DEFAULT doesn't truncate)
    ah = a.astype(jnp.bfloat16).astype(jnp.float32)
    bh = b.astype(jnp.bfloat16).astype(jnp.float32)
    err1 = np.max(np.abs(
        np.asarray(_kdot(ah, bh, "3pass"), np.float64) - ref)) / scale
    assert err1 > 5 * err3, (err1, err3)


@pytest.mark.parametrize("prec,tol", [("default", 5e-5),
                                      ("3pass", 2e-5),
                                      ("highest", 5e-6)])
def test_mm_pallas_classes_interpret(prec, tol):
    """each class's kernel, run through the Pallas interpreter, must
    match the f64 oracle within its class tolerance (on CPU the
    interpreter's DEFAULT dot is full f32, so 'default' is tight here
    too — the class split is exercised for lowering + numerics shape,
    the REAL truncation class is pinned on TPU by scripts/sweep logs
    and the strict-mode example runs)"""
    a, b = _rand(300, 200, 3), _rand(200, 260, 4)
    ref = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    scale = np.max(np.abs(ref))
    got = np.asarray(_mm_pallas(a, b, 128, 128, 128, prec=prec,
                                interpret=True), np.float64)
    err = np.max(np.abs(got - ref)) / scale
    assert err < tol, (prec, err)


def test_strict_mode_dispatch_compiles_interpret():
    """under the strict global ('high'), mm_pallas's variant-3 tile
    dispatch must resolve to the 3pass class and still build — the r4
    regression was a NotImplementedError at trace time"""
    from tensorforth_tpu.ops import gemm_pallas as gp
    a, b = _rand(512, 512, 5), _rand(512, 512, 6)
    with jax.default_matmul_precision("high"):
        assert gp._prec_class() == "3pass"
        got = np.asarray(gp._mm_pallas(a, b, 512, 512, 512, prec="3pass",
                                       interpret=True))
    ref = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert err < 2e-5, err
