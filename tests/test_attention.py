"""Attention tier tests (extension: the reference roadmap's Transformer
tier, realized TPU-first with nn.attn + a Pallas flash core)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorforth_tpu.nn import funcs

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _mha_ref(x, wqkv, wo, heads):
    """torch oracle for _mha_fwd"""
    n, s, e, _ = x.shape
    dh = e // heads
    tx = torch.tensor(x.reshape(n, s, e))
    qkv = tx @ torch.tensor(wqkv).T
    qkv = qkv.reshape(n, s, 3, heads, dh)
    q, k, v = (qkv[:, :, i].transpose(1, 2) for i in range(3))
    o = F.scaled_dot_product_attention(q, k, v)
    o = o.transpose(1, 2).reshape(n, s, e)
    return (o @ torch.tensor(wo).T).numpy().reshape(n, s, e, 1)


def test_mha_matches_torch_sdpa():
    rng = np.random.RandomState(0)
    n, s, e, h = 2, 8, 16, 4
    x = rng.randn(n, s, e, 1).astype(np.float32)
    wqkv = (rng.randn(3 * e, e) * 0.1).astype(np.float32)
    wo = (rng.randn(e, e) * 0.1).astype(np.float32)
    ours = np.asarray(funcs._mha_fwd(jnp.asarray(x), jnp.asarray(wqkv),
                                     jnp.asarray(wo), h, flash=False))
    ref = _mha_ref(x, wqkv, wo, h)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_attn_word_and_model(t4):
    out = t4.forth("""4 8 16 1 nn.model
4 nn.attn tanh
flatten 10 linear softmax
network""")
    assert "attn" in out and "heads=4" in out
    assert "T4[4,8,16,1]" in out
    t4.forth("4 8 16 1 tensor randn forward")
    out = t4.forth("-1 n@ sum .")
    assert "4 " in out                        # 4 softmax rows


def test_attn_backprop_and_adam(t4):
    t4.forth("""2 4 8 1 nn.model
2 nn.attn
flatten 2 linear softmax
constant am""")
    t4.forth("am 2 4 8 1 tensor randn forward")
    t4.forth("4 vector{ 1 0 0 1 } 2 1 2 1 reshape4 backprop")
    out = t4.forth("0 nn.dw sum abs 0 max .")     # gradient is nonzero
    v = float(out.split()[0])
    assert v != 0.0
    t4.forth("0.001 nn.adam")
    out = t4.forth("0 nn.dw sum .")
    assert "0 " in out                            # zeroed after step


def test_tiny_transformer_learns():
    from tensorforth_tpu.models import tiny_transformer
    from tensorforth_tpu.parallel.trainer import (make_train_step,
                                                  init_opt_state)
    m = tiny_transformer(batch=16, seq=8, dim=16, heads=4, classes=4,
                         layers=1)
    program = m._program()
    params = m._params()
    opt = init_opt_state(params)
    step = make_train_step(program, loss="ce", lr=3e-3)
    rng = np.random.RandomState(1)
    protos = rng.randn(4, 8, 16, 1).astype(np.float32)
    lbl = rng.randint(0, 4, 16)
    x = jnp.asarray(protos[lbl] + rng.randn(16, 8, 16, 1) * 0.05,
                    jnp.float32)
    y = jax.nn.one_hot(jnp.asarray(lbl), 4).reshape(16, 1, 4, 1)
    losses = []
    for i in range(25):
        params, opt, l = step(params, opt, x, y, jax.random.PRNGKey(i))
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.5, f"no learning: {losses[::6]}"


def test_causal_attention_matches_torch():
    rng = np.random.RandomState(9)
    n, s, e, h = 2, 8, 16, 4
    x = rng.randn(n, s, e, 1).astype(np.float32)
    wqkv = (rng.randn(3 * e, e) * 0.1).astype(np.float32)
    wo = (rng.randn(e, e) * 0.1).astype(np.float32)
    ours = np.asarray(funcs._mha_fwd(jnp.asarray(x), jnp.asarray(wqkv),
                                     jnp.asarray(wo), h, flash=False,
                                     causal=True))
    dh = e // h
    tx = torch.tensor(x.reshape(n, s, e))
    qkv = (tx @ torch.tensor(wqkv).T).reshape(n, s, 3, h, dh)
    q, k, v = (qkv[:, :, i].transpose(1, 2) for i in range(3))
    o = F.scaled_dot_product_attention(q, k, v, is_causal=True)
    ref = ((o.transpose(1, 2).reshape(n, s, e)) @ torch.tensor(wo).T
           ).numpy().reshape(n, s, e, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_causal_word(t4):
    out = t4.forth("""4 8 16 1 nn.model
1 4 nn.attn
network""")
    assert "causal" in out
    t4.forth("4 8 16 1 tensor randn forward")
    out = t4.forth("-1 n@ sum abs 0 max .")
    assert "-> ok" in out


def test_flash_kernel_interpret_matches_einsum(t4):
    """the Pallas flash kernel (interpret mode, CPU-testable) must match
    the exact softmax-attention einsum — non-causal and causal"""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tensorforth_tpu.ops.attn_pallas import flash_attention

    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    b, s, dh = 2, 512, 128
    q = jax.random.normal(ks[0], (b, s, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, dh), jnp.float32)

    def ref(causal):
        # f32-strict reference: pin HIGHEST so the comparison target is
        # exact regardless of the suite's global precision class
        with jax.default_matmul_precision("highest"):
            sc = jnp.einsum("nqd,nkd->nqk", q, k) / jnp.sqrt(jnp.float32(dh))
            if causal:
                qi = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
                ki = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
                sc = jnp.where(ki <= qi, sc, -1.0e30)
            w = jax.nn.softmax(sc, axis=-1)
            return jnp.einsum("nqk,nkd->nqd", w, v)

    for causal in (False, True):
        # interpret mode lowers the kernel's dots to XLA ops, which
        # inherit the ambient precision — pin HIGHEST to match the
        # reference (the real Mosaic kernel does true f32 dots)
        with jax.default_matmul_precision("highest"):
            got = flash_attention(q, k, v, causal=causal, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref(causal)),
            rtol=2e-5, atol=2e-5,
            err_msg=f"flash(causal={causal}) != reference softmax attn")


def test_flash_backward_interpret_matches_autodiff(t4):
    """flash_attention_bwd (interpret mode) must match jax.grad of the
    exact einsum attention — non-causal and causal"""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tensorforth_tpu.nn.funcs import _sdpa_ref
    from tensorforth_tpu.ops.attn_pallas import (flash_attention,
                                                 flash_attention_bwd)

    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    b, s, dh = 2, 512, 128
    q = jax.random.normal(ks[0], (b, s, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, dh), jnp.float32)
    do = jax.random.normal(ks[3], (b, s, dh), jnp.float32)

    for causal in (False, True):
        o, lse = flash_attention(q, k, v, causal=causal,
                                 return_lse=True, interpret=True)
        dq, dk, dv = flash_attention_bwd(q, k, v, o, lse, do,
                                         causal=causal, interpret=True)
        _, vjp = jax.vjp(lambda q_, k_, v_: _sdpa_ref(q_, k_, v_, causal),
                         q, k, v)
        wq, wk, wv = vjp(do)
        for got, want, nm in ((dq, wq, "dq"), (dk, wk, "dk"),
                              (dv, wv, "dv")):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4,
                err_msg=f"flash bwd {nm} (causal={causal})")


def test_flash_hybrid_interpret_close_to_f32(t4):
    """hybrid=True (bf16 multiplicands, f32 softmax/accumulate) must
    stay within bf16 tolerance of the exact attention, forward and
    backward (VERDICT r2 #8)"""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tensorforth_tpu.nn.funcs import _sdpa_ref
    from tensorforth_tpu.ops.attn_pallas import (flash_attention,
                                                 flash_attention_bwd)

    ks = jax.random.split(jax.random.PRNGKey(13), 4)
    b, s, dh = 2, 512, 128
    q = jax.random.normal(ks[0], (b, s, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, dh), jnp.float32)
    do = jax.random.normal(ks[3], (b, s, dh), jnp.float32)

    for causal in (False, True):
        want = np.asarray(_sdpa_ref(q, k, v, causal))
        o, lse = flash_attention(q, k, v, causal=causal, return_lse=True,
                                 interpret=True, hybrid=True)
        # attention outputs are softmax-convex combos of v (|v|~1):
        # bf16 multiplicands give ~1e-2 abs agreement
        np.testing.assert_allclose(np.asarray(o), want, atol=3e-2,
                                   err_msg=f"hybrid fwd causal={causal}")
        dq, dk, dv = flash_attention_bwd(q, k, v, o, lse, do,
                                         causal=causal, interpret=True,
                                         hybrid=True)
        _, vjp = jax.vjp(lambda q_, k_, v_: _sdpa_ref(q_, k_, v_, causal),
                         q, k, v)
        wq, wk, wv = vjp(do)
        for got, w, nm in ((dq, wq, "dq"), (dk, wk, "dk"), (dv, wv, "dv")):
            err = np.max(np.abs(np.asarray(got) - np.asarray(w)))
            scale = np.max(np.abs(np.asarray(w))) + 1e-9
            assert err / scale < 0.05, \
                f"hybrid bwd {nm} causal={causal}: rel err {err/scale:.3g}"


def test_flash_lse_wrapper_grad_matches_autodiff(t4):
    """flash_attention_lse (the ring-attention chunk core) must be
    differentiable in BOTH outputs: the lse cotangent folds into the
    backward kernels' delta stream (ds = p·(dp − (δ − dlse))).  Pin
    against jax.grad of the exact einsum (o, lse) computation with a
    loss that touches o AND lse — this is the path a real sp>=2 ring
    topology trains through (raw pallas_call has no autodiff rule)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tensorforth_tpu.ops.attn_pallas import flash_attention_lse

    ks = jax.random.split(jax.random.PRNGKey(17), 3)
    b, s, dh = 2, 512, 128
    q = jax.random.normal(ks[0], (b, s, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, dh), jnp.float32)

    def ref_pair(q_, k_, v_, causal):
        sc = jnp.einsum("nqd,nkd->nqk", q_, k_,
                        preferred_element_type=jnp.float32)
        sc = sc / jnp.sqrt(jnp.float32(dh))
        if causal:
            qi = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
            ki = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
            sc = jnp.where(ki <= qi, sc, -1.0e30)
        lse = jax.scipy.special.logsumexp(sc, axis=-1)
        o = jnp.einsum("nqk,nkd->nqd", jax.nn.softmax(sc, axis=-1), v_,
                       preferred_element_type=jnp.float32)
        return o, lse

    def loss(pair_fn):
        def f(q_, k_, v_):
            o, lse = pair_fn(q_, k_, v_)
            # touch both outputs: dlse is a dense nonzero cotangent
            return jnp.sum(o ** 2) + jnp.sum(jnp.sin(lse))
        return f

    for causal in (False, True):
        got = jax.grad(loss(
            lambda q_, k_, v_: flash_attention_lse(
                q_, k_, v_, causal, False, True)),    # interpret mode
            argnums=(0, 1, 2))(q, k, v)
        want = jax.grad(loss(
            lambda q_, k_, v_: ref_pair(q_, k_, v_, causal)),
            argnums=(0, 1, 2))(q, k, v)
        for g, w, nm in zip(got, want, ("dq", "dk", "dv")):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=3e-4, atol=3e-4,
                err_msg=f"lse-wrapper grad {nm} (causal={causal})")


def test_fit_block_divides_all_eligible_shapes():
    """default block sizes must DIVIDE s for every flash-eligible shape
    (s%256==0, s>=512): the grids floor-divide, so a non-dividing
    default would silently skip whole KV/Q blocks — wrong gradients on
    the TPU training path (ADVICE r4 high)."""
    from tensorforth_tpu.ops.attn_pallas import _fit_block

    for s in range(512, 8192 + 1, 256):
        for pref in (512, 1024, 2048):
            d = _fit_block(s, pref)
            assert s % d == 0 and d <= pref and d % 256 == 0, (s, pref, d)
    assert _fit_block(2048, 1024) == 1024     # keeps the sweep winners
    assert _fit_block(2048, 512) == 512
    assert _fit_block(1536, 1024) == 768      # non-pow2 divisor beats 512
    assert _fit_block(2560, 1024) == 512
    assert _fit_block(768, 512) == 256   # walks 256-lane steps: 512 fails, 256 divides


def test_flash_default_blocks_odd_seq_fwd_bwd(t4):
    """S=1536: flash-eligible but indivisible by the r4 sweep-winner
    blocks (1024q/512kv bwd, 1024 causal fwd).  Defaults must adapt and
    produce exact results end-to-end (ADVICE r4 high+medium)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tensorforth_tpu.nn.funcs import _sdpa_ref
    from tensorforth_tpu.ops.attn_pallas import (flash_attention,
                                                 flash_attention_bwd)

    ks = jax.random.split(jax.random.PRNGKey(17), 4)
    b, s, dh = 1, 1536, 128
    q = jax.random.normal(ks[0], (b, s, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, dh), jnp.float32)
    do = jax.random.normal(ks[3], (b, s, dh), jnp.float32)

    for causal in (False, True):
        with jax.default_matmul_precision("highest"):
            o, lse = flash_attention(q, k, v, causal=causal,
                                     return_lse=True, interpret=True)
            want_o = _sdpa_ref(q, k, v, causal)
        np.testing.assert_allclose(np.asarray(o), np.asarray(want_o),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"S=1536 fwd causal={causal}")
        dq, dk, dv = flash_attention_bwd(q, k, v, o, lse, do,
                                         causal=causal, interpret=True)
        _, vjp = jax.vjp(lambda q_, k_, v_: _sdpa_ref(q_, k_, v_, causal),
                         q, k, v)
        for got, want, nm in zip((dq, dk, dv), vjp(do), ("dq", "dk", "dv")):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4,
                err_msg=f"S=1536 bwd {nm} (causal={causal})")


def test_flash_backward_fused_matches_two_kernel(t4):
    """the single-kernel 5-dot backward (flash_attention_bwd_fused) must
    match the shipping two-kernel split bit-for-bit in structure terms
    (same recompute math, same block sizes) — non-causal and causal,
    with and without a dlse cotangent, at a multi-q-block shape so the
    partial reduce axis is exercised (VERDICT r4 next #9)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tensorforth_tpu.ops.attn_pallas import (
        flash_attention, flash_attention_bwd, flash_attention_bwd_fused)

    ks = jax.random.split(jax.random.PRNGKey(23), 5)
    b, s, dh = 2, 1024, 128            # bq=512 default -> n_q=2 partials
    q = jax.random.normal(ks[0], (b, s, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, dh), jnp.float32)
    do = jax.random.normal(ks[3], (b, s, dh), jnp.float32)
    dlse = jax.random.normal(ks[4], (b, s), jnp.float32) * 0.1

    for causal in (False, True):
        for dl in (None, dlse):
            o, lse = flash_attention(q, k, v, causal=causal,
                                     return_lse=True, interpret=True)
            want = flash_attention_bwd(q, k, v, o, lse, do, bq=256,
                                       bkv=256, causal=causal,
                                       interpret=True, dlse=dl)
            got = flash_attention_bwd_fused(q, k, v, o, lse, do, bq=256,
                                            bkv=256, causal=causal,
                                            interpret=True, dlse=dl)
            for g, w, nm in zip(got, want, ("dq", "dk", "dv")):
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-5,
                    err_msg=f"fused bwd {nm} (causal={causal}, "
                            f"dlse={'y' if dl is not None else 'n'})")
