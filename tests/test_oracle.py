"""Cross-framework numerics oracles (reference keeps PyTorch scripts
tests/gan_tests.py + gan_mnist.py as ground truth; here torch-CPU checks
the conv/linear/pool/batchnorm forward paths and standard gradients).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tensorforth_tpu.nn import funcs  # noqa: E402


def _rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_conv_forward_matches_torch():
    import jax
    x = _rand(2, 8, 8, 3, seed=1)
    w = _rand(3, 3, 3, 5, seed=2)          # [C1,K,K,C0] reference layout
    b = _rand(5, seed=3)
    # f32-strict comparison: pin HIGHEST locally (the strict suite's
    # global is 'high' = 3-pass bf16, ~3e-4 conv error; this op size
    # compiles fine at HIGHEST)
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(funcs._conv_fwd(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 1, 1))
    tw = torch.tensor(w).permute(3, 0, 1, 2)        # [C0,C1,K,K]
    ty = F.conv2d(torch.tensor(x).permute(0, 3, 1, 2), tw,
                  torch.tensor(b), stride=1, padding=1)
    ref = ty.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_dconv_forward_matches_torch():
    import jax
    x = _rand(2, 4, 4, 3, seed=4)
    w = _rand(3, 4, 4, 6, seed=5)          # [C1,K,K,C0], K=4 S=2 P=1
    b = np.zeros(6, np.float32)
    with jax.default_matmul_precision("highest"):   # see conv test above
        ours = np.asarray(funcs._dconv_fwd(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 2, 1))
    tw = torch.tensor(w).permute(0, 3, 1, 2)        # [C1,C0,K,K]
    ty = F.conv_transpose2d(torch.tensor(x).permute(0, 3, 1, 2), tw,
                            stride=2, padding=1)
    ref = ty.permute(0, 2, 3, 1).numpy()
    assert ours.shape == ref.shape == (2, 8, 8, 6)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_linear_forward_matches_torch():
    x = _rand(4, 16, seed=6)
    w = _rand(8, 16, seed=7)
    b = _rand(8, seed=8)
    ours = np.asarray(funcs._linear_fwd(jnp.asarray(x), jnp.asarray(w),
                                        jnp.asarray(b)))
    ref = F.linear(torch.tensor(x), torch.tensor(w), torch.tensor(b)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_maxpool_matches_torch():
    x = _rand(2, 8, 8, 4, seed=9)
    from tensorforth_tpu.nn.ntypes import Layer
    ours = np.asarray(funcs._pool_fwd(Layer.MAXPOOL, jnp.asarray(x), 2))
    ref = F.max_pool2d(torch.tensor(x).permute(0, 3, 1, 2), 2
                       ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_batchnorm_matches_torch():
    x = _rand(4, 6, 6, 3, seed=10)
    g = _rand(3, seed=11)
    b = _rand(3, seed=12)
    y, _, _ = funcs._batchnorm_fwd(jnp.asarray(x), jnp.asarray(g),
                                   jnp.asarray(b))
    tx = torch.tensor(x).permute(0, 3, 1, 2)
    ref = F.batch_norm(tx, None, None, torch.tensor(g), torch.tensor(b),
                       training=True, eps=1e-6
                       ).permute(0, 2, 3, 1).numpy()
    # our rvar = 1/(sqrt(var)+eps) vs torch 1/sqrt(var+eps): tolerance
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-3, atol=1e-3)


def test_layernorm_matches_torch():
    x = _rand(2, 4, 8, 1, seed=11)                 # [N,S,E,1] tokens
    g = _rand(8, seed=12)
    b = _rand(8, seed=13)
    ours = np.asarray(funcs._lnorm_fwd(jnp.asarray(x), jnp.asarray(g),
                                       jnp.asarray(b), 1e-5))
    ref = F.layer_norm(torch.tensor(x).reshape(2, 4, 8), (8,),
                       torch.tensor(g), torch.tensor(b),
                       eps=1e-5).numpy().reshape(2, 4, 8, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_linear_grads_match_torch_autograd():
    """linear dW/dB/dX where reference semantics == standard math"""
    x = _rand(4, 8, seed=13)
    w = _rand(5, 8, seed=14)
    dy = _rand(4, 5, seed=15)
    tx = torch.tensor(x, requires_grad=True)
    tw = torch.tensor(w, requires_grad=True)
    tb = torch.zeros(5, requires_grad=True)
    y = F.linear(tx, tw, tb)
    y.backward(torch.tensor(dy))
    # ours (explicit formulas in funcs.get_backward)
    dW = dy.T @ x
    dB = dy.sum(axis=0)
    dX = dy @ w
    np.testing.assert_allclose(dW, tw.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(dB, tb.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(dX, tx.grad.numpy(), rtol=1e-4, atol=1e-5)


def test_conv_grads_match_torch_autograd():
    x = _rand(2, 6, 6, 2, seed=16)
    w = _rand(2, 3, 3, 4, seed=17)
    b = np.zeros(4, np.float32)
    dy = _rand(2, 6, 6, 4, seed=18)

    f = lambda x_, w_, b_: funcs._conv_fwd(x_, w_, b_, 1, 1)
    _, vjp = jax.vjp(f, jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    dx, dw, db = vjp(jnp.asarray(dy))

    tx = torch.tensor(x, requires_grad=True)
    tw0 = torch.tensor(w, requires_grad=True)
    ty = F.conv2d(tx.permute(0, 3, 1, 2),
                  tw0.permute(3, 0, 1, 2), None, 1, 1)
    ty.backward(torch.tensor(dy).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(dx), tx.grad.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), tw0.grad.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db), dy.sum((0, 1, 2)),
                               rtol=1e-4, atol=1e-4)
