"""Pure jitted NN compute — whole-network forward, backward, optimizer
and loss functions.

TPU-first redesign of the reference's per-layer CUDA kernel launches
(src/nn/forward.cu, backprop.cu, gradient.cu, nmath.{cu,tcu}): the whole
network is traced into ONE XLA executable per (program, batch-shape)
signature — convolutions run as MXU conv HLOs, elementwise activations
fuse into their producers, and the interpreter pays one dispatch per
``forward``/``backprop``/optimizer word instead of one per layer.

Reference-semantics notes (verified against examples/t4_30b/c expected
values — these are behavioral contracts, not bugs to fix):

  * backprop treats SIGMOID/SOFTMAX/LOGSMAX as pass-through everywhere
    (loss-fusion trick, backprop.cu:97-131), and a LINEAR that is the
    final layer is also pass-through with no weight gradient.
  * activation backward multiplies by the derivative mask saved during
    forward (k_activate writes out AND mask in one pass).
  * SELU forward does not scale the positive branch (nmath.cu:55-57).
  * dropout masks at rate p keep u>p elements with NO 1/(1-p) rescale,
    and dropout stays active in test mode.
  * SGD divides dW by the weight tensor's leading dim (gradient.cu:137
    passes g.N(): 1 for linear [1,E0,E1,1], C1 for conv filters).
  * Adam applies no bias correction and no batch division
    (nmath.cu:439-455).
  * batchnorm dgamma/dbeta accumulate channel MEANs (k_dbatchnorm_2).

Deviations (documented): LOGSMAX uses the mathematically correct
x-logsumexp (reference exponentiates first, nmath/forward.cu:245-259);
ADAMW uses proper decoupled weight decay; DCONV backward computes full
gradients (reference's reuses the forward kernel and learns nothing).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from .ntypes import Layer

SELU_L = 1.0507009873554805
SELU_LA = SELU_L * 1.6732632423543772
BN_EPS = 1.0e-6                  # reference DU_EPS in k_batchnorm_2
LN_CLAMP = 1.0e-12


# ===========================================================================
# per-layer forward primitives
# ===========================================================================
def _conv_fwd(x, w, b, S, P):
    """x NHWC, w [C1,K,K,C0] (reference filter layout), stride S, pad P"""
    k = jnp.transpose(w, (1, 2, 0, 3))                 # HWIO
    y = jax.lax.conv_general_dilated(
        x, k, (S, S), ((P, P), (P, P)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y + b


def _dconv_fwd(x, w, b, S, P):
    """transposed conv (ConvTranspose2d C1->C0, K=4 S=2 P=1 => 2x size)"""
    k = jnp.transpose(w, (1, 2, 0, 3))
    y = jax.lax.conv_general_dilated(
        x, jnp.flip(k, (0, 1)),
        (1, 1),
        padding=((k.shape[0] - 1 - P,) * 2, (k.shape[1] - 1 - P,) * 2),
        lhs_dilation=(S, S),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y + b


def _linear_fwd(x, w, b):
    """y[N,E0] = x[N,E1] @ w^T[E1,E0] + b (reference _flinear)"""
    n = x.shape[0]
    return jnp.dot(x.reshape(n, -1), w.T,
                   preferred_element_type=jnp.float32) + b


def _activate_fwd(kind, x, alpha):
    """returns (y, derivative-mask) — reference k_activate"""
    if kind == Layer.RELU:
        m = (x > 0.0).astype(jnp.float32)
        return x * m, m
    if kind == Layer.TANH:
        t = jnp.tanh(x)
        return t, 1.0 - t * t
    if kind == Layer.SIGMOID:
        s = jax.nn.sigmoid(x)
        return s, s * (1.0 - s)
    if kind == Layer.SELU:
        neg_f = SELU_LA * jnp.exp(jnp.minimum(x, 0.0))
        y = jnp.where(x > 0.0, x, neg_f - SELU_LA)
        m = jnp.where(x > 0.0, SELU_L, neg_f)
        return y, m
    if kind == Layer.LEAKYRL:
        m = jnp.where(x > 0.0, 1.0, alpha)
        return x * m, m
    if kind == Layer.ELU:
        neg_f = alpha * jnp.exp(jnp.minimum(x, 0.0))
        y = jnp.where(x > 0.0, x, neg_f - alpha)
        m = jnp.where(x > 0.0, 1.0, neg_f)
        return y, m
    raise ValueError(kind)


def _dropout_fwd(x, rate, key):
    u = jax.random.uniform(key, x.shape, dtype=jnp.float32)
    m = (u > rate).astype(jnp.float32)
    return x * m, m


def _softmax_fwd(x):
    """softmax over the feature axis (W*C) per (N, H) position —
    identical to the reference's whole-sample softmax for its
    [N,1,classes,1] classifier heads (H==1), and per-position for
    sequence outputs [N,S,V,1] (the LM/serving tier)"""
    n, h = x.shape[0], (x.shape[1] if x.ndim == 4 else 1)
    f = x.reshape(n, h, -1)
    return jax.nn.softmax(f, axis=-1).reshape(x.shape)


def _logsoftmax_fwd(x):
    n, h = x.shape[0], (x.shape[1] if x.ndim == 4 else 1)
    f = x.reshape(n, h, -1)
    return jax.nn.log_softmax(f, axis=-1).reshape(x.shape)


def _pool_fwd(kind, x, k):
    """kxk pool, stride k, ceil-mode (reference k_pool, H0=(H+k-1)/k)"""
    n, h, w, c = x.shape
    h0, w0 = -(-h // k), -(-w // k)
    pad = ((0, 0), (0, h0 * k - h), (0, w0 * k - w), (0, 0))
    wdims, wstr = (1, k, k, 1), (1, k, k, 1)
    if kind == Layer.MAXPOOL:
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, wdims, wstr, pad)
    if kind == Layer.MINPOOL:
        return jax.lax.reduce_window(x, jnp.inf, jax.lax.min, wdims, wstr, pad)
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, wdims, wstr, pad)
    return s / (k * k)


def _upsample_fwd(x, k):
    """nearest-neighbour k-x upsampling"""
    return jnp.repeat(jnp.repeat(x, k, axis=1), k, axis=2)


def rope_apply(x, pos):
    """rotary position embedding (RoPE, Su et al. 2021) on q/k heads:
    x [..., S, dh] rotated pairwise by angle pos * 10000^(-2i/dh)
    (half-split convention); pos [S] absolute positions"""
    dh = x.shape[-1]
    half = dh // 2
    inv = 10000.0 ** (-2.0 * jnp.arange(half, dtype=jnp.float32) / dh)
    ang = pos.astype(jnp.float32)[:, None] * inv[None, :]   # [S, half]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin,
                            x1 * sin + x2 * cos], axis=-1)


def _flash_ok(s: int, dh: int) -> bool:
    return (s >= 512 and s % 256 == 0 and dh % 128 == 0
            and jax.default_backend() == "tpu")


def _attn_hybrid() -> bool:
    """T4_ATTN_HYBRID=1 opts the ATTN flash path into bf16-multiplicand
    dots (f32 softmax/accumulate — the v8 GEMM treatment, ~2x MXU rate;
    VERDICT r2 #8).  Default off: the word-path numerics contract stays
    strict-f32 unless the user opts in."""
    import os
    return os.environ.get("T4_ATTN_HYBRID", "0") == "1"


def _sdpa_ref(q, k, v, causal):
    """exact softmax attention, [B, S, dh] (XLA path / flash oracle)"""
    s, dh = q.shape[1], q.shape[2]
    sc = jnp.einsum("nqd,nkd->nqk", q, k,
                    preferred_element_type=jnp.float32)
    sc = sc / jnp.sqrt(jnp.float32(dh))
    if causal:
        qi = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        ki = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        sc = jnp.where(ki <= qi, sc, -1.0e30)
    w = jax.nn.softmax(sc, axis=-1)
    return jnp.einsum("nqk,nkd->nqd", w, v,
                      preferred_element_type=jnp.float32)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def sdpa(q, k, v, causal: bool = False):
    """softmax-attention core with flash FORWARD AND BACKWARD Pallas
    kernels for long aligned sequences (S x S never hits HBM in either
    direction); ineligible shapes use the fused XLA einsum path"""
    return _sdpa_fwd_rule(q, k, v, causal)[0]


def _sdpa_fwd_rule(q, k, v, causal):
    _, s, dh = q.shape
    if _flash_ok(s, dh):
        from ..ops.attn_pallas import flash_attention
        o, lse = flash_attention(q, k, v, causal=causal, return_lse=True,
                                 hybrid=_attn_hybrid())
        return o, (q, k, v, o, lse)
    o = _sdpa_ref(q, k, v, causal)
    return o, (q, k, v, None, None)


def _sdpa_bwd_rule(causal, res, g):
    q, k, v, o, lse = res
    _, s, dh = q.shape
    if lse is not None:
        from ..ops.attn_pallas import flash_attention_bwd
        return flash_attention_bwd(q, k, v, o, lse, g, causal=causal,
                                   hybrid=_attn_hybrid())
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _sdpa_ref(q_, k_, v_, causal), q, k, v)
    return vjp(g)


sdpa.defvjp(_sdpa_fwd_rule, _sdpa_bwd_rule)


def _mha_fwd(x, wqkv, wo, heads: int, flash: bool = True,
             causal: bool = False, rope: bool = False):
    """multi-head self-attention layer: x [N, S, E, 1], wqkv [3E, E],
    wo [E, E] -> [N, S, E, 1].  Long aligned sequences route the core
    through the Pallas flash kernels (forward AND backward — sdpa's
    custom vjp); short ones use the fused einsum path — both are exact.

    Extension layer: the reference's roadmap names Transformers as its
    next tier (README.md:702-720); this realizes it TPU-first."""
    n, s, e, _ = x.shape
    dh = e // heads
    xf = x.reshape(n, s, e)
    qkv = jnp.dot(xf, wqkv.T, preferred_element_type=jnp.float32)
    qkv = qkv.reshape(n, s, 3, heads, dh)
    q = jnp.transpose(qkv[:, :, 0], (0, 2, 1, 3))   # [N, h, S, dh]
    k = jnp.transpose(qkv[:, :, 1], (0, 2, 1, 3))
    v = jnp.transpose(qkv[:, :, 2], (0, 2, 1, 3))
    if rope:
        pos = jnp.arange(s)
        q = rope_apply(q, pos)
        k = rope_apply(k, pos)
    core = sdpa if flash else _sdpa_ref
    o = core(q.reshape(n * heads, s, dh),
             k.reshape(n * heads, s, dh),
             v.reshape(n * heads, s, dh), causal)
    o = o.reshape(n, heads, s, dh)
    o = jnp.transpose(o, (0, 2, 1, 3)).reshape(n, s, e)
    out = jnp.dot(o, wo.T, preferred_element_type=jnp.float32)
    return out.reshape(n, s, e, 1)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def attn_op(x, wqkv, wo, heads: int, causal: bool = False,
            rope: bool = False):
    """differentiable MHA: flash forward, XLA-recompute backward"""
    return _mha_fwd(x, wqkv, wo, heads, flash=True, causal=causal,
                    rope=rope)


def _attn_op_fwd(x, wqkv, wo, heads, causal, rope):
    return (_mha_fwd(x, wqkv, wo, heads, flash=True, causal=causal,
                     rope=rope),
            (x, wqkv, wo))


def _attn_op_bwd(heads, causal, rope, res, g):
    # flash=True: the sdpa core supplies the flash BACKWARD kernels for
    # eligible shapes; small shapes differentiate the einsum path
    x, wqkv, wo = res
    _, vjp = jax.vjp(
        lambda x_, w1, w2: _mha_fwd(x_, w1, w2, heads, flash=True,
                                    causal=causal, rope=rope),
        x, wqkv, wo)
    return vjp(g)


attn_op.defvjp(_attn_op_fwd, _attn_op_bwd)


def _moe_fwd(x, w1aug, w2, top_k: int):
    """mixture-of-experts FFN layer: x [N,S,D,1]; w1aug [E,D,F+1] packs
    the experts' w1 [E,D,F] with the router wr [E,D] in the last column
    (keeps the generic 2-slot layer contract); w2 [E,F,D].
    Extension layer (reference roadmap README.md:702-720); the expert
    axis shards over the mesh's 'ep' axis for expert parallelism."""
    import os
    from ..parallel.moe import moe_fwd, moe_fwd_dispatch, moe_select
    n, s, d, _ = x.shape
    f = w1aug.shape[2] - 1
    e = w1aug.shape[0]
    if moe_select((n, s), e, top_k):
        cf = float(os.environ.get("T4_MOE_CAP", "1.25"))
        y = moe_fwd_dispatch(x.reshape(n, s, d), w1aug[:, :, f],
                             w1aug[:, :, :f], w2, top_k,
                             capacity_factor=cf)
    else:
        y = moe_fwd(x.reshape(n, s, d), w1aug[:, :, f],
                    w1aug[:, :, :f], w2, top_k)
    return y.reshape(n, s, d, 1)


def _embed_fwd(x, table, b):
    """token embedding: x [N,S,1,1] float ids -> [N,S,E,1]
    (extension layer — the LM/serving tier's vocabulary lookup;
    gather forward, scatter-add gradient via jax autodiff)"""
    n, s = x.shape[0], x.shape[1]
    ids = x.reshape(n, s).astype(jnp.int32)
    e = table.shape[1]
    return (table[ids] + b).reshape(n, s, e, 1)


def _proj_fwd(x, w, b):
    """position-wise projection: x [N,S,E,1] @ w^T [E,V] + b -> [N,S,V,1]
    (the LM head; contrast LINEAR, which flattens the whole sample)"""
    n, s, e, _ = x.shape
    y = jnp.dot(x.reshape(n, s, e), w.T,
                preferred_element_type=jnp.float32) + b
    return y.reshape(n, s, -1, 1)


def _lnorm_fwd(x, gamma, beta, eps: float):
    """layer normalization over the feature axis (W*C) per (N, H)
    position: x [N,H,W,C] -> same shape (extension layer — the
    transformer-tier norm; gamma/beta [W*C])"""
    n, h, w, c = x.shape
    f = x.reshape(n, h, w * c)
    mean = jnp.mean(f, axis=-1, keepdims=True)
    var = jnp.mean((f - mean) ** 2, axis=-1, keepdims=True)
    xhat = (f - mean) / jnp.sqrt(var + eps)
    return (xhat * gamma + beta).reshape(x.shape)


def _batchnorm_fwd(x, gamma, beta):
    """train-mode BN; rvar = 1/(sqrt(pop-var)+eps) (reference k_batchnorm_2)"""
    mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
    var = jnp.mean(x * x, axis=(0, 1, 2), keepdims=True) - mean * mean
    rvar = 1.0 / (jnp.sqrt(jnp.maximum(var, 0.0)) + BN_EPS)
    xhat = (x - mean) * rvar
    return xhat * gamma + beta, xhat, rvar


# ===========================================================================
# whole-network forward
# ===========================================================================
def _apply_layer(spec, x, p, key):
    kind, opts, out_shape = spec
    if kind == Layer.CONV:
        return _conv_fwd(x, p[0], p[1], opts[0], opts[1]), None
    if kind == Layer.DCONV:
        return _dconv_fwd(x, p[0], p[1], opts[0], opts[1]), None
    if kind == Layer.LINEAR:
        return _linear_fwd(x, p[0], p[1]).reshape(out_shape), None
    if kind == Layer.FLATTEN:
        return x.reshape(out_shape), None
    if kind in (Layer.RELU, Layer.TANH, Layer.SIGMOID, Layer.SELU,
                Layer.LEAKYRL, Layer.ELU):
        y, m = _activate_fwd(kind, x, opts[0])
        return y, m
    if kind == Layer.DROPOUT:
        return _dropout_fwd(x, opts[0], key)
    if kind == Layer.SOFTMAX:
        return _softmax_fwd(x), None
    if kind == Layer.LOGSMAX:
        return _logsoftmax_fwd(x), None
    if kind in (Layer.MAXPOOL, Layer.AVGPOOL, Layer.MINPOOL):
        return _pool_fwd(kind, x, opts[0]), None
    if kind == Layer.BATCHNM:
        y, xhat, rvar = _batchnorm_fwd(x, p[0], p[1])
        return y, (xhat, rvar)
    if kind == Layer.USAMPLE:
        return _upsample_fwd(x, opts[0]), None
    if kind == Layer.ATTN:
        return attn_op(x, p[0], p[1], opts[0],
                       bool(opts[1]) if len(opts) > 1 else False,
                       bool(opts[2]) if len(opts) > 2 else False), None
    if kind == Layer.MOE:
        return _moe_fwd(x, p[0], p[1], opts[2]), None
    if kind == Layer.LNORM:
        return _lnorm_fwd(x, p[0], p[1], opts[0]), None
    if kind == Layer.EMBED:
        return _embed_fwd(x, p[0], p[1]), None
    if kind == Layer.PROJ:
        return _proj_fwd(x, p[0], p[1]), None
    raise ValueError(f"layer kind {kind}")


def forward_pure(program, x, params, key):
    """un-jitted whole-network forward — composable into larger programs
    (nn.train's scanned epoch); get_forward is its jitted wrapper"""
    outs, masks = [], []
    for j, spec in enumerate(program):
        kj = jax.random.fold_in(key, j)
        x, m = _apply_layer(spec, x, params[j], kj)
        x = x.reshape(spec[2])
        outs.append(x)
        masks.append(m)
    return tuple(outs), tuple(masks)


@lru_cache(maxsize=256)
def get_forward(program):
    """program: tuple of (kind, opts, out_shape) — returns jitted
    f(x, params, key) -> (outs, masks)"""
    return jax.jit(partial(forward_pure, program))


@lru_cache(maxsize=256)
def get_forward_with_metrics(program):
    """dataset-input forward fused with onehot + hit (reference
    forward.cu:71-75 collects both after the pass; fusing them into the
    same executable drops two host->device dispatches per batch)"""
    base = get_forward(program)

    def fwd(x, params, key, labels):
        outs, masks = base(x, params, key)
        out = outs[-1]
        n = out.shape[0]
        classes = out.size // n
        hot = onehot_fn(labels, classes).reshape(n, 1, classes, 1)
        hit = hit_fn(out, hot)
        return outs, masks, hot, hit

    return jax.jit(fwd)


# ===========================================================================
# whole-network backward
# ===========================================================================
_PASS_THRU = (Layer.SIGMOID, Layer.SOFTMAX, Layer.LOGSMAX)
_MASKED = (Layer.RELU, Layer.TANH, Layer.SELU, Layer.LEAKYRL,
           Layer.ELU, Layer.DROPOUT)


def _acc(a, g):
    """accumulate a gradient into an accumulator of ANY equal-numel
    shape — the reshape is free inside jit, and it lets the interpreter
    pass its rank-4 storage tensors directly (no per-batch host-side
    reshape dispatches on the word path)"""
    return a + g.reshape(jnp.shape(a))


def backward_pure(program, train, tgt, x0, outs, params, masks, dws, dbs):
    """un-jitted whole-network backward with the reference quirks
    (pass-through sigmoid/softmax/final-linear, masked activations);
    composable into larger programs — get_backward is its jitted wrapper"""
    return _bwd_body(program, train, tgt, x0, outs, params, masks, dws, dbs)


@lru_cache(maxsize=256)
def get_backward(program, in_shape, train: bool):
    """returns jitted b(tgt, x0, outs, params, masks, dws, dbs)
    -> (dout, dxs, dws', dbs')"""

    def bwd(tgt, x0, outs, params, masks, dws, dbs):
        return _bwd_body(program, train, tgt, x0, outs, params, masks,
                         dws, dbs)

    return jax.jit(bwd)


def _bwd_body(program, train, tgt, x0, outs, params, masks, dws, dbs):
    # dLoss prep (reference _bprep, backprop.cu:75-109): the fused
    # final-activation+loss pairs become out-tgt; any other final
    # layer means tgt already IS dLoss (e.g. GAN G <- D input grad)
    if program[-1][0] in (Layer.LINEAR, Layer.SIGMOID,
                          Layer.SOFTMAX, Layer.LOGSMAX):
        dy = outs[-1] - tgt.reshape(outs[-1].shape)
    else:
        dy = tgt.reshape(outs[-1].shape)
    _, dxs, ndws, ndbs = backward_segment(
        program, train, dy, x0, outs, params, masks, dws, dbs, tail=True)
    return dy, dxs, ndws, ndbs


def backward_segment(program, train, dy, x0, outs, params, masks,
                     dws, dbs, tail=False):
        """word-path per-layer backward over a program SEGMENT given the
        cotangent dy at the segment's output (no dLoss prep).  tail=True
        enables the final-LINEAR pass-through quirk (only correct for
        the segment that ends the network).  The pipeline tier composes
        this per stage so `nn.pipe` gradients are word-path exact."""
        L = len(program)
        dxs = [None] * L
        ndws, ndbs = list(dws), list(dbs)
        for j in range(L - 1, -1, -1):
            kind, opts, out_shape = program[j]
            x_in = outs[j - 1] if j > 0 else x0
            last = tail and (j == L - 1)
            if kind in _PASS_THRU or (kind == Layer.LINEAR and last):
                dx = dy.reshape(x_in.shape)
            elif kind == Layer.FLATTEN:
                dx = dy.reshape(x_in.shape)
            elif kind in _MASKED:
                # masks may carry a stale header shape if the user
                # reshaped a layer view between forward and backprop
                dx = dy * masks[j].reshape(dy.shape)
            elif kind == Layer.LINEAR:
                n = x_in.shape[0]
                xf = x_in.reshape(n, -1)
                dyf = dy.reshape(n, -1)
                if train:
                    ndbs[j] = _acc(ndbs[j], jnp.sum(dyf, axis=0))
                    ndws[j] = _acc(ndws[j], jnp.dot(
                        dyf.T, xf, preferred_element_type=jnp.float32))
                dx = jnp.dot(dyf, params[j][0],
                             preferred_element_type=jnp.float32
                             ).reshape(x_in.shape)
            elif kind in (Layer.CONV, Layer.DCONV):
                f = _conv_fwd if kind == Layer.CONV else _dconv_fwd
                _, vjp = jax.vjp(
                    lambda x_, w_, b_: f(x_, w_, b_, opts[0], opts[1]),
                    x_in, params[j][0], params[j][1])
                dx, dw, db = vjp(dy.reshape(out_shape))
                if train:
                    ndws[j] = _acc(ndws[j], dw)
                    ndbs[j] = _acc(ndbs[j], db)
            elif kind in (Layer.MAXPOOL, Layer.AVGPOOL, Layer.MINPOOL):
                _, vjp = jax.vjp(lambda x_: _pool_fwd(kind, x_, opts[0]), x_in)
                dx, = vjp(dy.reshape(out_shape))
            elif kind == Layer.USAMPLE:
                _, vjp = jax.vjp(lambda x_: _upsample_fwd(x_, opts[0]), x_in)
                dx, = vjp(dy.reshape(out_shape))
            elif kind == Layer.ATTN:
                _, vjp = jax.vjp(
                    lambda x_, w1, w2: _mha_fwd(
                        x_, w1, w2, opts[0], flash=True,
                        causal=bool(opts[1]) if len(opts) > 1 else False,
                        rope=bool(opts[2]) if len(opts) > 2 else False),
                    x_in, params[j][0], params[j][1])
                dx, dw, dwo = vjp(dy.reshape(out_shape))
                if train:
                    ndws[j] = _acc(ndws[j], dw)
                    ndbs[j] = _acc(ndbs[j], dwo)
            elif kind == Layer.MOE:
                _, vjp = jax.vjp(
                    lambda x_, w1, w2: _moe_fwd(x_, w1, w2, opts[2]),
                    x_in, params[j][0], params[j][1])
                dx, dw1, dw2 = vjp(dy.reshape(out_shape))
                if train:
                    ndws[j] = _acc(ndws[j], dw1)
                    ndbs[j] = _acc(ndbs[j], dw2)
            elif kind == Layer.LNORM:
                _, vjp = jax.vjp(
                    lambda x_, g_, b_: _lnorm_fwd(x_, g_, b_, opts[0]),
                    x_in, params[j][0], params[j][1])
                dx, dg, db = vjp(dy.reshape(out_shape))
                if train:
                    ndws[j] = _acc(ndws[j], dg)
                    ndbs[j] = _acc(ndbs[j], db)
            elif kind == Layer.EMBED:
                # token ids get no input gradient; the table's gradient
                # is the scatter-add of dy over looked-up rows
                _, vjp = jax.vjp(
                    lambda t_, b_: _embed_fwd(x_in, t_, b_),
                    params[j][0], params[j][1])
                dt, db = vjp(dy.reshape(out_shape))
                if train:
                    ndws[j] = _acc(ndws[j], dt)
                    ndbs[j] = _acc(ndbs[j], db)
                dx = jnp.zeros_like(x_in)
            elif kind == Layer.PROJ:
                _, vjp = jax.vjp(
                    lambda x_, w_, b_: _proj_fwd(x_, w_, b_),
                    x_in, params[j][0], params[j][1])
                dx, dw, db = vjp(dy.reshape(out_shape))
                if train:
                    ndws[j] = _acc(ndws[j], dw)
                    ndbs[j] = _acc(ndbs[j], db)
            elif kind == Layer.BATCHNM:
                xhat, rvar = masks[j]
                gamma = params[j][0]
                dyr = dy.reshape(out_shape)
                m_dy = jnp.mean(dyr, axis=(0, 1, 2))
                m_dyxh = jnp.mean(dyr * xhat, axis=(0, 1, 2))
                if train:
                    ndbs[j] = _acc(ndbs[j], m_dy)
                    ndws[j] = _acc(ndws[j], m_dyxh)
                dx = gamma * rvar * (dyr - m_dy - xhat * m_dyxh)
            else:
                dx = dy.reshape(x_in.shape)
            dx = dx.reshape(x_in.shape)
            dxs[j] = dx
            dy = dx
        return dy, tuple(dxs), tuple(ndws), tuple(ndbs)


# ===========================================================================
# optimizers (reference k_sgd / k_adam / k_adamw semantics)
# ===========================================================================
@lru_cache(maxsize=64)
def get_sgd(ndivs: tuple, momentum: bool):
    def step(ws, dws, ms, lr, b):
        nws, nms, ndws = [], [], []
        for w, dw, m, nd in zip(ws, dws, ms, ndivs):
            dg = dw / nd
            if momentum:
                m = b * m + (1.0 - b) * dg
                w = w - lr * m
            else:
                w = w - lr * dg
            nws.append(w)
            nms.append(m)
            ndws.append(jnp.zeros_like(dw))
        return nws, ndws, nms

    return jax.jit(step)


@lru_cache(maxsize=64)
def get_adam(adamw: bool):
    def step(ws, dws, ms, vs, lr, b1, b2, wd):
        nws, nms, nvs, ndws = [], [], [], []
        for w, dg, m, v in zip(ws, dws, ms, vs):
            m = b1 * m + (1.0 - b1) * dg
            v = b2 * v + (1.0 - b2) * dg * dg
            upd = m / (jnp.sqrt(v) + 1.0e-6)
            if adamw:
                upd = upd + wd * w
            w = w - lr * upd
            nws.append(w)
            nms.append(m)
            nvs.append(v)
            ndws.append(jnp.zeros_like(dg))
        return nws, ndws, nms, nvs

    return jax.jit(step)


# ===========================================================================
# loss / metrics (reference Tensor::loss, Model::hit)
# ===========================================================================
@partial(jax.jit, static_argnames=("op",))
def loss_fn(op: str, out, tgt):
    n = out.shape[0] if out.ndim > 1 else 1
    o = out.reshape(-1)
    t = tgt.reshape(-1)
    if op == "mse":
        z = jnp.sum((o - t) ** 2)
    elif op == "bce":
        z = -jnp.sum(t * jnp.log(o + 1.0e-6)
                     + (1.0 - t) * jnp.log(1.0 - o + 1.0e-6))
    elif op == "ce":
        z = -jnp.sum(t * jnp.log(jnp.maximum(o, LN_CLAMP)))
    elif op == "nll":
        z = -jnp.sum(o * t)
    else:
        raise ValueError(op)
    return z / n


@jax.jit
def hit_fn(out, hot):
    n = out.shape[0]
    o = out.reshape(n, -1)
    h = hot.reshape(n, -1)
    idx = jnp.argmax(o, axis=-1)
    return jnp.sum(jnp.take_along_axis(h, idx[:, None], axis=-1))


@partial(jax.jit, static_argnames=("classes",))
def onehot_fn(labels, classes: int):
    return jax.nn.one_hot(labels, classes, dtype=jnp.float32)


# ===========================================================================
# macro-op fusion: the canonical word training cycle as ONE program
# ===========================================================================
@lru_cache(maxsize=4)
def _mesh_cache(spec: str, n_dev: int):
    from ..parallel.mesh import mesh_from_spec
    return mesh_from_spec(spec)


def word_mesh():
    """Mesh for the INTERACTIVE word path (VERDICT r4 #1).

    T4_MESH=dp4[,tp2] makes the canonical `for forward … backprop
    nn.adam next` word loop SPMD: the fused-cycle / chunk executables
    constrain the batch over 'dp' (and parameters over 'tp'/'ep' when
    those axes are present), so the flagship surface scales across
    chips exactly like nn.train — the reference's multi-VM dream
    (vm.h:62-79) realized as sharding instead of VM scheduling.
    Unset (the default) returns None: the executables compile exactly
    as before, zero single-chip overhead.  A spec needing more devices
    than exist degrades to None rather than erroring."""
    import os
    spec = os.environ.get("T4_MESH", "")
    if not spec:
        return None
    return _mesh_cache(spec, len(jax.devices()))


def _batch_sharding(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P("dp"))


def _flat_param_shardings(mesh, program, params):
    """per-trainable (w, b) NamedShardings in Model._trainables()
    order — the layout the fused optimizer's flat lists use"""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import shard_params
    psh = shard_params(mesh, program)
    rep = NamedSharding(mesh, P())
    flat = []
    for j in range(len(program)):
        if params[j]:
            sl = psh[j] if psh[j] else (rep, rep)
            flat += [sl[0], sl[1]]
    return psh, flat


@lru_cache(maxsize=64)
def get_fused_cycle(program, train: bool, loss_op: str, opt: str,
                    ndivs: tuple, mesh=None):
    """`forward loss.X ... backprop nn.adam` compiled as ONE XLA
    executable (macro-op fusion — VERDICT r2 #2; the reference analog
    is the per-word kernel-launch train it replaces, forward.cu:29 /
    backprop.cu:39 / gradient.cu:64).  The program returns EVERYTHING
    the four separate word dispatches would have produced — per-layer
    outputs/masks, onehot, hit, loss, input-grad chain, accumulated
    dW/dB, and the post-step weights/moments/zeroed grads — so the
    interpreter's observable state after each word is identical to the
    unfused path; the words just apply slices of one stashed result
    instead of dispatching.

    opt: 'adam' | 'adamw' | 'sgd' | 'sgdm'; hyper = (lr, h1, h2, h3)
    with (lr, b1, b2, wd) for adam/adamw and (lr, b, _, _) for sgd.
    ndivs: the SGD dW/N quirk divisors (per trainable, w then b)."""

    def cyc(x, params, dws, dbs, ms, vs, labels, key, lr, h1, h2, h3):
        if mesh is not None:
            bsh = _batch_sharding(mesh)
            x = jax.lax.with_sharding_constraint(x, bsh)
            labels = jax.lax.with_sharding_constraint(labels, bsh)
        return _fused_cycle_body(program, train, loss_op, opt, ndivs,
                                 x, params, dws, dbs, ms, vs, labels,
                                 key, lr, h1, h2, h3, mesh=mesh)

    return jax.jit(cyc)


@lru_cache(maxsize=64)
def get_fused_cycle_ds(program, train: bool, loss_op: str, opt: str,
                       ndivs: tuple, batch: int, mean: float,
                       scale: float, in_shape: tuple, mesh=None):
    """fetch-FOLDED fused cycle: the batch slice + normalize from the
    device-resident U8 corpus (mu/dataset._fetch_prog) runs INSIDE the
    one cycle executable, so the canonical word training loop costs a
    single device dispatch per batch (fetch + forward + loss + metrics
    + backward + optimizer).  Returns the sliced input activation and
    device labels first so the interpreter's dataset/input state stays
    identical to the unfused path."""

    def cyc(buf, all_labels, pos, params, dws, dbs, ms, vs, key,
            lr, h1, h2, h3):
        d = jax.lax.dynamic_slice_in_dim(buf, pos, batch, 0)
        x = ((d.astype(jnp.float32) - mean) * scale).reshape(in_shape)
        labels = jax.lax.dynamic_slice_in_dim(all_labels, pos, batch, 0)
        if mesh is not None:
            # the corpus buffer stays replicated (each device slices
            # locally — zero-communication fetch); the sliced batch
            # shards over 'dp' from here on
            bsh = _batch_sharding(mesh)
            x = jax.lax.with_sharding_constraint(x, bsh)
            labels = jax.lax.with_sharding_constraint(labels, bsh)
        return (x, labels) + _fused_cycle_body(
            program, train, loss_op, opt, ndivs, x, params, dws, dbs,
            ms, vs, labels, key, lr, h1, h2, h3, mesh=mesh)

    return jax.jit(cyc)


def _scatter_params(program, params, flat):
    """flat post-step trainables (Model._trainables() order: (w, b) per
    parameterized layer) back into the program-indexed params pytree"""
    out, i = [], 0
    for j in range(len(program)):
        if params[j]:
            out.append((flat[2 * i], flat[2 * i + 1]))
            i += 1
        else:
            out.append(params[j])
    return tuple(out)


def _scatter_zeroed_grads(program, params, dws, dbs, zflat):
    """zeroed accumulators for parameterized layers; non-parameterized
    placeholder slots pass through untouched"""
    ndws, ndbs, i = [], [], 0
    for j in range(len(program)):
        if params[j]:
            ndws.append(zflat[2 * i])
            ndbs.append(zflat[2 * i + 1])
            i += 1
        else:
            ndws.append(dws[j])
            ndbs.append(dbs[j])
    return tuple(ndws), tuple(ndbs)


@lru_cache(maxsize=64)
def get_fused_chunk_ds(program, train: bool, loss_op: str, opt: str,
                       ndivs: tuple, batch: int, mean: float,
                       scale: float, in_shape: tuple, k_batches: int,
                       mesh=None):
    """trace-chunked execution: K consecutive canonical word cycles
    (fetch + forward + loss + metrics + backward + optimizer) as ONE
    device program — `lax.scan` over the fused cycle body, batch i at
    corpus offset pos0 + i*batch.  The word loop then costs one device
    dispatch per K batches instead of per batch (the ~3 ms tunnel
    dispatch floor amortizes across the chunk).

    Returns (lvals[K], hits[K], fstat[K], last) where lvals/hits are
    the per-batch loss / hit-count scalars (served to the words as
    lazily-indexed futures, mu/future.LazyIdx), fstat is the per-batch
    finite-status int8 vector (0 ok, 1 forward produced a non-finite
    loss, 2 the optimizer step produced non-finite weights) backing the
    err-bit NaN sentinel (Model._fin_fault — the chunked analog of the
    reference's per-layer check + err STOP, forward.cu:60-66 /
    netvm.cpp:235), and `last` is the full per-word stash of the FINAL
    batch, identical in structure to get_fused_cycle_ds's return — the
    interpreter's tensors materialize the final batch's state exactly
    as per-batch execution would.
    Intermediate batches' tensor states are not materialized; any
    introspection mid-chunk triggers rollback-replay in
    Model._chunk_abort (correctness over speed on the rare path).

    The reference has no analog — its words launch kernels one at a
    time (src/nn/forward.cu:29, backprop.cu:39); on a tunneled
    accelerator amortizing the dispatch is what keeps the interactive
    word loop near the scanned nn.train epoch cost."""

    def chunk(buf, all_labels, pos0, params, dws, dbs, ms, vs, keys,
              lr, h1, h2, h3):
        # keys: [K, 2] uint32 — one PRNG key per batch, matching the
        # seed sequence the word path's per-forward next_key() produces
        # (only dropout consumes them)
        def one(pos, key, params_i, dws_i, dbs_i, ms_i, vs_i):
            d = jax.lax.dynamic_slice_in_dim(buf, pos, batch, 0)
            x = ((d.astype(jnp.float32) - mean) * scale).reshape(in_shape)
            labels = jax.lax.dynamic_slice_in_dim(all_labels, pos,
                                                  batch, 0)
            if mesh is not None:      # see get_fused_cycle_ds
                bsh = _batch_sharding(mesh)
                x = jax.lax.with_sharding_constraint(x, bsh)
                labels = jax.lax.with_sharding_constraint(labels, bsh)
            return (x, labels) + _fused_cycle_body(
                program, train, loss_op, opt, ndivs, x, params_i,
                dws_i, dbs_i, ms_i, vs_i, labels, key, lr, h1, h2, h3,
                mesh=mesh)

        # stash tuple indices: x=0 labels=1 outs=2 masks=3 hot=4 hit=5
        # lval=6 dout=7 dxs=8 ndws=9 ndbs=10 nws=11 nms=12 nvs=13
        # zdws=14 fin=15 (the per-cycle finite status computed by
        # _fused_cycle_body — forward health from the loss scalar, the
        # same signal the reference's per-layer _check_nan summarizes;
        # weight health from an all-params isfinite over the POST-step
        # weights, which the reference has no analog of — its NaN
        # surfaces one forward later)
        def fstat(st):
            return st[15]

        st0 = one(pos0, keys[0], params, dws, dbs, ms, vs)
        if k_batches == 1:
            one_l = jnp.reshape(st0[6], (1,))
            one_h = jnp.reshape(st0[5], (1,))
            return one_l, one_h, jnp.reshape(fstat(st0), (1,)), st0

        # Only the optimizer thread (weights, moments) rides the scan
        # carry; the full word stash (activations, masks, gradients) is
        # materialized ONLY for the final batch, unrolled after the
        # scan.  Carrying the whole stash cost ~0.51 ms/batch of device
        # time vs the bare nn.train scan's 0.33 (r4 measurement) — the
        # dead per-iteration stash writes were 60% overhead.  Post-
        # batch-0 grad accumulators are always the zeroed constants
        # (the optimizer zeroes after each step), so they close over
        # the body instead of riding the carry.
        zdws0 = tuple(jnp.zeros_like(dws[j]) if params[j] else dws[j]
                      for j in range(len(program)))
        zdbs0 = tuple(jnp.zeros_like(dbs[j]) if params[j] else dbs[j]
                      for j in range(len(program)))

        def body(carry, xs):
            i, key_i = xs
            nws_f, nms_c, nvs_c = carry
            params_i = _scatter_params(program, params, nws_f)
            st = one(pos0 + i * batch, key_i, params_i, zdws0, zdbs0,
                     nms_c, nvs_c)
            return (st[11], st[12], st[13]), (st[6], st[5], fstat(st))

        carry, (ls, hs, fs) = jax.lax.scan(
            body, (st0[11], st0[12], st0[13]),
            (jnp.arange(1, k_batches - 1), keys[1:k_batches - 1]))
        nws_f, nms_c, nvs_c = carry
        last = one(pos0 + (k_batches - 1) * batch, keys[k_batches - 1],
                   _scatter_params(program, params, nws_f),
                   zdws0, zdbs0, nms_c, nvs_c)
        lvals = jnp.concatenate([jnp.reshape(st0[6], (1,)), ls,
                                 jnp.reshape(last[6], (1,))])
        hits = jnp.concatenate([jnp.reshape(st0[5], (1,)), hs,
                                jnp.reshape(last[5], (1,))])
        fstats = jnp.concatenate([jnp.reshape(fstat(st0), (1,)), fs,
                                  jnp.reshape(fstat(last), (1,))])
        return lvals, hits, fstats, last

    return jax.jit(chunk)


def _fused_cycle_body(program, train, loss_op, opt, ndivs,
                      x, params, dws, dbs, ms, vs, labels, key,
                      lr, h1, h2, h3, mesh=None):
    fspecs = None
    if mesh is not None:
        # SPMD word path (word_mesh): parameters constrained to their
        # shard_params layout (replicated on a pure-dp mesh, feature-
        # sharded over 'tp', experts over 'ep'); activations inherit
        # 'dp' from the batch constraint applied by the caller.  XLA
        # inserts the grad psum over 'dp' and the activation
        # collectives over 'tp' exactly as in the nn.train SPMD tier.
        psh, fspecs = _flat_param_shardings(mesh, program, params)
        params = tuple(
            tuple(jax.lax.with_sharding_constraint(w, s)
                  for w, s in zip(pl, sl)) if pl and sl else pl
            for pl, sl in zip(params, psh))
    outs, masks = forward_pure(program, x, params, key)
    out = outs[-1]
    n = out.shape[0]
    classes = out.size // n
    hot = onehot_fn(labels, classes).reshape(n, 1, classes, 1)
    hit = hit_fn(out, hot)
    lval = loss_fn(loss_op, out, hot)
    dout, dxs, ndws, ndbs = _bwd_body(program, train, hot, x, outs,
                                      params, masks, dws, dbs)
    # flat trainables in Model._trainables() order: (w, b) pairs
    # per parameterized layer
    fws, fdws = [], []
    for j in range(len(program)):
        if params[j]:
            fws += [params[j][0], params[j][1]]
            fdws += [ndws[j], ndbs[j]]
    nws, nms, nvs, zdws = [], [], [], []
    for i, (w, dw, m) in enumerate(zip(fws, fdws, ms)):
        # ms/vs/dws arrive in the interpreter's rank-4 STORAGE
        # shapes; compute in the weight's logical shape (reshape is
        # free in jit; replace_data restores storage shape)
        dg = dw.reshape(jnp.shape(w))
        m = m.reshape(jnp.shape(w))
        if opt in ("adam", "adamw"):
            v = vs[i].reshape(jnp.shape(w))
            m = h1 * m + (1.0 - h1) * dg
            v = h2 * v + (1.0 - h2) * dg * dg
            upd = m / (jnp.sqrt(v) + 1.0e-6)
            if opt == "adamw":
                upd = upd + h3 * w
            w = w - lr * upd
            nvs.append(v)
        else:
            dg = dg / ndivs[i]
            if opt == "sgdm":
                m = h1 * m + (1.0 - h1) * dg
                w = w - lr * m
            else:
                m = dg
                w = w - lr * dg
        if fspecs is not None:
            # post-step weights/moments keep the parameter layout, so
            # the next cycle (and the chunk scan carry) never reshards
            w = jax.lax.with_sharding_constraint(w, fspecs[i])
            m = jax.lax.with_sharding_constraint(m, fspecs[i])
            if nvs and opt in ("adam", "adamw"):
                nvs[-1] = jax.lax.with_sharding_constraint(
                    nvs[-1], fspecs[i])
        nws.append(w)
        nms.append(m)
        zdws.append(jnp.zeros_like(dw))
    # finite-status int8 (err-bit NaN sentinel, Model._fin_check):
    # 0 ok / 1 the forward produced a non-finite loss / 2 the optimizer
    # step produced non-finite weights (forward itself was clean) —
    # computed in-program so the word path pays no extra dispatch
    w_ok = jnp.bool_(True)
    for w in nws:
        w_ok = w_ok & jnp.all(jnp.isfinite(w))
    fin = jnp.where(jnp.isfinite(lval),
                    jnp.where(w_ok, 0, 2), 1).astype(jnp.int8)
    return (outs, masks, hot, hit, lval, dout, dxs, ndws, ndbs,
            tuple(nws), tuple(nms), tuple(nvs), tuple(zdws), fin)
