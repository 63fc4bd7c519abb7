"""Autoregressive serving — KV-cache generation for LM-tier models.

The reference's roadmap names Transformers as its next tier
(README.md:702-720) and this framework targets production serving: this
module compiles the whole decode loop into ONE XLA program
(`lax.scan` over steps) with per-layer KV caches, so generating N
tokens costs one dispatch — no per-token host round-trips on a
tunneled chip.

Supported program shape (the `tiny_lm` zoo family / t4_53 demo):
  EMBED -> { [LNORM] ATTN(causal) [activation] [MOE] }* -> [LNORM]
        -> PROJ -> SOFTMAX
Position-wise layers (LNORM, activations, MOE, PROJ) run on the
single-token slice; ATTN attends over its cache.  FLATTEN/LINEAR/CONV
layers cannot serve incrementally and are rejected.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import funcs
from .ntypes import Layer

_POSWISE = (Layer.RELU, Layer.TANH, Layer.SIGMOID, Layer.SELU,
            Layer.LEAKYRL, Layer.ELU)


def _check_program(program):
    for kind, opts, _s in program:
        if kind in (Layer.FLATTEN, Layer.LINEAR, Layer.CONV, Layer.DCONV,
                    Layer.MAXPOOL, Layer.AVGPOOL, Layer.MINPOOL,
                    Layer.BATCHNM, Layer.USAMPLE, Layer.DROPOUT):
            raise ValueError(
                f"nn.gen: layer '{Layer.NAMES[kind].strip()}' cannot "
                f"serve incrementally")
        if kind == Layer.ATTN and not (len(opts) > 1 and opts[1]):
            # KV-cache decode IS causal attention; serving a model
            # trained bidirectionally would silently change its math
            raise ValueError(
                "nn.gen: attention layers must be causal "
                "(build with `1 h nn.attn`)")


def _quant8(v):
    """symmetric per-vector int8 quantization: v [..., dh] ->
    (q int8 [..., dh], scale f32 [...]).  One scale per (batch, head,
    position) vector — the dequantized value is q * scale.  int8
    values are integers <= 127, so the int8 -> bfloat16 load cast in
    the attention dots is LOSSLESS (bf16's 8-bit mantissa covers
    |x| <= 256 exactly); the only quantization error is the rounding
    here, ~0.4% RMS per element."""
    s = jnp.maximum(jnp.max(jnp.abs(v), axis=-1), 1e-8) / 127.0
    q = jnp.round(v / s[..., None]).astype(jnp.int8)
    return q, s


def _step_token(program, params, caches, tok, t, s_max, w: int = 0):
    """one decode step: tok [N] int32 ids at position t -> logits [N,V]
    plus updated caches.  `w` (static) limits the attention read to the
    first w cache positions — the windowed-decode path slices the cache
    statically per segment so early steps never stream the full padded
    cache (decode is KV-bandwidth-bound at production shapes: 617 GB/s
    of a ~819 GB/s v5e at dim=1024/KV=4096, bench_serving_big)."""
    n = tok.shape[0]
    x = tok.reshape(n, 1, 1, 1).astype(jnp.float32)
    new_caches = list(caches)
    ci = 0
    for j, (kind, opts, _shape) in enumerate(program):
        p = params[j]
        if kind == Layer.EMBED:
            x = funcs._embed_fwd(x, p[0], p[1])
        elif kind == Layer.LNORM:
            x = funcs._lnorm_fwd(x, p[0], p[1], opts[0])
        elif kind in _POSWISE:
            x, _ = funcs._activate_fwd(kind, x, opts[0])
        elif kind == Layer.MOE:
            x = funcs._moe_fwd(x, p[0], p[1], opts[2])
        elif kind == Layer.PROJ:
            x = funcs._proj_fwd(x, p[0], p[1])
        elif kind == Layer.SOFTMAX:
            pass                        # sample from logits directly
        elif kind == Layer.ATTN:
            heads = opts[0]
            e = x.shape[2]
            dh = e // heads
            xf = x.reshape(n, e)
            qkv = jnp.dot(xf, p[0].T, preferred_element_type=jnp.float32)
            qkv = qkv.reshape(n, 3, heads, dh)
            q = qkv[:, 0]                               # [N, h, dh]
            k1 = qkv[:, 1]
            v1 = qkv[:, 2]
            if len(opts) > 2 and opts[2]:               # RoPE at pos t
                pos = jnp.asarray(t, jnp.int32).reshape(1)
                q = funcs.rope_apply(q[:, :, None, :], pos)[:, :, 0]
                k1 = funcs.rope_apply(k1[:, :, None, :], pos)[:, :, 0]
            ck, cv, sk, sv = new_caches[ci]
            kd = ck.dtype                               # cache storage dtype
            quant = sk is not None                      # int8 + scales
            if quant:
                k1, k1s = _quant8(k1)
                v1, v1s = _quant8(v1)
                sk = jax.lax.dynamic_update_index_in_dim(sk, k1s, t, 2)
                sv = jax.lax.dynamic_update_index_in_dim(sv, v1s, t, 2)
            ck = jax.lax.dynamic_update_index_in_dim(ck, k1.astype(kd),
                                                     t, 2)
            cv = jax.lax.dynamic_update_index_in_dim(cv, v1.astype(kd),
                                                     t, 2)
            new_caches[ci] = (ck, cv, sk, sv)
            ci += 1
            span = w if 0 < w < s_max else s_max
            ckr = jax.lax.slice_in_dim(ck, 0, span, axis=2)
            cvr = jax.lax.slice_in_dim(cv, 0, span, axis=2)
            # hybrid-GEMM treatment when the cache is bf16: bf16
            # multiplicands, f32 accumulation (scores/softmax stay f32).
            # int8 caches load as bf16 (lossless cast, see _quant8) and
            # dequantize by folding the scales into the f32 score /
            # softmax-weight tensors — the HBM stream is the int8 bytes.
            md = jnp.bfloat16 if quant else kd
            scores = jnp.einsum("nhd,nhsd->nhs", q.astype(md),
                                ckr.astype(md),
                                preferred_element_type=jnp.float32)
            if quant:
                scores = scores * jax.lax.slice_in_dim(sk, 0, span, axis=2)
            scores = scores / jnp.sqrt(jnp.float32(dh))
            pos = jax.lax.broadcasted_iota(jnp.int32, (span,), 0)
            scores = jnp.where(pos[None, None, :] <= t, scores, -1.0e30)
            wts = jax.nn.softmax(scores, axis=-1)
            if quant:
                wts = wts * jax.lax.slice_in_dim(sv, 0, span, axis=2)
            o = jnp.einsum("nhs,nhsd->nhd", wts.astype(md),
                           cvr.astype(md),
                           preferred_element_type=jnp.float32)
            x = jnp.dot(o.reshape(n, e), p[1].T,
                        preferred_element_type=jnp.float32
                        ).reshape(n, 1, e, 1)
        else:
            raise ValueError(f"nn.gen: unsupported layer {kind}")
    return x.reshape(n, -1), tuple(new_caches)


def _prefill(program, params, prompt, caches):
    """ONE full-prompt forward that fills every attention layer's KV
    cache for positions 0..S0-1 and returns the last-position logits
    [N, V] — replacing S0 sequential decode steps.  At a 2k prompt the
    sequential replay costs 2k scan steps of cache-bandwidth-bound
    decode (~0.9 s at the bench_serving_big shape); this is one
    MXU-shaped causal forward (the same math as training's attn_op,
    funcs.py _mha_fwd).  Exact: f32 scores/softmax/PV; K/V cast to the
    cache storage dtype only when stored."""
    n, s0 = prompt.shape
    x = prompt.reshape(n, s0, 1, 1).astype(jnp.float32)
    new_caches = list(caches)
    ci = 0
    for j, (kind, opts, _shape) in enumerate(program):
        p = params[j]
        if kind == Layer.EMBED:
            x = funcs._embed_fwd(x, p[0], p[1])
        elif kind == Layer.LNORM:
            x = funcs._lnorm_fwd(x, p[0], p[1], opts[0])
        elif kind in _POSWISE:
            x, _ = funcs._activate_fwd(kind, x, opts[0])
        elif kind == Layer.MOE:
            x = funcs._moe_fwd(x, p[0], p[1], opts[2])
        elif kind == Layer.PROJ:
            x = funcs._proj_fwd(x, p[0], p[1])
        elif kind == Layer.SOFTMAX:
            pass                        # sample from logits directly
        elif kind == Layer.ATTN:
            heads = opts[0]
            e = x.shape[2]
            dh = e // heads
            xf = x.reshape(n, s0, e)
            qkv = jnp.dot(xf, p[0].T, preferred_element_type=jnp.float32)
            qkv = qkv.reshape(n, s0, 3, heads, dh)
            q = jnp.transpose(qkv[:, :, 0], (0, 2, 1, 3))  # [N,h,S0,dh]
            k1 = jnp.transpose(qkv[:, :, 1], (0, 2, 1, 3))
            v1 = jnp.transpose(qkv[:, :, 2], (0, 2, 1, 3))
            if len(opts) > 2 and opts[2]:               # RoPE
                pos = jnp.arange(s0)
                q = funcs.rope_apply(q, pos)
                k1 = funcs.rope_apply(k1, pos)
            ck, cv, sk, sv = new_caches[ci]
            kd = ck.dtype
            if sk is not None:                          # int8 + scales
                k1q, k1s = _quant8(k1)
                v1q, v1s = _quant8(v1)
                sk = jax.lax.dynamic_update_slice(sk, k1s, (0, 0, 0))
                sv = jax.lax.dynamic_update_slice(sv, v1s, (0, 0, 0))
                ck = jax.lax.dynamic_update_slice(ck, k1q, (0, 0, 0, 0))
                cv = jax.lax.dynamic_update_slice(cv, v1q, (0, 0, 0, 0))
            else:
                ck = jax.lax.dynamic_update_slice(
                    ck, k1.astype(kd), (0, 0, 0, 0))
                cv = jax.lax.dynamic_update_slice(
                    cv, v1.astype(kd), (0, 0, 0, 0))
            new_caches[ci] = (ck, cv, sk, sv)
            ci += 1
            # the training tier's attention core: flash kernel for
            # long aligned prompts (S0 x S0 never hits HBM — at a 2k
            # prompt the einsum scores are ~1 GB/layer of traffic),
            # exact fused einsum otherwise
            o = funcs.sdpa(q.reshape(n * heads, s0, dh),
                           k1.reshape(n * heads, s0, dh),
                           v1.reshape(n * heads, s0, dh), causal=True)
            o = o.reshape(n, heads, s0, dh)
            o = jnp.transpose(o, (0, 2, 1, 3)).reshape(n, s0, e)
            x = jnp.dot(o, p[1].T, preferred_element_type=jnp.float32
                        ).reshape(n, s0, e, 1)
        else:
            raise ValueError(f"nn.gen: unsupported layer {kind}")
    return x.reshape(n, s0, -1)[:, -1, :], tuple(new_caches)


def _filter_top_k(logits, k: int):
    """keep the k largest logits per row, mask the rest"""
    vals, _ = jax.lax.top_k(logits, k)
    kth = vals[..., -1:]
    return jnp.where(logits < kth, -1.0e30, logits)


def _filter_top_p(logits, p: float):
    """nucleus sampling: keep the smallest set of tokens whose
    cumulative probability reaches p (the first token always survives)"""
    sl = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sl, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) < p                   # exclusive prefix mass
    thr = jnp.min(jnp.where(keep, sl, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits < thr, -1.0e30, logits)


def _shard_serving(mesh, program, params, caches, ids0):
    """T4_MESH for the serving tier: batch over 'dp', attention heads
    over 'tp' (the KV caches — decode's dominant HBM stream — split
    [N/dp, h/tp, S, dh] per device; the per-head attention einsums are
    embarrassingly SPMD and the output projection's contraction is the
    one collective XLA inserts).  Parameters take the training tier's
    layout (parallel/mesh.shard_params: wqkv row-, wo column-sharded
    over 'tp').  Same zero-overhead contract as the word path: no mesh,
    no constraint anywhere."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import shard_params
    hax = "tp" if "tp" in mesh.axis_names else None
    kv_s = NamedSharding(mesh, P("dp", hax, None, None))
    sc_s = NamedSharding(mesh, P("dp", hax, None))
    wsc = jax.lax.with_sharding_constraint
    caches = tuple(
        (wsc(ck, kv_s), wsc(cv, kv_s),
         None if sk is None else wsc(sk, sc_s),
         None if sv is None else wsc(sv, sc_s))
        for ck, cv, sk, sv in caches)
    ids0 = wsc(ids0, NamedSharding(mesh, P("dp", None)))
    psh = shard_params(mesh, program)
    params = tuple(
        tuple(wsc(a, s) for a, s in zip(pl, sl)) if pl and sl else pl
        for pl, sl in zip(params, psh))
    return params, caches, ids0


@partial(jax.jit,
         static_argnames=("program", "s_max", "n_prompt", "temp",
                          "top_k", "top_p", "kv_dtype", "win",
                          "prefill", "mesh"))
def _generate(program, params, prompt, s_max: int, n_prompt: int,
              temp: float, key, top_k: int = 0, top_p: float = 0.0,
              kv_dtype: str = "float32", win: int = 0,
              prefill: bool = True, mesh=None):
    """prompt [N, n_prompt] int32 -> ids [N, s_max] (prefill + decode
    in one scanned executable; greedy when temp == 0; optional top-k
    and/or nucleus top-p filtering before the categorical draw).

    kv_dtype: KV cache STORAGE dtype ('float32', 'bfloat16' or
    'int8') — bfloat16 halves and int8 quarters the per-step cache
    stream (decode's bound at production shapes); int8 stores one f32
    scale per cached vector (_quant8) and dequantizes by folding the
    scales into the f32 scores/softmax weights; scores/softmax/output
    stay f32 on every path.

    win > 0 enables WINDOWED decode: the step scan splits into
    power-of-two segments (win, 2*win, ... s_max) and each segment's
    attention reads only its statically-sliced cache prefix, so the
    average cache stream per step drops to ~0.6-0.7x of the padded
    full-cache read.  Still ONE compiled program, one dispatch — the
    segments are unrolled scans inside the same jit.

    prefill=True (default) runs the prompt through ONE causal forward
    (_prefill) instead of n_prompt sequential steps — token-identical
    for greedy decode; for temp>0 the RNG stream differs from the
    sequential replay (one split for the prefill token instead of one
    per prompt position)."""
    n = prompt.shape[0]
    heads_dims = []
    for kind, opts, shape in program:
        if kind == Layer.ATTN:
            e = shape[2]
            heads_dims.append((opts[0], e // opts[0]))
    kd = jnp.dtype(kv_dtype)
    if kd == jnp.int8:
        # int8 storage + one f32 scale per cached vector: the scale
        # stream adds dh/4 bytes per dh int8 bytes (~3% at dh=128)
        caches = tuple(
            (jnp.zeros((n, h, s_max, d), jnp.int8),
             jnp.zeros((n, h, s_max, d), jnp.int8),
             jnp.ones((n, h, s_max), jnp.float32),
             jnp.ones((n, h, s_max), jnp.float32))
            for h, d in heads_dims)
    else:
        caches = tuple(
            (jnp.zeros((n, h, s_max, d), kd),
             jnp.zeros((n, h, s_max, d), kd), None, None)
            for h, d in heads_dims)
    ids0 = jnp.zeros((n, s_max), jnp.int32)
    ids0 = jax.lax.dynamic_update_slice(ids0, prompt, (0, 0))
    if mesh is not None:
        params, caches, ids0 = _shard_serving(mesh, program, params,
                                              caches, ids0)

    def pick(logits, key):
        """sample/argmax the next token from [N, V] logits"""
        if temp > 0.0:
            key, sub = jax.random.split(key)
            lg = logits / temp
            if 0 < top_k < lg.shape[-1]:
                lg = _filter_top_k(lg, top_k)
            if 0.0 < top_p < 1.0:
                lg = _filter_top_p(lg, top_p)
            nxt = jax.random.categorical(sub, lg, axis=-1)
        else:
            nxt = jnp.argmax(logits, axis=-1)
        return nxt.astype(jnp.int32), key

    def step_w(w):
        def step(carry, t):
            ids, caches, key = carry
            tok = jax.lax.dynamic_index_in_dim(ids, t, 1, keepdims=False)
            logits, caches = _step_token(program, params, caches, tok, t,
                                         s_max, w=w)
            nxt, key = pick(logits, key)
            # within the prompt, the next token is given (replay);
            # beyond it, the model's choice extends the sequence
            keep = (t + 1) < n_prompt
            cur = jax.lax.dynamic_index_in_dim(
                ids, jnp.minimum(t + 1, s_max - 1), 1, keepdims=False)
            nxt = jnp.where(keep, cur, nxt)
            ids = jax.lax.dynamic_update_index_in_dim(
                ids, nxt, jnp.minimum(t + 1, s_max - 1), 1)
            return (ids, caches, key), None
        return step

    t0 = 0
    if prefill:
        logits, caches = _prefill(program, params, prompt, caches)
        nxt, key = pick(logits, key)
        if n_prompt < s_max:
            ids0 = jax.lax.dynamic_update_index_in_dim(
                ids0, nxt, n_prompt, 1)
        t0 = n_prompt
    carry = (ids0, caches, key)
    if t0 >= s_max - 1:
        pass                           # nothing to decode (n_new == 0)
    elif win <= 0 or win >= s_max:
        carry, _ = jax.lax.scan(step_w(0), carry,
                                jnp.arange(t0, s_max - 1))
    else:
        # segment [t0, t1) may read positions 0..t1-1 -> window t1.
        # t0 < s_max - 1 here, so the doubling reaches w >= t0 + 1
        # before (or at) the s_max cap — no stall when the prompt
        # already fills the sequence
        w = win
        while w < t0 + 1:
            w = min(w * 2, s_max)
        while t0 < s_max - 1:
            t1 = min(w, s_max - 1)
            carry, _ = jax.lax.scan(step_w(w), carry,
                                    jnp.arange(t0, t1))
            t0 = t1
            w = min(w * 2, s_max)
    return carry[0]


def generate(model, prompt_ids, n_new: int, temp: float = 0.0,
             seed: int = 0, top_k: int = 0, top_p: float = 0.0,
             kv_dtype: str | None = None, win: int | None = None,
             prefill: bool = True):
    """prompt_ids: [N, S0] (or [S0]) int array -> [N, S0+n_new] ids;
    temp=0 is greedy; top_k/top_p filter the distribution when temp>0.

    kv_dtype ('float32'/'bfloat16'/'int8', default env T4_KV_DTYPE or
    f32) sets the KV cache storage dtype; win (default env
    T4_DECODE_WIN or 0=off) enables power-of-two windowed decode —
    both cut the per-step cache stream that bounds decode at
    production shapes (bench_serving_big)."""
    from ..config import Config
    program = model._program()
    _check_program(program)
    params = model._params()
    p = np.asarray(prompt_ids, np.int32)
    squeeze = p.ndim == 1
    if squeeze:
        p = p[None]
    s_max = p.shape[1] + n_new
    if kv_dtype is None:
        kv_dtype = Config.KV_DTYPE
    if win is None:
        win = Config.DECODE_WIN
    # T4_MESH engages the serving tier exactly like the word path
    # (funcs.word_mesh): batch over 'dp', heads over 'tp'.  Degrade to
    # single-device when the batch/head counts don't divide the mesh —
    # a laptop run with a pod T4_MESH in the env must still serve.
    mesh = funcs.word_mesh()
    if mesh is not None:
        dp = mesh.shape.get("dp", 1)
        tp = mesh.shape.get("tp", 1)
        heads_ok = all(opts[0] % tp == 0
                       for kind, opts, _s in program
                       if kind == Layer.ATTN)
        if p.shape[0] % dp or not heads_ok:
            mesh = None
    ids = _generate(program, params, jnp.asarray(p), s_max, p.shape[1],
                    float(temp), jax.random.PRNGKey(seed),
                    int(top_k), float(top_p),
                    kv_dtype=str(kv_dtype), win=int(win),
                    prefill=bool(prefill), mesh=mesh)
    out = np.asarray(ids)
    return out[0] if squeeze else out
