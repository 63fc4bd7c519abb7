"""Flash-attention Pallas kernel (TPU).

Online-softmax tiled attention: Q blocks stream over KV blocks with
running max/denominator in VMEM scratch, so the S x S score matrix is
never materialized in HBM.  Used by the ATTN layer (nn/funcs.py) for
long sequences; short sequences use the fused XLA path.

Causal mode masks future positions in-kernel and SKIPS fully-masked KV
blocks (the grid still visits them, but no dot issues), halving the
effective FLOPs — the long-context LM-training path.

Extension beyond the reference (whose README roadmap names Transformers
as the next tier, README.md:702-720).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def _dot(a, b, hybrid: bool):
    """MXU dot: hybrid casts multiplicands to bf16 (the v8 GEMM
    treatment — bf16 inputs, f32 accumulate; VERDICT r2 #8) while the
    softmax statistics and accumulators stay f32.  NB the Q/K/V/dO
    streams are cast OUTSIDE the kernel (half the HBM block bytes; the
    r3 GEMM sweeps showed in-kernel conversion LOSES) — the astype here
    is then a no-op for them and only converts the in-kernel f32
    products (softmax probabilities, ds).

    Precision is pinned to DEFAULT: Mosaic cannot lower the HIGH
    (3-pass) setting, so a process-global
    jax_default_matmul_precision='high' (T4_PRECISION=strict) leaking
    into an unpinned dot crashes the kernel at trace time (r4 find —
    see ops/gemm_pallas.py's class table).  For bf16 multiplicands the
    pin is semantics-free (single-pass either way); the non-hybrid
    path's multiplicands are likewise MXU-truncated to bf16 — 'f32'
    there means f32 STREAMS + f32 statistics, not 3/6-pass dots."""
    if hybrid:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)


_LOG2E = 1.4426950408889634       # 1/ln 2
_LN2 = 0.6931471805599453


def _fit_block(s: int, pref: int) -> int:
    """Largest multiple of 256 <= pref that divides s.

    The default block sizes are sweep winners at S=2048 (1024q etc.),
    but the grids floor-divide, so a default that does NOT divide s
    would silently skip whole KV/Q blocks (wrong outputs/gradients) or
    trip the trace-time assert.  _flash_ok admits any s%256==0, s>=512
    — e.g. S=1536/2560 — so the defaults must adapt: walk down from
    the preferred size in 256-lane steps to the largest divisor (256
    always divides an eligible s).  ADVICE r4 high/medium items."""
    top = min(pref, s)
    top -= top % 256
    for d in range(top, 255, -256):
        if s % d == 0:
            return d
    return min(s, 256)


def _flash_kernel(q_ref, k_ref, v_ref, *rest,
                  bq: int, bkv: int, causal: bool,
                  save_lse: bool, hybrid: bool = False,
                  single: bool = False, ckv: int = 0):
    """VPU-softmax cost is the forward's bound (a dots-only probe of
    the same block structure runs ~57 TF/s), so the softmax is
    computed in the BASE-2 domain:
    flash_attention pre-folds scale*log2(e) into Q, the kernel uses the
    native exp2 (jnp.exp costs an extra log2e multiply per element on
    the VPU) and the per-score `* scale` disappears entirely (one
    [S,dh] pass outside replaces a per-[S,S]-element multiply inside).
    The running max / lse stay in the base-2 domain; the flush converts
    lse back to nats for the backward.  single=True is the one-KV-block
    specialization (non-causal S<=bkv): no running statistics, no
    scratch read-modify-write — a straight two-dot softmax block."""
    if single:
        o_ref = rest[0]
        lse_ref = rest[1] if save_lse else None
    elif save_lse:
        o_ref, lse_ref, m_sc, l_sc, acc_sc = rest
    else:
        (o_ref, m_sc, l_sc, acc_sc), lse_ref = rest, None
    q_i = pl.program_id(1)
    kv_i = pl.program_id(2)

    if single:
        q = q_ref[0]                                # [bq, dh]
        s2 = _dot(q, k_ref[0].T, hybrid)            # base-2 scores
        m = jnp.max(s2, axis=-1, keepdims=True)
        if ckv and ckv < bkv:
            # chunked epilogue: exp2 of chunk i+1 (VPU) overlaps the
            # PV dot of chunk i (MXU) — the two units run concurrently
            # instead of the whole softmax serializing before one big dot
            l = jnp.zeros((bq, 1), jnp.float32)
            acc = jnp.zeros_like(o_ref[0])
            for i in range(bkv // ckv):
                p_i = jnp.exp2(s2[:, i * ckv:(i + 1) * ckv] - m)
                l = l + jnp.sum(p_i, axis=-1, keepdims=True)
                acc = acc + _dot(p_i, v_ref[0][i * ckv:(i + 1) * ckv],
                                 hybrid)
            o_ref[0] = acc / l
        else:
            p = jnp.exp2(s2 - m)                    # [bq, bkv]
            l = jnp.sum(p, axis=-1, keepdims=True)
            o_ref[0] = _dot(p, v_ref[0], hybrid) / l
        if save_lse:
            lse_ref[0] = jnp.broadcast_to(
                (m + jnp.log2(l)) * _LN2, lse_ref[0].shape)
        return

    @pl.when(kv_i == 0)
    def _init():
        m_sc[:] = jnp.full_like(m_sc, NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    def compute():
        q = q_ref[0]                                # [bq, dh]
        k = k_ref[0]                                # [bkv, dh]
        v = v_ref[0]                                # [bkv, dh]
        s2 = _dot(q, k.T, hybrid)                   # base-2 scores
        if causal:
            rows = q_i * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bkv), 0)
            cols = kv_i * bkv + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bkv), 1)
            s2 = jnp.where(cols <= rows, s2, NEG_INF)

        m_prev = m_sc[:, 0:1]                       # [bq, 1]
        m_cur = jnp.max(s2, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s2 - m_new)                    # [bq, bkv]
        l_new = alpha * l_sc[:, 0:1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_sc[:] = acc_sc[:] * alpha + _dot(p, v, hybrid)
        m_sc[:, 0:1] = m_new
        l_sc[:, 0:1] = l_new

    if causal:
        # KV blocks entirely in the future contribute nothing: skip the
        # dots (their loads still happen — block specs are static)
        @pl.when(kv_i * bkv <= q_i * bq + bq - 1)
        def _active():
            compute()
    else:
        compute()

    @pl.when(kv_i == pl.num_programs(2) - 1)
    def _flush():
        o_ref[0] = acc_sc[:] / l_sc[:, 0:1]
        if save_lse:
            # per-row log-sum-exp in NATS, lane-broadcast (backward
            # residual; the running stats live in the base-2 domain)
            lse_ref[0] = jnp.broadcast_to(
                (m_sc[:, 0:1] + jnp.log2(l_sc[:, 0:1])) * _LN2,
                lse_ref[0].shape)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref,
                          dk_ref, dv_ref, dk_sc, dv_sc,
                          *, bq: int, bkv: int, causal: bool,
                          hybrid: bool = False):
    """dK/dV: grid (B, n_kv, n_q) — kv block stationary, q blocks stream.

    r4b VPU diet, mirroring the forward's base-2 treatment: the caller
    pre-folds scale*log2(e) into Q and converts lse to base 2, so the
    probability recompute is a native exp2 with NO per-score multiply;
    delta = Σ do·o is precomputed outside (kills the per-(q,kv)-pair
    [bq,dh] multiply+reduce AND the o stream); the ln2 that converts
    dsᵀ·q2 back to scale·dsᵀ·q is applied once at flush."""
    kv_i = pl.program_id(1)
    q_i = pl.program_id(2)

    @pl.when(q_i == 0)
    def _init():
        dk_sc[:] = jnp.zeros_like(dk_sc)
        dv_sc[:] = jnp.zeros_like(dv_sc)

    def compute():
        q2 = q_ref[0]                               # [bq, dh] base-2 scaled
        k = k_ref[0]                                # [bkv, dh]
        v = v_ref[0]
        do = do_ref[0]
        lse2 = lse_ref[0][:, 0:1]                   # [bq, 1] base-2 lse
        delta = d_ref[0][:, 0:1]                    # [bq, 1] Σ do·o
        s2 = _dot(q2, k.T, hybrid)                  # base-2 scores
        if causal:
            rows = q_i * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bkv), 0)
            cols = kv_i * bkv + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bkv), 1)
            s2 = jnp.where(cols <= rows, s2, NEG_INF)
        p = jnp.exp2(s2 - lse2)                     # [bq, bkv] exact probs
        dv_sc[:] += _dot(p.T, do, hybrid)
        dp = _dot(do, v.T, hybrid)
        ds = p * (dp - delta)                       # nats-domain ds
        dk_sc[:] += _dot(ds.T, q2, hybrid)

    if causal:
        @pl.when(kv_i * bkv <= q_i * bq + bq - 1)
        def _active():
            compute()
    else:
        compute()

    @pl.when(q_i == pl.num_programs(2) - 1)
    def _flush():
        # dsᵀ·q2 = (scale·log2e)·dsᵀ·q, so ·ln2 restores scale·dsᵀ·q
        dk_ref[0] = dk_sc[:] * _LN2
        dv_ref[0] = dv_sc[:]


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref,
                         dq_ref, dq_sc,
                         *, bq: int, bkv: int, scale: float,
                         causal: bool, hybrid: bool = False):
    """dQ: grid (B, n_q, n_kv) — q block stationary, kv blocks stream.
    Same base-2 recompute as the dK/dV kernel; the `scale` on
    dq = scale·ds·k is applied once at flush."""
    q_i = pl.program_id(1)
    kv_i = pl.program_id(2)

    @pl.when(kv_i == 0)
    def _init():
        dq_sc[:] = jnp.zeros_like(dq_sc)

    def compute():
        q2 = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse2 = lse_ref[0][:, 0:1]
        delta = d_ref[0][:, 0:1]
        s2 = _dot(q2, k.T, hybrid)
        if causal:
            rows = q_i * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bkv), 0)
            cols = kv_i * bkv + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bkv), 1)
            s2 = jnp.where(cols <= rows, s2, NEG_INF)
        p = jnp.exp2(s2 - lse2)
        dp = _dot(do, v.T, hybrid)
        ds = p * (dp - delta)
        dq_sc[:] += _dot(ds, k, hybrid)

    if causal:
        @pl.when(kv_i * bkv <= q_i * bq + bq - 1)
        def _active():
            compute()
    else:
        compute()

    @pl.when(kv_i == pl.num_programs(2) - 1)
    def _flush():
        dq_ref[0] = dq_sc[:] * scale


@functools.partial(jax.jit,
                   static_argnames=("bq", "bkv", "causal", "interpret",
                                    "return_lse", "hybrid", "ckv"))
def flash_attention(q, k, v, bq: int | None = None,
                    bkv: int | None = None,
                    causal: bool = False, interpret: bool = False,
                    return_lse: bool = False, hybrid: bool = False,
                    ckv: int | None = None):
    """q,k,v: [B, S, dh] (batch*heads flattened) -> [B, S, dh];
    causal=True masks future positions (LM training); interpret=True
    runs the kernel in the Pallas interpreter (CPU-testable);
    return_lse=True also returns the per-row log-sum-exp residual
    [B, S, 128] (lane-broadcast) consumed by flash_attention_bwd;
    hybrid=True issues the attention dots with bf16 multiplicands and
    f32 accumulation (the v8 GEMM treatment) — softmax statistics and
    the output stay f32.

    Defaults from the r4 TPU sweeps (S=2048, dh=128, v5e):
    bq=1024 with the FULL KV span per block and a ckv=512 chunked
    exp2+PV epilogue — 52-58 TF/s hybrid across tunnel windows (46.5
    in r3; ~2.4x the fused-XLA path).  A same-window
    dots-only probe of the identical block structure measures ~57
    TF/s: the base-2 softmax is now fully hidden behind the MXU and
    the ceiling is the attention dot shapes themselves (K=dh=128
    contraction / N=dh=128 output — see docs/ROADMAP.md r4 item 3 for
    the negative results: q-stationary small-KV online blocks lose
    15-45%, sequential-q KV residency is noise).  Causal uses
    bq=bkv=1024 (r4b sweep: 22.7 TF/s over the halved FLOPs vs 19.4
    at r3's 512x512 — fewer block revisits beat the finer-grained
    masked-block skip; 2048q loses, scripts/sweep_attn_r4b.py
    fwd-causal)."""
    b, s, dh = q.shape
    if bq is None:
        bq = _fit_block(s, 1024)
    if bkv is None:
        # non-causal prefers the full KV span (single-block fast path)
        # up to 2048; past that (and for causal) the largest divisor
        bkv = _fit_block(s, 1024) if causal else (
            s if s <= 2048 else _fit_block(s, 2048))
    bq = min(bq, s)
    bkv = min(bkv, s)
    assert s % bq == 0 and s % bkv == 0, "seq not divisible by block"
    # base-2 softmax: scale*log2(e) folds into Q outside the kernel —
    # one [S,dh] multiply here replaces a per-[S,S]-score multiply
    # inside, and the kernel's exponentials become native exp2
    q = q * jnp.float32(_LOG2E / math.sqrt(dh))
    single = not causal and bkv >= s
    if hybrid:
        # cast OUTSIDE the kernel: blocks stream at half bandwidth and
        # the QK^T / PV dots take bf16 operands with no in-kernel
        # conversion cost (softmax stats + accumulator stay f32)
        q = q.astype(jnp.bfloat16)
        k = k.astype(jnp.bfloat16)
        v = v.astype(jnp.bfloat16)
    grid = (b, s // bq, s // bkv)
    out_shape = [jax.ShapeDtypeStruct((b, s, dh), jnp.float32)]
    out_specs = [pl.BlockSpec((1, bq, dh), lambda bi, qi, ki: (bi, qi, 0))]
    if return_lse:
        out_shape.append(jax.ShapeDtypeStruct((b, s, 128), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, bq, 128), lambda bi, qi, ki: (bi, qi, 0)))
    if ckv is None:
        ckv = 512 if single else 0
    r = pl.pallas_call(
        functools.partial(_flash_kernel, bq=bq, bkv=bkv,
                          causal=causal, save_lse=return_lse,
                          hybrid=hybrid, single=single, ckv=ckv),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dh), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, bkv, dh), lambda bi, qi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, bkv, dh), lambda bi, qi, ki: (bi, ki, 0)),
        ],
        out_specs=out_specs if return_lse else out_specs[0],
        out_shape=out_shape if return_lse else out_shape[0],
        scratch_shapes=[] if single else [
            pltpu.VMEM((bq, 128), jnp.float32),     # running max (col 0)
            pltpu.VMEM((bq, 128), jnp.float32),     # running denom (col 0)
            pltpu.VMEM((bq, dh), jnp.float32),      # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 if causal else 4) * b * s * s * dh,
            bytes_accessed=3 * b * s * dh * 4 + b * s * dh * 4,
            transcendentals=b * s * s // (2 if causal else 1),
        ),
        interpret=interpret,
    )(q, k, v)
    return r


@functools.partial(jax.jit,
                   static_argnames=("bq", "bkv", "causal", "interpret",
                                    "hybrid"))
def flash_attention_bwd(q, k, v, o, lse, do, bq: int | None = None,
                        bkv: int | None = None, causal: bool = False,
                        interpret: bool = False, hybrid: bool = False,
                        dlse=None):
    """flash backward: (dq, dk, dv) without materializing S x S in HBM.
    Two kernels — dK/dV with the KV block stationary and dQ with the Q
    block stationary — each recomputes its probability tile from the
    saved log-sum-exp (`lse` from flash_attention(return_lse=True)).

    r4b tuning round (the forward's base-2 treatment applied to the
    backward): scale·log2e folds into Q and lse converts to base 2
    OUT HERE (two [S,dh]/[S,128] passes replace per-[S,S]-score work
    inside), the probability recompute is native exp2, delta = Σ do·o
    is ONE precomputed [S,128] stream instead of a per-block-pair
    [bq,dh] multiply+reduce of the o stream, and the scalar constants
    (ln2 on dK, scale on dQ) apply once at flush.

    Measured (S=2048, dh=128, B=16, v5e; TF/s over the CONVENTIONAL
    10·B·S²·dh backward FLOPs — the two-kernel split issues 7 dots
    = 14·B·S²·dh, so the MXU itself runs 1.4x the reported rate; r3's
    "~80 TF/s" used the issued-dot normalization): old kernel at its
    256x256 default 49.8; same old kernel at 512x512 58.1 — block
    revisit traffic, not the VPU, was the dominant bound — and this
    kernel at the new bq=1024/bkv=512 default 60-61 non-causal
    (~2.2x XLA autodiff), 31.3 causal over the halved FLOPs (~2.3x
    XLA).  1024x1024 and 256qx2048kv tie within noise; the sweep is
    scripts/sweep_attn_r4b.py."""
    b, s, dh = q.shape
    if bq is None:
        bq = _fit_block(s, 1024)
    if bkv is None:
        bkv = _fit_block(s, 512)
    bq = min(bq, s)
    bkv = min(bkv, s)
    assert s % bq == 0 and s % bkv == 0, "seq not divisible by block"
    scale = 1.0 / math.sqrt(dh)
    # base-2 pre-scale (see flash_attention): q2 rows dotted with k give
    # base-2 scores; lse2 converts the saved nats-lse to the same domain
    q2 = q * jnp.float32(scale * _LOG2E)
    lse2 = lse * jnp.float32(_LOG2E)
    # delta = Σ do·o in f32 BEFORE any hybrid cast (feeds every ds and
    # wants full precision), lane-broadcast like lse
    delta = jnp.broadcast_to(
        jnp.sum(do * o, axis=-1, keepdims=True), lse.shape)
    if dlse is not None:
        # lse cotangent (ring-attention merge differentiates through the
        # per-chunk lse): ds = p·(dp − δ + dlse) = p·(dp − (δ − dlse)),
        # so it folds into the delta stream — zero kernel cost
        delta = delta - jnp.broadcast_to(dlse[..., None], lse.shape)
    if hybrid:
        # outside-the-kernel casts (see flash_attention)
        q2 = q2.astype(jnp.bfloat16)
        k = k.astype(jnp.bfloat16)
        v = v.astype(jnp.bfloat16)
        do = do.astype(jnp.bfloat16)

    q_at = pl.BlockSpec((1, bq, dh), lambda bi, ki, qi: (bi, qi, 0))
    kv_at = pl.BlockSpec((1, bkv, dh), lambda bi, ki, qi: (bi, ki, 0))
    lse_at = pl.BlockSpec((1, bq, 128), lambda bi, ki, qi: (bi, qi, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, bq=bq, bkv=bkv,
                          causal=causal, hybrid=hybrid),
        grid=(b, s // bkv, s // bq),
        in_specs=[q_at, kv_at, kv_at, q_at, lse_at, lse_at],
        out_specs=[
            pl.BlockSpec((1, bkv, dh), lambda bi, ki, qi: (bi, ki, 0)),
            pl.BlockSpec((1, bkv, dh), lambda bi, ki, qi: (bi, ki, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, s, dh), jnp.float32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((bkv, dh), jnp.float32),
            pltpu.VMEM((bkv, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(4 if causal else 8) * b * s * s * dh,
            bytes_accessed=6 * b * s * dh * 4,
            transcendentals=b * s * s // (2 if causal else 1),
        ),
        interpret=interpret,
    )(q2, k, v, do, lse2, delta)

    q_at2 = pl.BlockSpec((1, bq, dh), lambda bi, qi, ki: (bi, qi, 0))
    kv_at2 = pl.BlockSpec((1, bkv, dh), lambda bi, qi, ki: (bi, ki, 0))
    lse_at2 = pl.BlockSpec((1, bq, 128), lambda bi, qi, ki: (bi, qi, 0))
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, bq=bq, bkv=bkv,
                          scale=scale, causal=causal, hybrid=hybrid),
        grid=(b, s // bq, s // bkv),
        in_specs=[q_at2, kv_at2, kv_at2, q_at2, lse_at2, lse_at2],
        out_specs=pl.BlockSpec((1, bq, dh), lambda bi, qi, ki: (bi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, dh), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bq, dh), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(3 if causal else 6) * b * s * s * dh,
            bytes_accessed=6 * b * s * dh * 4,
            transcendentals=b * s * s // (2 if causal else 1),
        ),
        interpret=interpret,
    )(q2, k, v, do, lse2, delta)
    return dq, dk, dv


def _flash_bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref,
                            dq_ref, dkp_ref, dvp_ref, dq_sc,
                            *, bq: int, bkv: int, scale: float,
                            causal: bool, hybrid: bool = False):
    """Single-kernel 5-dot backward: grid (B, n_q, n_kv), q block
    stationary.  Each (q, kv) visit issues FIVE dots — s2 = q2·kᵀ,
    dp = do·vᵀ, dq += ds·k, dvp = pᵀ·do, dkp = dsᵀ·q2 — where the
    two-kernel split re-issues s2 and dp in both kernels (7 dots
    total).  dq accumulates in VMEM scratch across the kv stream;
    dk/dv leave as PER-Q-BLOCK PARTIALS [B, n_q, S, dh] (each output
    block written exactly once — no cross-grid-dim accumulation
    hazards) and a single XLA reduce outside sums the n_q axis.  The
    partial traffic (2·n_q·B·S·dh·4 B write + read) is linear in S
    while the dot savings are quadratic, so the trade improves with S.
    Causal fully-masked visits must still WRITE (blocks are visited
    once), so they store zeros — the skip saves the dots only."""
    q_i = pl.program_id(1)
    kv_i = pl.program_id(2)

    @pl.when(kv_i == 0)
    def _init():
        dq_sc[:] = jnp.zeros_like(dq_sc)

    def compute():
        q2 = q_ref[0]                               # [bq, dh] base-2 scaled
        k = k_ref[0]                                # [bkv, dh]
        v = v_ref[0]
        do = do_ref[0]
        lse2 = lse_ref[0][:, 0:1]                   # [bq, 1] base-2 lse
        delta = d_ref[0][:, 0:1]                    # [bq, 1] Σ do·o
        s2 = _dot(q2, k.T, hybrid)
        if causal:
            rows = q_i * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bkv), 0)
            cols = kv_i * bkv + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bkv), 1)
            s2 = jnp.where(cols <= rows, s2, NEG_INF)
        p = jnp.exp2(s2 - lse2)                     # [bq, bkv] exact probs
        dp = _dot(do, v.T, hybrid)
        ds = p * (dp - delta)                       # nats-domain ds
        dq_sc[:] += _dot(ds, k, hybrid)
        dvp_ref[0, 0] = _dot(p.T, do, hybrid)
        # dsᵀ·q2 = (scale·log2e)·dsᵀ·q, so ·ln2 restores scale·dsᵀ·q
        dkp_ref[0, 0] = _dot(ds.T, q2, hybrid) * _LN2

    if causal:
        @pl.when(kv_i * bkv <= q_i * bq + bq - 1)
        def _active():
            compute()

        @pl.when(kv_i * bkv > q_i * bq + bq - 1)
        def _masked():
            dkp_ref[0, 0] = jnp.zeros_like(dkp_ref[0, 0])
            dvp_ref[0, 0] = jnp.zeros_like(dvp_ref[0, 0])
    else:
        compute()

    @pl.when(kv_i == pl.num_programs(2) - 1)
    def _flush():
        dq_ref[0] = dq_sc[:] * scale


@functools.partial(jax.jit,
                   static_argnames=("bq", "bkv", "causal", "interpret",
                                    "hybrid"))
def flash_attention_bwd_fused(q, k, v, o, lse, do, bq: int | None = None,
                              bkv: int | None = None, causal: bool = False,
                              interpret: bool = False, hybrid: bool = False,
                              dlse=None):
    """Single-kernel flash backward (see _flash_bwd_fused_kernel):
    same signature and outputs as flash_attention_bwd, 5 in-kernel dots
    per (q, kv) block pair instead of the two-kernel split's 7, at the
    cost of 2·n_q·B·S·dh f32 partial traffic + an XLA reduce.  Own
    roadmap item (docs/ROADMAP.md r5 #2) / VERDICT r4 next #9."""
    b, s, dh = q.shape
    if bq is None:
        bq = _fit_block(s, 1024)
    if bkv is None:
        bkv = _fit_block(s, 512)
    bq = min(bq, s)
    bkv = min(bkv, s)
    assert s % bq == 0 and s % bkv == 0, "seq not divisible by block"
    n_q = s // bq
    scale = 1.0 / math.sqrt(dh)
    q2 = q * jnp.float32(scale * _LOG2E)
    lse2 = lse * jnp.float32(_LOG2E)
    delta = jnp.broadcast_to(
        jnp.sum(do * o, axis=-1, keepdims=True), lse.shape)
    if dlse is not None:
        delta = delta - jnp.broadcast_to(dlse[..., None], lse.shape)
    if hybrid:
        q2 = q2.astype(jnp.bfloat16)
        k = k.astype(jnp.bfloat16)
        v = v.astype(jnp.bfloat16)
        do = do.astype(jnp.bfloat16)

    q_at = pl.BlockSpec((1, bq, dh), lambda bi, qi, ki: (bi, qi, 0))
    kv_at = pl.BlockSpec((1, bkv, dh), lambda bi, qi, ki: (bi, ki, 0))
    lse_at = pl.BlockSpec((1, bq, 128), lambda bi, qi, ki: (bi, qi, 0))
    dq, dkp, dvp = pl.pallas_call(
        functools.partial(_flash_bwd_fused_kernel, bq=bq, bkv=bkv,
                          scale=scale, causal=causal, hybrid=hybrid),
        grid=(b, n_q, s // bkv),
        in_specs=[q_at, kv_at, kv_at, q_at, lse_at, lse_at],
        out_specs=[
            pl.BlockSpec((1, bq, dh), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, 1, bkv, dh), lambda bi, qi, ki: (bi, qi, ki, 0)),
            pl.BlockSpec((1, 1, bkv, dh), lambda bi, qi, ki: (bi, qi, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, dh), jnp.float32),
            jax.ShapeDtypeStruct((b, n_q, s, dh), jnp.float32),
            jax.ShapeDtypeStruct((b, n_q, s, dh), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bq, dh), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(5 if causal else 10) * b * s * s * dh,
            bytes_accessed=6 * b * s * dh * 4 + 4 * b * n_q * s * dh * 4,
            transcendentals=b * s * s // (2 if causal else 1),
        ),
        interpret=interpret,
    )(q2, k, v, do, lse2, delta)
    return dq, dkp.sum(axis=1), dvp.sum(axis=1)


# ===========================================================================
# differentiable (o, lse) pairing — the ring-attention chunk core
# ===========================================================================
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_lse(q, k, v, causal: bool = False,
                        hybrid: bool = False, interpret: bool = False):
    """flash attention that RETURNS (o, lse[B,S] in nats) and is
    differentiable in both outputs.  A raw pallas_call has no autodiff
    rule, so anything that consumes the per-chunk lse — the ring
    attention softmax merge (parallel/ring.py) — must differentiate
    through THIS wrapper: the lse cotangent folds into the backward
    kernels' delta stream (ds = p·(dp − (δ − dlse)); see
    flash_attention_bwd), costing nothing in-kernel.  Without it,
    jax.grad of ring attention on flash-eligible shapes raises at
    trace time (latent until a real sp≥2 TPU topology — CPU tests take
    the einsum fallback)."""
    o, lse3 = flash_attention(q, k, v, causal=causal, return_lse=True,
                              hybrid=hybrid, interpret=interpret)
    return o, lse3[:, :, 0]


def _fal_fwd(q, k, v, causal, hybrid, interpret):
    o, lse3 = flash_attention(q, k, v, causal=causal, return_lse=True,
                              hybrid=hybrid, interpret=interpret)
    return (o, lse3[:, :, 0]), (q, k, v, o, lse3)


def _fal_bwd(causal, hybrid, interpret, res, cts):
    q, k, v, o, lse3 = res
    do, dlse = cts
    return flash_attention_bwd(q, k, v, o, lse3, do, causal=causal,
                               hybrid=hybrid, interpret=interpret,
                               dlse=dlse)


flash_attention_lse.defvjp(_fal_fwd, _fal_bwd)
