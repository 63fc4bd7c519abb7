"""Hand-written Pallas GEMM kernels for the MXU.

The reference ships four CUDA GEMM generations behind the ``gemm1..4``
words for A/B comparison (src/t4math.cu:371-734, table in
src/mu/tensor.cu:89-95).  The TPU equivalents:

  variant 2: single-pass block matmul — whole K panel resident in VMEM,
             grid over 128x128 output tiles.
  variant 3: f32-I/O K-blocked accumulation — 3D grid with an f32 VMEM
             accumulator scratch; precision-CLASS-aware (the in-kernel
             dot resolves 'default'/'3pass'/'highest' from the global
             matmul precision — see the class table below).
  variant 4: the production "hybrid" kernel — explicit bf16
             multiplicands, manual-output DMA, fused scale.

alpha/beta/transpose epilogue runs in XLA and fuses into the kernel's
consumer.  Inputs are zero-padded to tile multiples and the result is
sliced back (cheap relative to the O(n^3) body).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_to(x, m0, m1):
    p0 = (-x.shape[0]) % m0
    p1 = (-x.shape[1]) % m1
    if p0 or p1:
        x = jnp.pad(x, ((0, p0), (0, p1)))
    return x


# ---------------------------------------------------------------------------
# In-kernel MXU precision (r4 honesty fix).  Mosaic only lowers dots at
# DEFAULT (single-pass bf16 multiplicands) and HIGHEST; the intermediate
# HIGH (XLA's 3-pass bf16x3) raises NotImplementedError — so a
# process-global jax_default_matmul_precision='high' (what
# T4_PRECISION=strict sets) leaking into an unpinned in-kernel jnp.dot
# CRASHES the kernel at trace time.  Every kernel dot below therefore
# pins its precision explicitly:
#   * bf16-multiplicand kernels pin DEFAULT (bf16 inputs are single-pass
#     at any setting — semantics unchanged, lowering now deterministic);
#   * the f32-I/O kernels resolve the active class once per call:
#       'default' — single-pass (MXU truncates multiplicands to bf16;
#                   the same class as XLA's default-precision f32 dot),
#       '3pass'   — manual bf16x3 split-accumulate (err ~5e-6 at 1024^3
#                   vs 1.5e-5 for the XLA 'high' dot, measured speed
#                   parity at ~44 TF/s — Mosaic has no native HIGH, so
#                   the split a=ah+al, b=bh+bl / 3-dot form is ours),
#       'highest' — pinned Precision.HIGHEST (genuine f32 class,
#                   err ~2-3e-7; parity with the XLA 'highest' dot at
#                   ~25 TF/s on one v5e).
# ---------------------------------------------------------------------------
_P_DEFAULT = jax.lax.Precision.DEFAULT
_P_HIGHEST = jax.lax.Precision.HIGHEST


def _prec_class() -> str:
    """map the process-global default matmul precision (which
    T4_PRECISION=strict sets to 'high') onto the kernel classes"""
    v = jax.config.jax_default_matmul_precision
    if v in ("high", "tensorfloat32", "BF16_BF16_F32_X3",
             "TF32_TF32_F32", "TF32_TF32_F32_X3"):
        return "3pass"
    if v in ("highest", "float32", "F32_F32_F32", "F64_F64_F64",
             "BF16_BF16_F32_X6", "BF16_BF16_F32_X9"):
        return "highest"
    return "default"


def _kdot(a, b, prec: str = "default"):
    """precision-pinned in-kernel dot (see the class table above)"""
    if prec == "3pass":
        f32 = jnp.float32
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(f32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(f32)).astype(jnp.bfloat16)
        return (jnp.dot(ah, bh, preferred_element_type=f32,
                        precision=_P_DEFAULT)
                + jnp.dot(ah, bl, preferred_element_type=f32,
                          precision=_P_DEFAULT)
                + jnp.dot(al, bh, preferred_element_type=f32,
                          precision=_P_DEFAULT))
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=_P_HIGHEST if prec == "highest" else _P_DEFAULT)


def _mm_kernel(a_ref, b_ref, o_ref, acc, *, prec: str = "default"):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += _kdot(a_ref[:], b_ref[:], prec)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = acc[:]


def _mm_kernel_bf16(a_ref, b_ref, o_ref, acc):
    """bf16 multiplicands + f32 accumulation — the MXU's native single-pass
    mode (same numerics class as XLA's default-precision f32 dot)"""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += _kdot(a_ref[:].astype(jnp.bfloat16),
                    b_ref[:].astype(jnp.bfloat16))

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = acc[:]


@partial(jax.jit,
         static_argnames=("bm", "bn", "bk", "bf16", "prec", "interpret"))
def _mm_pallas(a, b, bm: int, bn: int, bk: int, bf16: bool = False,
               prec: str = "default", interpret: bool = False):
    m, k = a.shape
    _, n = b.shape
    a = _pad_to(a, bm, bk)
    b = _pad_to(b, bk, bn)
    mp, kp = a.shape
    _, np_ = b.shape
    grid = (mp // bm, np_ // bn, kp // bk)
    out = pl.pallas_call(
        _mm_kernel_bf16 if bf16 else partial(_mm_kernel, prec=prec),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=(mp * kp + kp * np_ + mp * np_) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, b)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# double-buffered manual-DMA variant — the TPU successor of the
# reference's k_gemm_tile_claude_x2 (__pipeline_memcpy_async double
# buffering, src/t4math.cu:587-734): A/B stay in HBM; the kernel streams
# K-slabs through two VMEM buffers, overlapping DMA with MXU dots.
# ---------------------------------------------------------------------------
def _mm_kernel_db(a_hbm, b_hbm, o_ref, bk: int):
    def body(a_buf, b_buf, sems):
        k_total = a_hbm.shape[1]
        n_slabs = k_total // bk
        bm = o_ref.shape[0]
        bn = o_ref.shape[1]
        i0 = pl.program_id(0) * bm
        j0 = pl.program_id(1) * bn

        def get_dma(slot, idx):
            return (
                pltpu.make_async_copy(
                    a_hbm.at[pl.ds(i0, bm), pl.ds(idx * bk, bk)],
                    a_buf.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(idx * bk, bk), pl.ds(j0, bn)],
                    b_buf.at[slot], sems.at[slot, 1]),
            )

        for d in get_dma(0, 0):
            d.start()

        def loop(idx, acc):
            slot = idx % 2

            @pl.when(idx + 1 < n_slabs)
            def _prefetch():
                for d in get_dma((idx + 1) % 2, idx + 1):
                    d.start()

            for d in get_dma(slot, idx):
                d.wait()
            return acc + _kdot(a_buf[slot], b_buf[slot])

        acc0 = jnp.zeros(o_ref.shape, jnp.float32)
        o_ref[:] = jax.lax.fori_loop(0, n_slabs, loop, acc0)

    bm = o_ref.shape[0]
    bn = o_ref.shape[1]
    pl.run_scoped(
        body,
        a_buf=pltpu.VMEM((2, bm, bk), jnp.float32),
        b_buf=pltpu.VMEM((2, bk, bn), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2, 2)),
    )


@partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def _mm_pallas_db(a, b, bm: int, bn: int, bk: int):
    m, k = a.shape
    _, n = b.shape
    a = _pad_to(a, bm, bk)
    b = _pad_to(b, bk, bn)
    mp, kp = a.shape
    _, np_ = b.shape
    out = pl.pallas_call(
        partial(_mm_kernel_db, bk=bk),
        grid=(mp // bm, np_ // bn),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),    # whole A stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),    # whole B stays in HBM
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=(mp * kp + kp * np_ + mp * np_) * 4,
            transcendentals=0,
        ),
    )(a, b)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# v8 "hybrid" kernel — the production gemm4: Mosaic auto-pipelines the
# INPUT blocks (its scheduler overlaps DMA/MXU best), the OUTPUT is a
# VMEM scratch accumulator DMA'd manually (avoiding the output
# double-buffer that blows the ~16 MB VMEM budget at 1024x1024 tiles),
# multiplicands convert to bf16 outside the kernel (the SAME numerics
# class as XLA's default-precision f32 dot — the MXU truncates
# multiplicands to bf16 either way; accumulation is f32), and the
# alpha/scale epilogue fuses into the flush.  Measured on one v5e chip
# vs the XLA dot (chained, RTT-corrected): 178.2 vs 175.1 TF/s at
# 1024^3, 178.7 vs 184.6 at 2048^3, 175.2 vs 164.3 at 4096^3.
# ---------------------------------------------------------------------------
def _v8_kernel(bm: int, bn: int):
    def kernel(s_ref, a_ref, b_ref, o_hbm, acc, osem):
        i0 = pl.program_id(0) * bm
        j0 = pl.program_id(1) * bn
        kk = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(kk == 0)
        def _init():
            acc[:] = jnp.zeros_like(acc)

        acc[:] += _kdot(a_ref[:], b_ref[:])

        @pl.when(kk == nk - 1)
        def _flush():
            acc[:] = acc[:] * s_ref[0]
            cp = pltpu.make_async_copy(
                acc, o_hbm.at[pl.ds(i0, bm), pl.ds(j0, bn)], osem)
            cp.start()
            cp.wait()

    return kernel


@partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def _mm_pallas_v8(a, b, scale, bm: int, bn: int, bk: int):
    m, k = a.shape
    _, n = b.shape
    a = _pad_to(a, bm, bk).astype(jnp.bfloat16)
    b = _pad_to(b, bk, bn).astype(jnp.bfloat16)
    mp, kp = a.shape
    _, np_ = b.shape
    sv = jnp.full((1,), scale, jnp.float32)
    out = pl.pallas_call(
        _v8_kernel(bm, bn),
        grid=(mp // bm, np_ // bn, kp // bk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=(mp * kp + kp * np_) * 2 + mp * np_ * 4,
            transcendentals=0,
        ),
    )(sv, a, b)
    return out[:m, :n]


def _clamp(v, lim):
    return lim if v >= lim else 128


def mm_pallas(a, b, variant: int = 3, scale: float = 1.0):
    """variant 2: single-pass VMEM panel; 3: f32-strict K-blocked;
    4: v8 hybrid (bf16 multiplicands, manual-output, fused scale) —
    the production kernel that beats the XLA dot at 1024^3/4096^3.
    `scale` fuses into variant 4's epilogue (others multiply outside)."""
    m, k = a.shape
    _, n = b.shape
    if variant == 2:
        r = _mm_pallas(a, b, _clamp(m, 256), _clamp(n, 256),
                       max(k, 128) if k <= 2048 else 1024,
                       prec=_prec_class())
        return r * scale if scale != 1.0 else r
    if variant == 4:
        def tile(v, cap=1024):
            for t in (cap, 512, 256, 128):
                if v >= t:
                    return t
            return 128
        if k == 2048 and n == 2048 and m >= 512:
            # B-RESIDENT full-N tile: all of B (8 MB bf16) stays in
            # VMEM across the whole pass and is fetched from HBM once;
            # A streams in 512-row slabs.  ~24 MB VMEM compiles fine on
            # current Mosaic (the old ~16 MB cliff applied to
            # double-buffered OUTPUT specs, not ANY-space manual DMA).
            # Head-to-head vs the XLA dot at 2048^3, 15 interleaved
            # reps: median ratio 1.022 (prior (1024,512,2048) tile:
            # 0.971) — the one size that still trailed XLA in r2.
            bm, bn, bk = 512, 2048, 2048
        elif k == 2048 and m >= 1024 and 512 <= n <= 2048:
            # K-resident asymmetric tile: 12 MB double-buffered inputs
            # + 2 MB accumulator stays safely under the 16 MB VMEM
            # cliff; measured 156.2 TF/s vs 150.0 for 512x512 tiles
            # (late-r2 sweep, same chip/window as XLA dot 159.2)
            bm, bn, bk = 1024, 512, 2048
        elif k == 2048 and 512 <= m <= 2048 and 512 <= n <= 2048:
            bm = bn = 512
            bk = 2048
        elif k >= 1024:
            bm, bn = tile(m), tile(n)
            bk = 1024
        else:
            bm, bn = tile(m, 512), tile(n, 512)
            bk = max(min(k, 512), 128)
        return _mm_pallas_v8(a, b, jnp.float32(scale), bm, bn, bk)
    # variant 3 (f32-I/O) tiles, r4 sweep (scripts/sweep_gemm_r4b.py,
    # interleaved reps on the real chip).  Default class: wide-N
    # 512x1024 output tiles beat the old 256x256 everywhere big —
    # 106->135 TF/s at 1024^3 (fully-resident B: grid (m/512,1,1)),
    # 91->115 at 2048^3, 44->99 at 4096^3.  bk drops to 512 whenever N
    # or K streams: the resident (512,1024,1024) shape OOMs scoped VMEM
    # (18 MB > 16) once the j/kk grid dims stop being singletons and
    # double buffering kicks in.  The strict classes carry more
    # per-tile state (3 dots / 6-pass), so they keep narrower tiles:
    # 3pass best (512,512,1024) = 44.2 TF/s, highest best
    # (256,512,1024) = 25.2 — both parity with the XLA dot of the same
    # class (44.3 / 26.2), with 3pass numerically TIGHTER (5e-6 vs
    # 1.5e-5 max-rel at 1024^3 against an f64 oracle).
    prec = _prec_class()
    if prec == "default" and m >= 512 and n >= 1024 and k >= 1024:
        bk = 1024 if (n == 1024 and k == 1024) else 512
        r = _mm_pallas(a, b, 512, 1024, bk)
    elif prec == "3pass" and m >= 256 and n == 1024 and k == 1024:
        # 3pass winner at the resident shape (grid (m/256,1,1), B panel
        # fetched once): med 56.8 TF/s, interleaved ratio vs the XLA
        # 'high' dot 1.011 [1.008, 1.065] at 1024^3 — BEATS the stock
        # 3-pass with tighter error.  Streaming shapes OOM this tile
        # (double buffering on non-singleton j/kk), so they fall to
        # (512,512,*) below at ~0.96x.
        r = _mm_pallas(a, b, 256, 1024, 1024, prec=prec)
    elif prec == "3pass" and m >= 512 and n >= 512 and k >= 512:
        r = _mm_pallas(a, b, 512, 512, 1024 if k >= 1024 else 512,
                       prec=prec)
    elif prec == "highest" and m >= 256 and n >= 512 and k >= 512:
        r = _mm_pallas(a, b, 256, 512, 1024 if k >= 1024 else 512,
                       prec=prec)
    else:
        r = _mm_pallas(a, b, _clamp(m, 256), _clamp(n, 256),
                       1024 if k >= 1024 else max(k, 128), prec=prec)
    return r * scale if scale != 1.0 else r


@partial(jax.jit, static_argnames=("ta", "tb", "variant"))
def gemm_pallas(a, b, c, alpha, beta, ta=False, tb=False, variant=3):
    aa = a.T if ta else a
    bb = b.T if tb else b
    if variant == 4:
        p = mm_pallas(aa, bb, 4, scale=alpha)      # alpha fused in-kernel
        return p + beta * c
    p = mm_pallas(aa, bb, variant)
    return alpha * p + beta * c
