"""Hand-written Pallas GEMM kernels for the MXU.

The reference ships four CUDA GEMM generations behind the ``gemm1..4``
words for A/B comparison (src/t4math.cu:371-734, table in
src/mu/tensor.cu:89-95).  The TPU equivalents:

  variant 2: single-pass block matmul — whole K panel resident in VMEM,
             grid over 128x128 output tiles.
  variant 3: K-blocked accumulation — 3D grid with an f32 VMEM
             accumulator scratch (the production shape).
  variant 4: wide tiles (256x256xK512) with arbitrary-K dimension
             semantics so Mosaic pipelines the K loop.

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


def _mm_kernel(a_ref, b_ref, o_ref, acc):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = acc[:]


def _mm_kernel_bf16(a_ref, b_ref, o_ref, acc):
    """bf16 multiplicands + f32 accumulation — the MXU's native single-pass
    mode (same numerics class as XLA's default-precision f32 dot)"""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jnp.dot(a_ref[:].astype(jnp.bfloat16),
                      b_ref[:].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = acc[:]


@partial(jax.jit, static_argnames=("bm", "bn", "bk", "bf16"))
def _mm_pallas(a, b, bm: int, bn: int, bk: int, bf16: bool = False):
    m, k = a.shape
    _, n = b.shape
    a = _pad_to(a, bm, bk)
    b = _pad_to(b, bk, bn)
    mp, kp = a.shape
    _, np_ = b.shape
    grid = (mp // bm, np_ // bn, kp // bk)
    out = pl.pallas_call(
        _mm_kernel_bf16 if bf16 else _mm_kernel,
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
            return acc + jnp.dot(a_buf[slot], b_buf[slot],
                                 preferred_element_type=jnp.float32)

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

        acc[:] += jnp.dot(a_ref[:], b_ref[:],
                          preferred_element_type=jnp.float32)

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
                       max(k, 128) if k <= 2048 else 1024)
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
    r = _mm_pallas(a, b, _clamp(m, 256), _clamp(n, 256),
                   1024 if k >= 1024 else max(k, 128))
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
