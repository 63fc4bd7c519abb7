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


def _clamp(v, lim):
    return lim if v >= lim else 128


def mm_pallas(a, b, variant: int = 3):
    """tile shapes from an on-chip sweep (docs/STATUS_r1.md):
    256x256xK1024 best for f32 accuracy; 512x512xK1024 + bf16
    multiplicands (variant 4) approaches the XLA default-precision dot"""
    m, k = a.shape
    _, n = b.shape
    if variant == 2:
        return _mm_pallas(a, b, _clamp(m, 256), _clamp(n, 256),
                          max(k, 128) if k <= 2048 else 1024)
    if variant == 4:
        if k >= 512 and k % 256 == 0:
            return _mm_pallas_db(a, b, _clamp(m, 256), _clamp(n, 256), 256)
        return _mm_pallas(a, b, _clamp(m, 512), _clamp(n, 512),
                          1024 if k >= 1024 else max(k, 128), bf16=True)
    return _mm_pallas(a, b, _clamp(m, 256), _clamp(n, 256),
                      1024 if k >= 1024 else max(k, 128))


@partial(jax.jit, static_argnames=("ta", "tb", "variant"))
def gemm_pallas(a, b, c, alpha, beta, ta=False, tb=False, variant=3):
    aa = a.T if ta else a
    bb = b.T if tb else b
    p = mm_pallas(aa, bb, variant)
    return alpha * p + beta * c
