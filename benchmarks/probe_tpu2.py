"""Probe round 2: pallas histogram variants, DMA economics, VMEM gather,
copy bandwidth — with amortization inside a single pallas grid."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probe_tpu import timeit, probe, rand_u32

N = 64 * 1024 * 1024


@probe("copy_bw_grid")
def p_copy_grid():
    """Copy with 2D layout; grid has a repeat axis so one call does 8 full
    passes (amortizes dispatch overhead)."""
    REP = 8
    R = N // 128
    TILE_R = 2048

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    f = jax.jit(lambda x: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.uint32),
        grid=(REP, R // TILE_R),
        in_specs=[pl.BlockSpec((TILE_R, 128), lambda r, i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE_R, 128), lambda r, i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x))
    t, _ = timeit(f, lambda r: (rand_u32(N, r).reshape(R, 128),))
    gb = REP * 2 * N * 4 / 1e9
    print(f"copy_bw_grid: {t*1e3:.2f}ms for {gb:.1f}GB -> {gb/t:.0f} GB/s")


def _hist_kernel_smem(D, shift):
    def kernel(x_ref, o_ref):
        d = (x_ref[:] >> shift) & (D - 1)
        for b in range(D):
            o_ref[0, b] = jnp.sum((d == b).astype(jnp.int32))
    return kernel


@probe("hist16_smem")
def p_hist16():
    TILE = 512 * 1024
    D = 16
    f = jax.jit(lambda x: pl.pallas_call(
        _hist_kernel_smem(D, 4),
        out_shape=jax.ShapeDtypeStruct((N // TILE, D), jnp.int32),
        grid=(N // TILE,),
        in_specs=[pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, D), lambda i: (i, 0), memory_space=pltpu.SMEM),
    )(x))
    t, out = timeit(f, lambda r: (rand_u32(N, r),))
    ok = int(np.asarray(out).sum()) == N
    print(f"hist16_smem: {t*1e3:.2f}ms -> {N*4/1e9/t:.0f} GB/s read, ok={ok}")


@probe("hist256_smem")
def p_hist256():
    TILE = 512 * 1024
    D = 256
    f = jax.jit(lambda x: pl.pallas_call(
        _hist_kernel_smem(D, 8),
        out_shape=jax.ShapeDtypeStruct((N // TILE, D), jnp.int32),
        grid=(N // TILE,),
        in_specs=[pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, D), lambda i: (i, 0), memory_space=pltpu.SMEM),
    )(x))
    t, out = timeit(f, lambda r: (rand_u32(N, r),))
    ok = int(np.asarray(out).sum()) == N
    print(f"hist256_smem: {t*1e3:.2f}ms -> {N*4/1e9/t:.0f} GB/s read, ok={ok}")


@probe("dma_issue_loop")
def p_dma_loop():
    """DMA issue economics with fori_loop (not unrolled)."""
    n = 1 << 24
    for S in (512, 2048, 8192):
        TILE = 1 << 19
        K = TILE // S
        NSLOT = 8

        def kernel(off_ref, x_hbm, o_ref, scratch, sems):
            i = pl.program_id(0)

            def dma(k):
                slot = jax.lax.rem(k, NSLOT)
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(off_ref[i, k], S)],
                    scratch.at[pl.ds(jax.lax.rem(k * S, TILE), S)],
                    sems.at[slot],
                )

            def body(k, _):
                dma(k).start()

                @pl.when(k >= NSLOT)
                def _():
                    dma(k - NSLOT).wait()
                return 0

            jax.lax.fori_loop(0, K, body, 0)

            def tail(k, _):
                dma(k).wait()
                return 0
            jax.lax.fori_loop(max(0, K - NSLOT), K, tail, 0)
            o_ref[:] = scratch[:]

        G = n // TILE
        f = jax.jit(lambda o, x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n,), jnp.uint32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(G,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((TILE,), lambda i, *_: (i,),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((TILE,), jnp.uint32),
                    pltpu.SemaphoreType.DMA((NSLOT,)),
                ],
            ),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(o, x))

        def mk(r):
            offs = np.random.default_rng(r).integers(
                0, n - S, size=(G, K)).astype(np.int32)
            return (offs // 8) * 8, rand_u32(n, r)

        t, _ = timeit(f, mk)
        ndma = G * K
        print(f"dma_loop S={S:5}: {t*1e3:7.2f}ms, {ndma:6d} DMAs "
              f"-> {t/ndma*1e9:6.0f} ns/DMA, {2*n*4/1e9/t:5.0f} GB/s")


@probe("vmem_gather_8x128")
def p_gather_small():
    R, L = 8, 128

    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    def mk(r):
        rng = np.random.default_rng(r)
        return (rng.integers(0, 1000, (R, L)).astype(np.int32),
                rng.integers(0, R, (R, L)).astype(np.int32))

    f = jax.jit(lambda x, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i))
    t, out = timeit(f, mk, reps=2)
    print(f"vmem_gather 8x128 axis0: works, {t*1e3:.2f}ms")


@probe("vmem_gather_lane")
def p_gather_lane():
    R, L = 8, 128

    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    def mk(r):
        rng = np.random.default_rng(r)
        return (rng.integers(0, 1000, (R, L)).astype(np.int32),
                rng.integers(0, L, (R, L)).astype(np.int32))

    f = jax.jit(lambda x, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i))
    t, out = timeit(f, mk, reps=2)
    x, i = mk(0)
    got = np.asarray(f(jnp.asarray(x), jnp.asarray(i)))
    ok = bool(np.array_equal(got, np.take_along_axis(x, i, axis=1)))
    print(f"vmem_gather 8x128 axis1(lane): works, {t*1e3:.2f}ms correct={ok}")


@probe("xla_transpose")
def p_transpose():
    B, M = 32768, 512
    f = jax.jit(lambda x: x.T.reshape(B, M) ^ jnp.uint32(1))
    t, _ = timeit(f, lambda r: (rand_u32(B * M, r).reshape(B, M),))
    gb = 2 * B * M * 4 / 1e9
    print(f"xla_transpose {B}x{M}: {t*1e3:.2f}ms -> {gb/t:.0f} GB/s")


@probe("xla_sort_seg_pairs")
def p_sort_seg_kv():
    """Row sort with carried value (needed for stable local digit sort)."""
    B, M = 32768, 512
    f = jax.jit(lambda k, v: jax.lax.sort_key_val(k, v, is_stable=False))
    t, _ = timeit(f, lambda r: (
        rand_u32(B * M, r).reshape(B, M),
        np.tile(np.arange(M, dtype=np.uint32), (B, 1))))
    n = B * M
    print(f"xla_row_sort_kv {B}x{M}: {t*1e3:.2f}ms -> {n/t/1e6:.1f} M pairs/s")


@probe("xla_sort_seg_u64")
def p_sort_seg_u64():
    """Row sort of composite 64-bit keys (digit<<32 | payload-as-low-bits)."""
    B, M = 32768, 512
    f = jax.jit(lambda x: jnp.sort(x, axis=1))
    t, _ = timeit(f, lambda r: (
        np.random.default_rng(r).integers(0, 2**64, (B, M), dtype=np.uint64),))
    n = B * M
    print(f"xla_row_sort_u64 {B}x{M}: {t*1e3:.2f}ms -> {n/t/1e6:.1f} M keys/s")


ALL2 = [p_copy_grid, p_hist16, p_hist256, p_dma_loop, p_gather_small,
        p_gather_lane, p_transpose, p_sort_seg_kv, p_sort_seg_u64]

if __name__ == "__main__":
    names = sys.argv[1:]
    for f in ALL2:
        if names and f.__name__ not in names:
            continue
        f()
