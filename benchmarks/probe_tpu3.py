"""Probe round 3: precise amortized numbers for the design-critical ops."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probe_tpu import timeit, probe, rand_u32


@probe("dispatch_overhead")
def p_overhead():
    f = jax.jit(lambda x: x + 1)
    t, _ = timeit(f, lambda r: (np.float32(r),))
    print(f"dispatch_overhead (scalar add): {t*1e3:.2f}ms")


@probe("row_sort_kv_amortized")
def p_rowsort():
    B, M = 32768, 512
    K = 8

    def step(i, kv):
        k, v = kv
        k2, v2 = jax.lax.sort_key_val(k ^ i.astype(jnp.uint32), v, is_stable=False)
        return k2, v2

    f = jax.jit(lambda k, v: jax.lax.fori_loop(0, K, step, (k, v)))
    t, _ = timeit(f, lambda r: (rand_u32(B * M, r).reshape(B, M),
                                np.tile(np.arange(M, dtype=np.uint32), (B, 1))))
    n = B * M * K
    print(f"row_sort_kv amortized {B}x{M}: {t/K*1e3:.2f}ms/sort -> "
          f"{n/t/1e6:.1f} M pairs/s")


@probe("row_sort_kv_stable_amortized")
def p_rowsort_stable():
    B, M = 32768, 512
    K = 8

    def step(i, kv):
        k, v = kv
        return jax.lax.sort_key_val(k ^ i.astype(jnp.uint32), v, is_stable=True)

    f = jax.jit(lambda k, v: jax.lax.fori_loop(0, K, step, (k, v)))
    t, _ = timeit(f, lambda r: (rand_u32(B * M, r).reshape(B, M),
                                np.tile(np.arange(M, dtype=np.uint32), (B, 1))))
    n = B * M * K
    print(f"row_sort_kv STABLE {B}x{M}: {t/K*1e3:.2f}ms/sort -> "
          f"{n/t/1e6:.1f} M pairs/s")


@probe("row_sort_widths")
def p_rowsort_widths():
    K = 8
    for B, M in ((131072, 128), (65536, 256), (32768, 512), (16384, 1024), (8192, 2048)):
        def step(i, x):
            return jnp.sort(x ^ i.astype(jnp.uint32), axis=1)

        f = jax.jit(lambda x: jax.lax.fori_loop(0, K, step, x))
        t, _ = timeit(f, lambda r: (rand_u32(B * M, r).reshape(B, M),))
        n = B * M * K
        print(f"row_sort {B:>6}x{M:<5}: {t/K*1e3:6.2f}ms/sort -> {n/t/1e6:7.1f} M keys/s")


@probe("hist_grid")
def p_hist():
    """Histogram with REP grid axis; output (T, 8, 128) built scatter-free."""
    N = 1 << 26
    TILE = 1 << 19
    REP = 4
    for D, shift in ((16, 4), (256, 8)):
        def kernel(x_ref, o_ref):
            d = (x_ref[:] >> shift) & (D - 1)
            counts = [jnp.sum((d == b).astype(jnp.int32)) for b in range(D)]
            vec = jnp.stack(counts)  # (D,)
            pad = jnp.zeros((1024 - D,), jnp.int32)
            o_ref[0] = jnp.concatenate([vec, pad]).reshape(8, 128)

        f = jax.jit(lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N // TILE, 8, 128), jnp.int32),
            grid=(REP, N // TILE),
            in_specs=[pl.BlockSpec((TILE,), lambda r, i: (i,),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda r, i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(x))
        try:
            t, out = timeit(f, lambda r: (rand_u32(N, r),))
            ok = int(np.asarray(out)[:, :, :].sum()) == N
            per = t / REP
            print(f"hist D={D:3}: {per*1e3:.2f}ms/pass -> {N*4/1e9/per:.0f} GB/s, ok={ok}")
        except Exception as e:
            print(f"hist D={D}: FAIL {type(e).__name__}: {str(e)[:200]}")


@probe("vmem_gather_sizes")
def p_gather_sizes():
    for R in (8, 64, 512, 1024):
        def kernel(x_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

        def mk(r):
            rng = np.random.default_rng(r)
            return (rng.integers(0, 1000, (R, 128)).astype(np.int32),
                    rng.integers(0, R, (R, 128)).astype(np.int32))

        f = jax.jit(lambda x, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, i))
        try:
            t, _ = timeit(f, mk, reps=2)
            x, i = mk(0)
            got = np.asarray(f(jnp.asarray(x), jnp.asarray(i)))
            ok = bool(np.array_equal(got, np.take_along_axis(x, i, axis=0)))
            print(f"vmem_gather axis0 ({R},128): ok={ok}")
        except Exception as e:
            print(f"vmem_gather axis0 ({R},128): FAIL {type(e).__name__}: {str(e)[:120]}")


@probe("vmem_gather_throughput")
def p_gather_tp():
    """Chained gathers inside one kernel: G elem/s of dynamic sublane gather."""
    R = 512
    INNER = 32

    def kernel(x_ref, i_ref, o_ref):
        acc = x_ref[:]
        for _ in range(INNER):
            acc = jnp.take_along_axis(acc, i_ref[:], axis=0)
        o_ref[:] = acc

    def mk(r):
        rng = np.random.default_rng(r)
        return (rng.integers(0, 1000, (R, 128)).astype(np.int32),
                rng.integers(0, R, (R, 128)).astype(np.int32))

    f = jax.jit(lambda x, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i))
    try:
        t, _ = timeit(f, mk, reps=3)
        n = R * 128 * INNER
        # subtract ~25ms dispatch
        td = max(t - 0.025, 1e-6)
        print(f"vmem_gather throughput: {n/td/1e9:.2f} G elem/s (raw t={t*1e3:.1f}ms)")
    except Exception as e:
        print(f"vmem_gather throughput: FAIL {type(e).__name__}: {str(e)[:120]}")


@probe("dma_static_offsets")
def p_dma_static():
    """Isolate the DMA crash: dynamic-size-free, scalar-prefetch-free DMAs
    with offsets computed from program_id."""
    n = 1 << 22
    S = 2048
    TILE = 1 << 17
    K = TILE // S  # 64
    NSLOT = 8

    def kernel(x_hbm, o_ref, scratch, sems):
        i = pl.program_id(0)

        def dma(k):
            # pseudo-random but statically-structured offset
            off = jax.lax.rem((i * 7919 + k * 104729) * S, n - S)
            off = (off // 8) * 8
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(off, S)],
                scratch.at[pl.ds(jax.lax.rem(k, NSLOT) * S, S)],
                sems.at[jax.lax.rem(k, NSLOT)],
            )

        def body(k, _):
            dma(k).start()

            @pl.when(k >= NSLOT)
            def _():
                dma(k - NSLOT).wait()
            return 0

        jax.lax.fori_loop(0, K, body, 0, unroll=False)

        def tail(k, _):
            dma(k).wait()
            return 0
        jax.lax.fori_loop(K - NSLOT, K, tail, 0, unroll=False)
        o_ref[:] = scratch[:]

    G = n // TILE
    f = jax.jit(lambda x: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((TILE,), jnp.uint32),
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TILE,), lambda i: (0,), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TILE,), jnp.uint32),
            pltpu.SemaphoreType.DMA((NSLOT,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x))
    try:
        t, _ = timeit(f, lambda r: (rand_u32(n, r),), reps=3)
        ndma = G * K
        td = max(t - 0.025, 1e-6)
        print(f"dma_static S={S}: {ndma} DMAs, {td/ndma*1e9:.0f} ns/DMA "
              f"(raw {t*1e3:.1f}ms)")
    except Exception as e:
        print(f"dma_static: FAIL {type(e).__name__}: {str(e)[:300]}")


ALL3 = [p_overhead, p_rowsort, p_rowsort_stable, p_rowsort_widths, p_hist,
        p_gather_sizes, p_gather_tp, p_dma_static]

if __name__ == "__main__":
    names = sys.argv[1:]
    for f in ALL3:
        if names and f.__name__ not in names:
            continue
        f()
