"""DMA throughput: K dynamic-offset copies of (rows,128) per grid step.

Measures ns/DMA and effective GB/s for run sizes 512..16384 elements —
the decisive numbers for a run-coalesced radix scatter design.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probe_tpu import timeit, probe, rand_u32

N = 1 << 24  # 16M elems = 64MB
R_TOT = N // 128


def bench_dma(S_elems, REP=64):
    S = S_elems // 128  # rows per copy
    TILE_R = 4096       # scratch rows (512K elems.. no: 4096*128=512K elems=2MB)
    K = TILE_R // S
    NSLOT = 8

    def kernel(off_ref, x_hbm, o_ref, scratch, sems):
        g = pl.program_id(1)

        def dma(k):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(off_ref[g, k], S), :],
                scratch.at[pl.ds(jax.lax.rem(k, NSLOT) * S, S), :],
                sems.at[jax.lax.rem(k, NSLOT)],
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
        jax.lax.fori_loop(K - NSLOT, K, tail, 0)
        o_ref[:] = scratch[pl.ds(0, 8), :]

    G = R_TOT // TILE_R  # grid steps per rep

    f = jax.jit(lambda o, x: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(REP, G),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((TILE_R, 128), jnp.uint32),
                pltpu.SemaphoreType.DMA((NSLOT,)),
            ],
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(o, x))

    def mk(r):
        offs = np.random.default_rng(r).integers(
            0, R_TOT - S, size=(G, K)).astype(np.int32)
        return offs, rand_u32(N, r).reshape(R_TOT, 128)

    t, _ = timeit(f, mk, reps=3)
    ndma = REP * G * K
    td = max(t - 0.027, 1e-9)
    gb = ndma * S_elems * 4 / 1e9
    print(f"dma S={S_elems:6} elems ({S_elems*4//1024:3}KB): {ndma:6} DMAs, "
          f"{td/ndma*1e9:7.0f} ns/DMA, {gb/td:6.0f} GB/s read "
          f"(raw {t*1e3:.1f}ms)")


if __name__ == "__main__":
    for S in (512, 1024, 2048, 4096, 8192, 16384):
        try:
            bench_dma(S)
        except Exception as e:
            print(f"S={S}: FAIL {type(e).__name__}: {str(e)[:150]}")
