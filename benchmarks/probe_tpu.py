"""TPU microbenchmarks that decide the Pallas sort kernel design.

Run on the real chip: python benchmarks/probe_tpu.py [probe ...]
Each probe is independent and failure-tolerant (prints UNSUPPORTED).

NB: the tunneled TPU runtime caches repeated executions with identical
(program, inputs); every probe varies its inputs per rep.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _drain(out):
    """Force pipeline drain: block_until_ready alone returns prematurely on
    the tunneled runtime right after queued transfers; a tiny readback of
    the result forces real completion."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, make_args, reps=4):
    argsets = [tuple(jax.device_put(a) for a in make_args(r)) for r in range(reps + 1)]
    for aset in argsets:
        for a in aset:
            a.block_until_ready()
    out = fn(*argsets[0])  # compile
    _drain(out)
    _drain(fn(*argsets[0]))  # throwaway warm rep
    ts = []
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*argsets[r]))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def probe(name):
    def deco(f):
        def wrapper():
            try:
                f()
            except Exception as e:
                print(f"{name}: UNSUPPORTED/{type(e).__name__}: {str(e)[:250]}")
        wrapper.__name__ = name
        return wrapper
    return deco


N = 64 * 1024 * 1024


def rand_u32(n, seed):
    return np.random.default_rng(seed).integers(0, 2**32, n, dtype=np.uint32)


@probe("copy_bandwidth")
def p_copy():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    TILE = 512 * 1024
    f = jax.jit(lambda x: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.uint32),
        grid=(N // TILE,),
        in_specs=[pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
    )(x))
    t, _ = timeit(f, lambda r: (rand_u32(N, r),))
    gb = 2 * N * 4 / 1e9
    print(f"copy_bandwidth: {t*1e3:.2f}ms for {gb:.2f}GB -> {gb/t:.0f} GB/s")


@probe("lax_sort_scaling")
def p_sort():
    for n in (1 << 21, 1 << 24, 1 << 26):
        f = jax.jit(jnp.sort)
        t, _ = timeit(f, lambda r: (rand_u32(n, r),))
        print(f"lax_sort n={n:>9}: {t*1e3:8.2f}ms -> {n/t/1e6:8.1f} M keys/s")


@probe("xla_gather")
def p_gather():
    n = 1 << 24
    f = jax.jit(lambda x, i: jnp.take(x, i))
    t, _ = timeit(f, lambda r: (
        rand_u32(n, r),
        np.random.default_rng(100 + r).permutation(n).astype(np.int32)))
    print(f"xla_gather random n={n}: {t*1e3:.2f}ms -> {n/t/1e6:.1f} M elem/s")


@probe("xla_gather_coherent")
def p_gather_coherent():
    """Gather where indices are 'mostly sequential runs' (radix-pass-like)."""
    n = 1 << 24
    run = 4096

    def mk(r):
        starts = np.random.default_rng(r).permutation(n // run) * run
        idx = (starts[:, None] + np.arange(run)[None, :]).reshape(-1).astype(np.int32)
        return rand_u32(n, r), idx

    f = jax.jit(lambda x, i: jnp.take(x, i))
    t, _ = timeit(f, mk)
    print(f"xla_gather runs={run}: {t*1e3:.2f}ms -> {n/t/1e6:.1f} M elem/s")


@probe("xla_scatter")
def p_scatter():
    n = 1 << 24
    f = jax.jit(lambda x, i: jnp.zeros_like(x).at[i].set(x))
    t, _ = timeit(f, lambda r: (
        rand_u32(n, r),
        np.random.default_rng(200 + r).permutation(n).astype(np.int32)))
    print(f"xla_scatter random n={n}: {t*1e3:.2f}ms -> {n/t/1e6:.1f} M elem/s")


@probe("xla_cumsum")
def p_cumsum():
    f = jax.jit(jnp.cumsum)
    t, _ = timeit(f, lambda r: (rand_u32(N, r).view(np.int32),))
    print(f"xla_cumsum n={N}: {t*1e3:.2f}ms -> {N/t/1e6:.1f} M elem/s")


def _hist_call(D, TILE, shift):
    def kernel(x_ref, o_ref):
        d = (x_ref[:] >> shift) & (D - 1)
        flat = jnp.zeros((8, 128), jnp.int32)
        for b in range(D):
            flat = flat.at[b // 128, b % 128].set(
                jnp.sum((d == b).astype(jnp.int32)))
        o_ref[0] = flat

    return lambda x: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((x.shape[0] // TILE, 8, 128), jnp.int32),
        grid=(x.shape[0] // TILE,),
        in_specs=[pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x)


@probe("pallas_histogram16")
def p_hist16():
    TILE = 512 * 1024
    f = jax.jit(_hist_call(16, TILE, 4))
    t, out = timeit(f, lambda r: (rand_u32(N, r),))
    ok = int(np.asarray(out).sum()) == N
    print(f"pallas_histogram D=16: {t*1e3:.2f}ms -> {N*4/1e9/t:.0f} GB/s, ok={ok}")


@probe("pallas_histogram256")
def p_hist256():
    TILE = 512 * 1024
    f = jax.jit(_hist_call(256, TILE, 8))
    t, out = timeit(f, lambda r: (rand_u32(N, r),))
    ok = int(np.asarray(out).sum()) == N
    print(f"pallas_histogram D=256: {t*1e3:.2f}ms -> {N*4/1e9/t:.0f} GB/s, ok={ok}")


@probe("pallas_hist_matmul256")
def p_hist_mm():
    """Histogram via one-hot matmul on the MXU: ones(1,T) @ onehot(T,256)."""
    TILE = 128 * 1024

    def kernel(x_ref, o_ref):
        d = ((x_ref[:] >> 8) & 255).astype(jnp.int32).reshape(-1, 128)  # (R,128)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
        acc = jnp.zeros((128, 256), jnp.float32)
        R = d.shape[0]
        CH = 512
        for c in range(R // CH):
            blk = d[c * CH:(c + 1) * CH]                      # (CH,128)
            onehot = (blk[:, :, None] == cols[None]).astype(jnp.bfloat16)
            acc += jnp.sum(onehot, axis=0)                    # VPU reduce
        counts = jnp.sum(acc, axis=0)                          # (256,)
        o_ref[0] = counts.reshape(2, 128).astype(jnp.int32).reshape(1, 2, 128)[0]

    f = jax.jit(lambda x: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((x.shape[0] // TILE, 2, 128), jnp.int32),
        grid=(x.shape[0] // TILE,),
        in_specs=[pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x))
    t, out = timeit(f, lambda r: (rand_u32(N // 4, r),))
    ok = int(np.asarray(out).sum()) == N // 4
    print(f"pallas_hist_onehot D=256: {t*1e3:.2f}ms -> {(N//4)*4/1e9/t:.0f} GB/s, ok={ok}")


@probe("pallas_dma_issue")
def p_dma():
    """Economics of many dynamic-offset DMA copies HBM->VMEM."""
    n = 1 << 24
    for S in (512, 2048, 8192):
        TILE = 1 << 19
        K = TILE // S
        NSLOT = 8

        def kernel(off_ref, x_hbm, o_ref, scratch, sems):
            i = pl.program_id(0)

            def dma(k):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(off_ref[i, k], S)],
                    scratch.at[pl.ds(k * S, S)],
                    sems.at[k % NSLOT],
                )

            for k in range(K):
                dma(k).start()
                if k >= NSLOT:
                    dma(k - NSLOT).wait()
            for k in range(max(0, K - NSLOT), K):
                dma(k).wait()
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
        gb = 2 * n * 4 / 1e9
        print(f"pallas_dma S={S:5}: {t*1e3:7.2f}ms, {ndma:6d} DMAs "
              f"-> {t/ndma*1e9:6.0f} ns/DMA, {gb/t:5.0f} GB/s effective")


@probe("pallas_vmem_gather_sublane")
def p_vmem_gather():
    R, L = 1024, 128

    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    f = jax.jit(lambda x, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i))

    def mk(r):
        rng = np.random.default_rng(r)
        return (rng.integers(0, 1000, (R, L)).astype(np.int32),
                rng.integers(0, R, (R, L)).astype(np.int32))

    t, out = timeit(f, mk)
    x, i = mk(4)
    ok = bool(np.array_equal(np.asarray(jax.jit(lambda x, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i))(jnp.asarray(x), jnp.asarray(i))), np.take_along_axis(x, i, axis=0)))
    print(f"pallas_vmem_gather_sublane (1024,128): {t*1e6:.0f}us correct={ok}")


@probe("pallas_vmem_gather_lane")
def p_vmem_gather_lane():
    """Dynamic gather along the lane (last) axis."""
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
    t, out = timeit(f, mk)
    x, i = mk(1)
    print(f"pallas_vmem_gather_lane (8,128): {t*1e6:.0f}us")


@probe("xla_sort_segmented")
def p_sort_seg():
    """Many small independent sorts (post-binning): (4096, 4096) rows."""
    B, M = 4096, 4096
    f = jax.jit(lambda x: jnp.sort(x, axis=1))
    t, _ = timeit(f, lambda r: (rand_u32(B * M, r).reshape(B, M),))
    n = B * M
    print(f"xla_sort rows {B}x{M}: {t*1e3:.2f}ms -> {n/t/1e6:.1f} M keys/s")


@probe("xla_sort_seg_small")
def p_sort_seg2():
    B, M = 32768, 512
    f = jax.jit(lambda x: jnp.sort(x, axis=1))
    t, _ = timeit(f, lambda r: (rand_u32(B * M, r).reshape(B, M),))
    n = B * M
    print(f"xla_sort rows {B}x{M}: {t*1e3:.2f}ms -> {n/t/1e6:.1f} M keys/s")


@probe("lax_sort_kv")
def p_sort_kv():
    n = 1 << 24
    f = jax.jit(lambda k, v: jax.lax.sort_key_val(k, v, is_stable=True))
    t, _ = timeit(f, lambda r: (rand_u32(n, r), np.arange(n, dtype=np.uint32)))
    print(f"lax_sort_kv n={n}: {t*1e3:.2f}ms -> {n/t/1e6:.1f} M pairs/s")


@probe("lax_sort_u32_unstable")
def p_sort_u32_16m():
    n = 1 << 24
    f = jax.jit(jnp.sort)
    t, _ = timeit(f, lambda r: (rand_u32(n, r),))
    print(f"lax_sort n={n}: {t*1e3:.2f}ms -> {n/t/1e6:.1f} M keys/s")


ALL = [p_copy, p_sort, p_gather, p_gather_coherent, p_scatter, p_cumsum,
       p_hist16, p_hist256, p_hist_mm, p_dma, p_vmem_gather,
       p_vmem_gather_lane, p_sort_seg, p_sort_seg2, p_sort_kv, p_sort_u32_16m]



# ---------------------------------------------------------------------------
# Amortized probes: K iterations chained inside one jit call to cancel the
# ~25ms tunnel dispatch overhead.
# ---------------------------------------------------------------------------

def chain_time(op, x0, K=16):
    """Time op applied K times in sequence inside one jit; returns s/op."""
    f = jax.jit(lambda x: jax.lax.fori_loop(0, K, lambda i, x: op(x, i), x0))
    t, _ = timeit(f, lambda r: (np.asarray(x0) ^ np.uint32(r) if x0.dtype == np.uint32 else x0,), reps=3)
    return t / K


@probe("amortized_copy2d")
def pa_copy2d():
    n = N
    x = rand_u32(n, 0).reshape(n // 128, 128)
    TILE_R = 4096

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    def copy(x, i):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
            grid=(x.shape[0] // TILE_R,),
            in_specs=[pl.BlockSpec((TILE_R, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TILE_R, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(x) ^ i.astype(jnp.uint32)

    t = chain_time(copy, x, K=8)
    gb = 2 * n * 4 / 1e9
    print(f"amortized copy2d: {t*1e3:.2f}ms/op -> {gb/t:.0f} GB/s")


@probe("amortized_sort")
def pa_sort():
    for n in (1 << 21, 1 << 24):
        x = rand_u32(n, 1)
        t = chain_time(lambda x, i: jnp.sort(x) ^ i.astype(jnp.uint32), x, K=8)
        print(f"amortized lax_sort n={n}: {t*1e3:.2f}ms -> {n/t/1e6:.1f} M keys/s")


@probe("amortized_gather")
def pa_gather():
    n = 1 << 24
    x = rand_u32(n, 2)
    idx = np.random.default_rng(3).permutation(n).astype(np.int32)
    idxd = jax.device_put(idx)

    t = chain_time(lambda x, i: jnp.take(x, idxd) ^ i.astype(jnp.uint32), x, K=8)
    print(f"amortized gather n={n}: {t*1e3:.2f}ms -> {n/t/1e6:.1f} M elem/s")


@probe("amortized_sort_seg")
def pa_sort_seg():
    for B, M in ((4096, 4096), (32768, 512), (512, 32768)):
        x = rand_u32(B * M, 4).reshape(B, M)
        t = chain_time(lambda x, i: jnp.sort(x, axis=1) ^ i.astype(jnp.uint32), x, K=8)
        print(f"amortized rows sort {B}x{M}: {t*1e3:.2f}ms -> {B*M/t/1e6:.1f} M keys/s")


ALL += [pa_copy2d, pa_sort, pa_gather, pa_sort_seg]

if __name__ == "__main__":
    names = sys.argv[1:]
    for f in ALL:
        if names and f.__name__ not in names:
            continue
        f()
