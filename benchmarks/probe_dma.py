"""Bisect which DMA constructs Mosaic supports here (2D shapes)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probe_tpu import timeit, probe, rand_u32


def run_case(name, kernel, n_rows, extra_scratch=()):
    x = rand_u32(n_rows * 128, 0).reshape(n_rows, 128)
    f = jax.jit(lambda x: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((256, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((8,)),
            *extra_scratch,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x))
    try:
        out = np.asarray(f(jnp.asarray(x)))
        print(f"{name}: OK")
        return True
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:150]}")
        return False


# 1: single static-offset DMA HBM->VMEM
def k1(x_hbm, o_ref, scratch, sems):
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(256, 256), :], scratch, sems.at[0])
    cp.start(); cp.wait()
    o_ref[:] = scratch[:]


# 2: dynamic offset from program arithmetic
def k2(x_hbm, o_ref, scratch, sems):
    off = jax.lax.rem(pl.program_id(0) * 7919, 512) * 8
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(off, 256), :], scratch, sems.at[0])
    cp.start(); cp.wait()
    o_ref[:] = scratch[:]


# 3: DMA into dynamic slice of scratch
def k3(x_hbm, o_ref, scratch, sems):
    off = jax.lax.rem(pl.program_id(0), 2) * 128
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(0, 128), :], scratch.at[pl.ds(off, 128), :], sems.at[0])
    cp.start(); cp.wait()
    cp2 = pltpu.make_async_copy(
        x_hbm.at[pl.ds(128, 128), :],
        scratch.at[pl.ds(128 - off, 128), :], sems.at[1])
    cp2.start(); cp2.wait()
    o_ref[:] = scratch[:]


# 4: DMA inside unrolled python loop, 8 in flight
def k4(x_hbm, o_ref, scratch, sems):
    for k in range(8):
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(k * 32, 32), :],
            scratch.at[pl.ds(k * 32, 32), :], sems.at[k]).start()
    for k in range(8):
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(k * 32, 32), :],
            scratch.at[pl.ds(k * 32, 32), :], sems.at[k]).wait()
    o_ref[:] = scratch[:]


# 5: DMA inside fori_loop with traced offsets
def k5(x_hbm, o_ref, scratch, sems):
    def body(k, _):
        off = jax.lax.rem(k * 104729, 512) * 8

        def dma():
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(off, 32), :],
                scratch.at[pl.ds(jax.lax.rem(k, 8) * 32, 32), :],
                sems.at[jax.lax.rem(k, 8)])
        dma().start()
        dma().wait()
        return 0
    jax.lax.fori_loop(0, 8, body, 0)
    o_ref[:] = scratch[:]


# 6: 1-D refs (like the failing probe)
def k6(x_hbm, o_ref, scratch, sems):
    flat = x_hbm.reshape(-1) if hasattr(x_hbm, "reshape") else x_hbm
    o_ref[:] = scratch[:]


if __name__ == "__main__":
    run_case("k1_static", k1, 4096)
    run_case("k2_dyn_src", k2, 4096)
    run_case("k3_dyn_dst", k3, 4096)
    run_case("k4_unrolled8", k4, 4096)
    run_case("k5_foriloop", k5, 4096)
