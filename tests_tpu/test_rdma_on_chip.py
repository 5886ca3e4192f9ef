"""RDMA exchange through the REAL Mosaic compiler (self-loop mesh).

The multi-chip evidence for ``exchange="rdma"`` is interpreter-mode
(pltpu.InterpretParams on the virtual CPU mesh, tests/test_distributed.py).
The Mosaic compiler rejects constructs the interpreter accepts (1-D-ref
DMA, gather shapes — docs/PERF_NOTES.md capability map), so "first-class"
needs compiled proof: a 1-device mesh makes every ``make_async_remote_copy``
a self-loop over the real DMA engine, exercising the kernel — barrier
semaphore, chunked remote copies at counts-derived offsets, the
recreate-to-wait drains — through the actual compiler and hardware.

Mirrors the repartition plane of the reference
(benchmark/pkg/sort/distrib.go:119-158).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpu_radix_sort_tpu.parallel import distributed
from gpu_radix_sort_tpu.parallel.rdma_exchange import exchange_round_rdma
from gpu_radix_sort_tpu.utils.keygen import Pcg32


def _mesh1():
    return Mesh(np.array(jax.devices()[:1]), ("x",))


def test_rdma_round_compiled_self_loop():
    """One width-8 round at n_local = 2^20 through the compiled kernel."""
    mesh = _mesh1()
    n = 1 << 20
    keys = Pcg32().fill(n)
    dev = jax.device_put(keys, NamedSharding(mesh, P("x")))

    def round_(local):
        out, _ = exchange_round_rdma(local, 8, 8, "x", strategy="xla")
        return out

    fn = jax.jit(
        jax.shard_map(
            round_, mesh=mesh, in_specs=P("x"), out_specs=P("x"),
            check_vma=False,
        )
    )
    got = np.asarray(jax.device_get(fn(dev)))
    digits = (keys >> np.uint32(8)) & np.uint32(0xFF)
    np.testing.assert_array_equal(got, keys[np.argsort(digits, kind="stable")])


def test_rdma_full_lsd_compiled_self_loop():
    """Full 32-bit LSD via exchange='rdma' on the 1-device mesh (reuses the
    compiled kernel geometry from the round test when run in-process)."""
    n = 1 << 20
    keys = Pcg32(999).fill(n)
    out = distributed.sort_distributed(
        keys, mesh=_mesh1(), width=8, exchange="rdma", strategy="xla"
    )
    np.testing.assert_array_equal(np.asarray(out), np.sort(keys))


@pytest.mark.overlap
def test_rdma_overlap_round_compiled_self_loop():
    """One width-8 OVERLAPPED round (parallel/rdma_overlap.py) at
    n_local = 2^20 (G=16 groups of 2^16) through the real compiler: the
    in-kernel composite-key bitonic sort, HBM staging copies, per-group
    remote chunk DMAs and the final drain all lower through Mosaic, and
    group g's sends genuinely overlap group g+1's sort on the hardware
    DMA engine."""
    from gpu_radix_sort_tpu.parallel.rdma_overlap import (
        exchange_round_rdma_overlapped,
    )

    mesh = _mesh1()
    n = 1 << 20
    keys = Pcg32(77).fill(n)
    dev = jax.device_put(keys, NamedSharding(mesh, P("x")))

    def round_(local):
        out, _ = exchange_round_rdma_overlapped(local, 8, 8, "x")
        return out

    fn = jax.jit(
        jax.shard_map(
            round_, mesh=mesh, in_specs=P("x"), out_specs=P("x"),
            check_vma=False,
        )
    )
    got = np.asarray(jax.device_get(fn(dev)))
    digits = (keys >> np.uint32(8)) & np.uint32(0xFF)
    np.testing.assert_array_equal(got, keys[np.argsort(digits, kind="stable")])


def test_rdma_overlap_full_lsd_compiled_self_loop():
    """Full 32-bit LSD via exchange='rdma_overlap' on the 1-device mesh."""
    n = 1 << 20
    keys = Pcg32(1234).fill(n)
    out = distributed.sort_distributed(
        keys, mesh=_mesh1(), width=8, exchange="rdma_overlap"
    )
    np.testing.assert_array_equal(np.asarray(out), np.sort(keys))
