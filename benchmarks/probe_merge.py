"""On-chip merge-sort phase breakdown (round 3).

Splits the 120.4ms/64M headline into stage-1 (VMEM bitonic tile sort)
and the 9 pairwise merge levels, via repeat chains of each phase alone.
Informs whether the next lever is fewer levels (4-way merge), a cheaper
stage 1, or neither.

Run alone (one process owns the TPU):  python benchmarks/probe_merge.py
"""

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")
from gpu_radix_sort_tpu.ops import pallas_merge as pm  # noqa: E402
from gpu_radix_sort_tpu.utils.keygen import Pcg32  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def drain(out):
    np.asarray(jax.device_get(out.reshape(-1)[:1]))


def chain_time(fn, x, rep=8, outer=3):
    def chained(v):
        def body(i, acc):
            out = fn(acc)
            # remix so iterations can't be CSE'd; same shape/dtype
            return out ^ (i.astype(jnp.uint32) + jnp.uint32(1))

        return lax.fori_loop(0, rep, body, v)

    f = jax.jit(chained)
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(x))
    drain(out)
    log(f"  compile+first: {time.perf_counter() - t0:.1f}s")
    times = []
    for _ in range(outer):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(x))
        times.append(time.perf_counter() - t0)
    drain(out)
    return statistics.median(times) / rep


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 26
    tile, b_out = pm.TILE, pm.B_OUT
    keys = jnp.asarray(Pcg32(1).fill(n))
    rows = n // pm.LANES
    tail = -(-pm._pad_rows(b_out) // (tile // pm.LANES)) * (tile // pm.LANES)
    results = {"n": n}

    # stage 1 alone
    t = chain_time(
        lambda v: pm.sort_tiles(
            v.reshape(-1, pm.LANES), tile, alternate=True, tail_rows=tail
        ).reshape(-1)[:n],
        keys,
    )
    log(f"stage-1 tile sort ({n // tile} tiles): {t*1e3:.1f}ms")
    results["stage1_ms"] = t * 1e3

    # one merge level alone (L = tile): input must be tile-sorted w/ headroom
    x0 = jax.jit(
        lambda v: pm.sort_tiles(
            v.reshape(-1, pm.LANES), tile, alternate=True, tail_rows=tail
        )
    )(keys)
    x0 = jax.block_until_ready(x0)

    # keep shapes compatible for chaining: merge_level wants headroom rows
    def level_fn(v):
        out = pm.merge_level(v, tile, b_out, n=n)
        return out

    t = chain_time(level_fn, x0)
    nlevels = (n - 1).bit_length() - (tile - 1).bit_length()
    log(f"one merge level (L=tile): {t*1e3:.1f}ms x {nlevels} levels "
        f"= {t*1e3*nlevels:.1f}ms")
    results["level_ms"] = t * 1e3
    results["nlevels"] = nlevels

    # full sort for reference
    t = chain_time(lambda v: pm.sort_full_large(v), keys, rep=4)
    log(f"full sort: {t*1e3:.1f}ms = {n/t/1e6:.0f}M keys/s")
    results["full_ms"] = t * 1e3
    print(json.dumps(results))


if __name__ == "__main__":
    main()
