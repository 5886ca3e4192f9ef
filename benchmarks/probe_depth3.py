"""Depth-3 window-pipeline probe (round 5): price the floor derivation's
"imperfect DMA/VPU overlap" residual.  Same-process interleaved A/B of
sort_full_large with DMA_DEPTH 2 (production) vs 3, exactness-gated at
64M.  depth is part of the _merge_call cache key and read at trace time.

Run ON the TPU from the repo root.
"""

import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gpu_radix_sort_tpu.ops import pallas_merge as pm
from gpu_radix_sort_tpu.utils.keygen import Pcg32

N = 64 * 1024 * 1024
REP = 10


def log(m):
    print(m, file=sys.stderr, flush=True)


def build_chain(depth, dev_keys):
    pm.DMA_DEPTH = depth

    def chained(k):
        def body(i, acc):
            s = pm.sort_full_large(acc)
            x = s * jnp.uint32(0x9E3779B1) + i.astype(jnp.uint32)
            return x ^ (x >> jnp.uint32(16))

        return lax.fori_loop(0, REP, body, k)

    cfn = jax.jit(chained)
    t0 = time.perf_counter()
    jax.block_until_ready(cfn(dev_keys))
    log(f"depth={depth}: chain compile+run {time.perf_counter() - t0:.1f}s")
    return cfn


def main():
    import inspect

    if "depth" not in inspect.signature(pm._merge_call).parameters:
        sys.exit(
            "probe_depth3: the library's depth parameterization was "
            "REVERTED after the negative measurement (PERF_NOTES round-5 "
            "late) — re-apply this probe's commit diff to pallas_merge.py "
            "before running, or the A/B would silently compare depth-2 "
            "against itself."
        )
    log(f"device: {jax.devices()[0]}")
    keys = Pcg32().fill(N)
    dev_keys = jax.device_put(keys)
    want = np.sort(keys)
    for depth in (2, 3):
        pm.DMA_DEPTH = depth
        got = np.asarray(
            jax.block_until_ready(jax.jit(pm.sort_full_large)(dev_keys))
        )
        assert np.array_equal(got, want), f"depth={depth} WRONG"
        log(f"depth={depth}: exact")
    c2 = build_chain(2, dev_keys)
    c3 = build_chain(3, dev_keys)
    results = {}
    for rnd in range(2):
        for tag, cfn in (("2", c2), ("3", c3)):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(cfn(dev_keys))
                ts.append(time.perf_counter() - t0)
            t = statistics.median(ts) / REP
            log(f"depth={tag} r{rnd}: {t * 1e3:.2f}ms/sort = "
                f"{N / t / 1e6:.1f}M keys/s")
            results.setdefault(tag, []).append(t)
    pm.DMA_DEPTH = 2
    for tag, ts in results.items():
        best = min(ts)
        log(f"FINAL depth={tag}: {best * 1e3:.2f}ms = "
            f"{N / best / 1e6:.1f}M keys/s")


if __name__ == "__main__":
    main()
