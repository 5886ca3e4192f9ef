"""A/B probe: multiway (K=8) vs binary merge-path split search (round 5).

Same-process interleaved chains (PERF_NOTES: cross-process variance on the
tunneled chip runs ~20%; only interleaved same-process comparisons are
load-bearing).  Exactness-gated at 64M.

Run ON the TPU: python benchmarks/probe_split8.py
"""

import statistics
import sys
import time

sys.path.insert(0, ".")  # run from the repo root

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


def binary_merge_splits(x2d, L, n, b_out):
    """The round-4 binary search, verbatim, for the A side."""
    x = x2d.reshape(-1)
    nblocks = n // b_out
    two_l = 2 * L
    bpp = two_l // b_out
    g = jnp.arange(nblocks, dtype=jnp.int32)
    pair = g // bpp
    d = (pair & 1) == 1
    base = pair * two_l
    r = (g % bpp) * b_out
    off1 = jnp.where(d, L, 0)

    lo = jnp.maximum(0, r - L)
    hi = jnp.minimum(L, r)
    for _ in range(int(np.log2(L)) + 2):
        mid = (lo + hi + 1) // 2
        i1 = base + off1 + mid - 1
        i2 = base + jnp.where(d, L - 1, two_l - 1) - (r - mid)
        probes = x[jnp.stack([jnp.clip(i1, 0, n - 1), jnp.clip(i2, 0, n - 1)])]
        p1, p2 = probes[0], probes[1]
        in_range = (r - mid) < L
        cond = jnp.where(d, p2 <= p1, p1 <= p2)
        ok = (mid == 0) | ~in_range | cond
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid - 1)
    a = lo

    s1 = base + off1 + a
    e1 = base + off1 + L
    e2 = base + jnp.where(d, L, two_l) - (r - a)
    s2 = base + jnp.where(d, 0, L)
    return (
        (s1 // pm.LANES).astype(jnp.int32),
        s1.astype(jnp.int32),
        e1.astype(jnp.int32),
        e2.astype(jnp.int32),
        s2.astype(jnp.int32),
        d.astype(jnp.int32),
    )


def build_chain(splits, dev_keys):
    """Jit + compile the REP-chain with the given split implementation
    pinned at trace time (the module global is read when tracing)."""
    pm._merge_splits = splits

    def chained(k):
        def body(i, acc):
            s = pm.sort_full_large(acc)
            x = s * jnp.uint32(0x9E3779B1) + i.astype(jnp.uint32)
            return x ^ (x >> jnp.uint32(16))

        return lax.fori_loop(0, REP, body, k)

    cfn = jax.jit(chained)
    jax.block_until_ready(cfn(dev_keys))  # compile
    return cfn


def chain_time(cfn, dev_keys, label):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(cfn(dev_keys))
        ts.append(time.perf_counter() - t0)
    t = statistics.median(ts) / REP
    log(f"{label}: {t * 1e3:.2f}ms/sort = {N / t / 1e6:.1f}M keys/s "
        f"({[f'{x:.3f}' for x in ts]})")
    return t


def main():
    log(f"device: {jax.devices()[0]}")
    keys = Pcg32().fill(N)
    dev_keys = jax.device_put(keys)
    want = np.sort(keys)

    multiway = pm._merge_splits

    def run_variant(splits, tag):
        pm._merge_splits = splits
        fn = jax.jit(lambda k: pm.sort_full_large(k))
        got = np.asarray(jax.block_until_ready(fn(dev_keys)))
        assert np.array_equal(got, want), f"{tag} output WRONG"
        log(f"{tag}: exact")
        return fn

    run_variant(binary_merge_splits, "binary")
    run_variant(multiway, "multiway")
    cfn_b = build_chain(binary_merge_splits, dev_keys)
    cfn_m = build_chain(multiway, dev_keys)

    # interleaved A/B x2
    results = {}
    for rnd in range(2):
        for tag, cfn in (("binary", cfn_b), ("multiway", cfn_m)):
            results.setdefault(tag, []).append(
                chain_time(cfn, dev_keys, f"{tag} r{rnd}")
            )
    pm._merge_splits = multiway
    for tag, ts in results.items():
        best = min(ts)
        log(f"FINAL {tag}: best {best * 1e3:.2f}ms = "
            f"{N / best / 1e6:.1f}M keys/s")


if __name__ == "__main__":
    main()
