"""b_out=2^17 merge-level probe (VERDICT r4 item 1, 'larger b_out' lever).

Halving the block count halves the per-level fixed costs (split-search
elements, per-block DMA issue, rotations, folds) at +1 network stage per
element (17 vs 16) and 2x the window VMEM.  Level 1 (L = TILE = 2^17)
cannot use b_out=2^17 (window containment needs L >= w_rows*128 = 132096),
so the variant runs level 1 at b_out=2^16 and the rest at 2^17, extending
the headroom rows once at the transition (~1 MB write).

Same-process interleaved A/B vs the production b_out=2^16 composition,
exactness-gated at 64M.  Run ON the TPU from the repo root.
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
BIG = 1 << 17


def log(m):
    print(m, file=sys.stderr, flush=True)


def sort_full_big_bout(keys):
    """sort_full_large with b_out=2^17 for every level above the first."""
    tile = pm.TILE
    n = keys.shape[0]
    n_pad = pm._padded_n(n, tile)
    padded = jnp.concatenate(
        [keys.astype(jnp.uint32),
         jnp.full((n_pad - n,), pm.PAD, jnp.uint32)]
    )
    x2d = pm._rowstage_prep(padded, tile, pm.STAGE1_ROWS)
    tile_rows = tile // pm.LANES
    tail = -(-pm._pad_rows(1 << 16) // tile_rows) * tile_rows
    x = pm.sort_tiles(
        x2d, tile, alternate=True, tail_rows=tail, prerun=pm.STAGE1_ROWS
    )
    # level 1 at b_out=2^16 (window containment), rest at 2^17
    x = pm.merge_level(x, tile, 1 << 16, n=n_pad)
    need = n_pad // pm.LANES + pm._pad_rows(BIG)
    if x.shape[0] < need:
        x = jnp.concatenate(
            [x, jnp.full((need - x.shape[0], pm.LANES), pm.PAD, jnp.uint32)]
        )
    L = 2 * tile
    while L < n_pad:
        x = pm.merge_level(x, L, BIG, n=n_pad)
        L *= 2
    return x.reshape(-1)[:n_pad][:n]


def build_chain(fn, dev_keys, tag):
    def chained(k):
        def body(i, acc):
            s = fn(acc)
            x = s * jnp.uint32(0x9E3779B1) + i.astype(jnp.uint32)
            return x ^ (x >> jnp.uint32(16))

        return lax.fori_loop(0, REP, body, k)

    cfn = jax.jit(chained)
    t0 = time.perf_counter()
    jax.block_until_ready(cfn(dev_keys))
    log(f"{tag}: chain compile+run {time.perf_counter() - t0:.1f}s")
    return cfn


def chain_time(cfn, dev_keys, label):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(cfn(dev_keys))
        ts.append(time.perf_counter() - t0)
    t = statistics.median(ts) / REP
    log(f"{label}: {t * 1e3:.2f}ms/sort = {N / t / 1e6:.1f}M keys/s")
    return t


def main():
    log(f"device: {jax.devices()[0]}")
    keys = Pcg32().fill(N)
    dev_keys = jax.device_put(keys)
    want = np.sort(keys)

    for tag, fn in (
        ("prod_b16", pm.sort_full_large),
        ("big_b17", sort_full_big_bout),
    ):
        got = np.asarray(jax.block_until_ready(jax.jit(fn)(dev_keys)))
        assert np.array_equal(got, want), f"{tag} WRONG"
        log(f"{tag}: exact")

    cfn_p = build_chain(pm.sort_full_large, dev_keys, "prod_b16")
    cfn_b = build_chain(sort_full_big_bout, dev_keys, "big_b17")

    results = {}
    for rnd in range(2):
        for tag, cfn in (("prod_b16", cfn_p), ("big_b17", cfn_b)):
            results.setdefault(tag, []).append(
                chain_time(cfn, dev_keys, f"{tag} r{rnd}")
            )
    for tag, ts in results.items():
        best = min(ts)
        log(f"FINAL {tag}: {best * 1e3:.2f}ms = {N / best / 1e6:.1f}M keys/s")


if __name__ == "__main__":
    main()
