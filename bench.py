"""Headline benchmark: single-chip uint32 full-sort throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's derived full 32-bit sort rate of ~76M keys/s/GPU
(BASELINE.md: 16 two-bit passes on 256Mi keys, summed from nvprof
device-activity time, analysis/libsort8b.csv).  Workload: BASELINE.json
config 2 — 64M uint32 keys, single chip.

Measurement: an in-program repeat chain (REP data-dependent sorts per
dispatch) so the figure is device throughput, matching how the baseline was
derived (nvprof sums kernel+memcpy activity and excludes host dispatch).
The tunneled runtime here adds ~27ms of relay overhead per dispatch
(docs/PERF_NOTES.md), which single-call timing would wrongly charge to the
chip; the raw single-call median is still reported on stderr.

Diagnostics go to stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import json
import statistics
import sys
import time


BASELINE_KEYS_PER_S = 76e6  # reference full-sort rate per GPU (BASELINE.md)
N = 64 * 1024 * 1024
REP = 10
HBM_BW_BYTES_PER_S = 540e9  # measured Pallas HBM streaming rate (PERF_NOTES)


def traffic_bound_rate(n: int) -> float:
    """The architecture's HBM speed-of-light rate in keys/s: every stage of
    sort_full_large (XLA row-stage prep, the tile-sort grid, and each merge
    level) reads and writes the padded array once, so the minimum HBM
    traffic is stages * 2 * 4 bytes * n_pad moved at the measured streaming
    bandwidth.  Tracks the north star's "speed-of-light" axis per round
    (VERDICT r4 item 8)."""
    from gpu_radix_sort_tpu.ops import pallas_merge as pm

    n_pad = pm._padded_n(n)
    levels = (n_pad // pm.TILE).bit_length() - 1
    stages = 2 + levels  # _rowstage_prep + sort_tiles + merge levels
    traffic = stages * 2 * 4 * n_pad
    return n / (traffic / HBM_BW_BYTES_PER_S)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax
    import numpy as np

    import gpu_radix_sort_tpu as gst

    dev = jax.devices()[0]
    log(f"device: {dev} backend={jax.default_backend()}")

    n = N if jax.default_backend() == "tpu" else 1 << 22
    keys = gst.generate_keys(n)
    dev_keys = jax.device_put(keys, dev)

    fn = jax.jit(lambda k: gst.sort_full(k))

    def chained(k):
        def body(i, acc):
            s = gst.sort_full(acc)
            # Data dependency across iterations defeats CSE, and the remix
            # must actually unsort the stream: a cheap bijection (odd-
            # multiplier + xor-shift) re-randomizes between iterations so a
            # data-dependent sort path can't coast on presorted input.
            x = s * jnp.uint32(0x9E3779B1) + i.astype(jnp.uint32)
            return x ^ (x >> jnp.uint32(16))

        return lax.fori_loop(0, REP, body, k)

    chain_fn = jax.jit(chained)

    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(dev_keys))
    log(f"first call (compile+run): {time.perf_counter() - t0:.3f}s")

    # correctness gate before timing
    got = np.asarray(out)
    if not np.array_equal(got, np.sort(keys)):
        log("FATAL: sort output mismatch")
        print(json.dumps({"metric": "keys_per_s_per_chip_full_sort_u32",
                          "value": 0.0, "unit": "keys/s",
                          "vs_baseline": 0.0}))
        sys.exit(1)

    reps = 5
    single = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(dev_keys))
        single.append(time.perf_counter() - t0)
    t_single = statistics.median(single)
    log(f"single-call median: {t_single * 1e3:.2f}ms "
        f"({n / t_single / 1e6:.1f}M keys/s incl. dispatch overhead)")

    jax.block_until_ready(chain_fn(dev_keys))  # compile
    chain_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chain_fn(dev_keys))
        chain_times.append(time.perf_counter() - t0)
    t_sort = statistics.median(chain_times) / REP
    rate = n / t_sort
    log(f"n={n} device-time/sort={t_sort * 1e3:.2f}ms over {REP}-chain x3 "
        f"-> {rate / 1e6:.1f}M keys/s "
        f"(chain times: {[f'{x:.3f}s' for x in chain_times]})")

    bound = traffic_bound_rate(n)
    log(f"HBM traffic bound: {bound / 1e6:.1f}M keys/s -> "
        f"speed-of-light fraction {rate / bound:.3f}")
    print(json.dumps({
        "metric": "keys_per_s_per_chip_full_sort_u32",
        "value": round(rate, 1),
        "unit": "keys/s",
        "vs_baseline": round(rate / BASELINE_KEYS_PER_S, 3),
        "sol_bound_keys_per_s": round(bound, 1),
        "sol_fraction": round(rate / bound, 4),
    }))


if __name__ == "__main__":
    main()
