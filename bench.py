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

    print(json.dumps({
        "metric": "keys_per_s_per_chip_full_sort_u32",
        "value": round(rate, 1),
        "unit": "keys/s",
        "vs_baseline": round(rate / BASELINE_KEYS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
