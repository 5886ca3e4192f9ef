"""Headline benchmark: single-chip uint32 full-sort throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's derived full 32-bit sort rate of ~76M keys/s/GPU
(BASELINE.md: 16 two-bit passes on 256Mi keys, analysis/libsort8b.csv).
Workload: BASELINE.json config 2 — 64M uint32 keys, single chip.

Diagnostics (secondary metrics, per-phase timings) go to stderr; stdout
carries exactly the one JSON line the driver records.
"""

from __future__ import annotations

import json
import statistics
import sys
import time


BASELINE_KEYS_PER_S = 76e6  # reference full-sort rate per GPU (BASELINE.md)
N = 64 * 1024 * 1024


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import numpy as np

    import gpu_radix_sort_tpu as gst

    dev = jax.devices()[0]
    log(f"device: {dev} backend={jax.default_backend()}")

    n = N if jax.default_backend() == "tpu" else 1 << 22
    keys = gst.generate_keys(n)
    dev_keys = jax.device_put(keys, dev)

    fn = jax.jit(lambda k: gst.sort_full(k))
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
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(dev_keys))
        times.append(time.perf_counter() - t0)
    t = statistics.median(times)
    rate = n / t
    log(f"n={n} median={t * 1e3:.2f}ms over {reps} reps -> {rate / 1e6:.1f}M keys/s "
        f"(times: {[f'{x * 1e3:.1f}ms' for x in times]})")

    print(json.dumps({
        "metric": "keys_per_s_per_chip_full_sort_u32",
        "value": round(rate, 1),
        "unit": "keys/s",
        "vs_baseline": round(rate / BASELINE_KEYS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
