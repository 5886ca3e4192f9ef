"""On-chip storage-backend probe (round 3): device vs mem after fusion.

Round-2 baseline (docs/BENCH_R2.md): device backend 4.94 s vs mem 7.36 s
at 8M keys / 2 workers — the zero-copy loop was dispatch-latency-bound on
the ~27 ms relay.  Round 3 fused the whole device-resident round into one
jitted program (~2 relay dispatches/round, storage_sort.
_sort_rounds_device_fused); this re-measures the same configuration.

Run alone (one process owns the TPU):  python benchmarks/probe_storage.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from gpu_radix_sort_tpu.data import DeviceArrayFactory, MemArrayFactory  # noqa: E402
from gpu_radix_sort_tpu.parallel.storage_sort import (  # noqa: E402
    SortStats,
    sort_distrib_from_raw,
)
from gpu_radix_sort_tpu.utils.keygen import Pcg32  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def run(factory_cls, keys, nworker, width, tag, reps=3):
    want = np.sort(keys)
    times = []
    for r in range(reps):
        factory = factory_cls()
        stats = SortStats()
        t0 = time.perf_counter()
        out = sort_distrib_from_raw(
            keys, f"probe_{tag}_{r}", factory,
            width=width, nworker=nworker, stats=stats,
        )
        dt = time.perf_counter() - t0
        np.testing.assert_array_equal(out, want)
        times.append(dt)
        log(f"  {tag} rep{r}: {dt:.2f}s")
    med = sorted(times)[len(times) // 2]
    log(f"{tag}: median {med:.2f}s = {keys.size / med / 1e6:.2f}M keys/s")
    return med


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8 * 1024 * 1024
    nworker = 2
    width = 8
    keys = Pcg32(9).fill(n)
    results = {"n": n, "nworker": nworker, "width": width}
    results["device_s"] = run(DeviceArrayFactory, keys, nworker, width, "device")
    results["mem_s"] = run(MemArrayFactory, keys, nworker, width, "mem")
    results["device_vs_mem"] = results["mem_s"] / results["device_s"]
    print(json.dumps(results))


if __name__ == "__main__":
    main()
