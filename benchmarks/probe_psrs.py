"""On-chip PSRS local-sort engine routing probe (round 3).

The keys-only PSRS round is two full keys-only sorts (local + reassembly)
plus one small collective round-trip.  Routing both through the
strategy-dispatched sort_full puts them on the Pallas merge engine at
production shard sizes; this times the P=1 self-loop round with the
engine vs pinned XLA sorts.

Run alone (one process owns the TPU):  python benchmarks/probe_psrs.py
"""

import json
import sys

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, ".")
from gpu_radix_sort_tpu.bench.harness import device_time  # noqa: E402
from gpu_radix_sort_tpu.ops import radix_sort  # noqa: E402
from gpu_radix_sort_tpu.parallel.sample_sort import (  # noqa: E402
    build_sample_sort,
)
from gpu_radix_sort_tpu.utils.keygen import Pcg32  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 24
    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
    keys = Pcg32(42).fill(n)
    dev = jax.device_put(keys, NamedSharding(mesh, P("x")))
    want = np.sort(keys)
    results = {"n": n}

    for strategy in ("xla", "auto"):
        radix_sort.set_default_strategy(strategy)
        try:
            fn, capacity = build_sample_sort(mesh, n)
            med, _, sd, out = device_time(fn, (dev,), reps=5)
            shards, counts, ovf = out
            assert int(ovf) == 0
            c0 = int(np.asarray(counts)[0])
            got = np.asarray(jax.device_get(shards))[:c0]
            np.testing.assert_array_equal(got, want)
        finally:
            radix_sort.set_default_strategy("auto")
        ms = med * 1e3
        log(f"psrs round (local sorts = {strategy:4s}): {ms:8.1f} ms "
            f"({n / med / 1e6:6.0f}M keys/s)  sd {sd*1e3:.1f}")
        results[f"psrs_{strategy}_ms"] = ms
    print(json.dumps(results))


if __name__ == "__main__":
    main()
