"""On-chip issue-overlap probe for the overlapped RDMA exchange (round 3).

Self-loop (P=1) mesh on the real chip: every remote chunk is a true DMA
through the hardware engine, so the gap between ``serial=True`` (drain
each group's sends before the next group sorts — the strict sort->send
ordering of exchange='rdma') and ``serial=False`` (sends ride out while
later groups sort) is the measured overlap win for the SAME kernel, same
schedule, same bytes.  Also times the plain rdma round (XLA digit sort +
one-shot exchange kernel) and the XLA digit sort alone for context.

Run alone (one process owns the TPU):  python benchmarks/probe_overlap.py
"""

import json
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, ".")
from gpu_radix_sort_tpu.bench.harness import device_time  # noqa: E402
from gpu_radix_sort_tpu.ops.radix_sort import sort_by_digits  # noqa: E402
from gpu_radix_sort_tpu.parallel.rdma_exchange import (  # noqa: E402
    exchange_round_rdma,
)
from gpu_radix_sort_tpu.parallel.rdma_overlap import (  # noqa: E402
    exchange_round_rdma_overlapped,
)
from gpu_radix_sort_tpu.utils.keygen import Pcg32  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 24
    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
    keys = Pcg32(42).fill(n)
    dev = jax.device_put(keys, NamedSharding(mesh, P("x")))
    digits = (keys >> np.uint32(8)) & np.uint32(0xFF)
    want = keys[np.argsort(digits, kind="stable")]
    results = {}

    def shmap(f):
        return jax.jit(jax.shard_map(
            f, mesh=mesh, in_specs=P("x"), out_specs=P("x"),
            check_vma=False,
        ))

    # XLA digit sort alone (the compute floor of the plain round)
    fs = jax.jit(lambda x: sort_by_digits(x, 8, 8, strategy="xla"))
    med, _, sd, out = device_time(fs, (dev,), reps=5)
    log(f"xla digit sort alone:      {med*1e3:8.1f} ms  (sd {sd*1e3:.1f})")
    results["xla_sort_ms"] = med * 1e3

    # plain rdma: sort -> exchange, strictly serial phases
    fr = shmap(lambda x: exchange_round_rdma(x, 8, 8, "x", strategy="xla")[0])
    med, _, sd, out = device_time(fr, (dev,), reps=5)
    np.testing.assert_array_equal(np.asarray(jax.device_get(out)), want)
    log(f"rdma round (sort->xchg):   {med*1e3:8.1f} ms  (sd {sd*1e3:.1f})")
    results["rdma_round_ms"] = med * 1e3

    for serial in (True, False):
        fo = shmap(
            lambda x, s=serial: exchange_round_rdma_overlapped(
                x, 8, 8, "x", serial=s
            )[0]
        )
        med, _, sd, out = device_time(fo, (dev,), reps=5)
        np.testing.assert_array_equal(np.asarray(jax.device_get(out)), want)
        tag = "serial (drain per group)" if serial else "OVERLAPPED"
        log(f"group round {tag:<24s} {med*1e3:8.1f} ms  (sd {sd*1e3:.1f})")
        results["serial_ms" if serial else "overlap_ms"] = med * 1e3

    results["overlap_win_pct"] = 100.0 * (
        1.0 - results["overlap_ms"] / results["serial_ms"]
    )
    results["n"] = n
    print(json.dumps(results))


if __name__ == "__main__":
    main()
