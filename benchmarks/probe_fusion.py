"""On-chip round-fusion probe (round 3).

Times the full 32-bit LSD distributed sort (width 8, P=1 self-loop mesh)
with the fused round loop (one composite-key sort per round) vs the
unfused loop (local digit sort + reassembly sort per round), for the
rdma and alltoall exchanges.  The fused loop should approach
(nsteps+1)/(2*nsteps) of the unfused sort cost.

Run alone (one process owns the TPU):  python benchmarks/probe_fusion.py
"""

import json
import sys

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, ".")
from gpu_radix_sort_tpu.bench.harness import device_time  # noqa: E402
from gpu_radix_sort_tpu.parallel.distributed import (  # noqa: E402
    build_distributed_sort,
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

    for exchange in ("rdma", "alltoall"):
        for fuse in (False, True):
            fn = build_distributed_sort(
                mesh, n, width=8, exchange=exchange, strategy="xla",
                fuse_rounds=fuse,
            )
            med, _, sd, out = device_time(fn, (dev,), reps=5)
            keys_out, ovf = out
            assert int(ovf) == 0
            np.testing.assert_array_equal(
                np.asarray(jax.device_get(keys_out)), want
            )
            tag = "fused" if fuse else "unfused"
            ms = med * 1e3
            log(f"{exchange:9s} {tag:8s} full LSD: {ms:8.1f} ms "
                f"({n / med / 1e6:6.0f}M keys/s)  sd {sd*1e3:.1f}")
            results[f"{exchange}_{tag}_ms"] = ms
    print(json.dumps(results))


if __name__ == "__main__":
    main()
