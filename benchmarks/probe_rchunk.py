"""On-chip RDMA chunk-size scaling probe (round 3).

probe_overlap.py showed the rdma exchange leg is DMA-issue-rate bound:
~7.3 us per 16-row (8 KiB) chunk of scalar-core issue + semaphore cost,
~1 GB/s effective on a chip that streams 540 GB/s.  Chunk ROWS is the
lever; this times `exchange="rdma"` rounds at rchunk in {16,64,256,1024}
on the P=1 self-loop mesh and reports the implied exchange-leg rate.

Run alone (one process owns the TPU):  python benchmarks/probe_rchunk.py
"""

import json
import sys

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, ".")
from gpu_radix_sort_tpu.bench.harness import device_time  # noqa: E402
from gpu_radix_sort_tpu.ops.radix_sort import sort_by_digits  # noqa: E402
from gpu_radix_sort_tpu.parallel.rdma_exchange import (  # noqa: E402
    exchange_round_rdma,
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
    results = {"n": n}

    fs = jax.jit(lambda x: sort_by_digits(x, 8, 8, strategy="xla"))
    sort_ms, _, _, _ = device_time(fs, (dev,), reps=5)
    sort_ms *= 1e3
    log(f"xla digit sort alone: {sort_ms:8.1f} ms")
    results["xla_sort_ms"] = sort_ms

    mib = n * 4 / (1 << 20)
    for rc in (16, 64, 256, 1024):
        f = jax.jit(jax.shard_map(
            lambda x, rc=rc: exchange_round_rdma(
                x, 8, 8, "x", strategy="xla", rchunk=rc
            )[0],
            mesh=mesh, in_specs=P("x"), out_specs=P("x"), check_vma=False,
        ))
        med, _, sd, out = device_time(f, (dev,), reps=5)
        np.testing.assert_array_equal(np.asarray(jax.device_get(out)), want)
        ms = med * 1e3
        leg = ms - sort_ms
        log(f"rchunk {rc:5d}: round {ms:8.1f} ms  exchange leg ~{leg:6.1f} ms"
            f"  ({mib / leg * 1000 / 1024:6.2f} GiB/s)  sd {sd*1e3:.1f}")
        results[f"rchunk_{rc}_round_ms"] = ms
    print(json.dumps(results))


if __name__ == "__main__":
    main()
