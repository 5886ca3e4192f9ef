"""Round-4 probe: stage-1 via batched XLA row sorts (VERDICT r3 item 1,
candidate B).  Chain-timed, exactness-gated, vs the production
sort_full_large.  Run alone (one process owns the TPU).

Usage: python benchmarks/probe_rowstage.py [n_keys] [rep]
(defaults 64Mi / 10; the round-4-late 256Mi re-check passes 268435456 4).
"""

import json
import statistics
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from gpu_radix_sort_tpu.ops import pallas_merge as pm
    from gpu_radix_sort_tpu.utils.keygen import Pcg32

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 64 * 1024 * 1024
    REP = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    keys = Pcg32(3).fill(N)
    import numpy as np
    want = np.sort(keys)
    dev = jax.device_put(jnp.asarray(keys))
    jax.block_until_ready(dev); _ = np.asarray(dev[:1])
    results = {}

    def chain(sort_fn):
        def body(i, acc):
            s = sort_fn(acc)
            x = s * jnp.uint32(0x9E3779B1) + i.astype(jnp.uint32)
            return x ^ (x >> jnp.uint32(16))
        return jax.jit(lambda k: lax.fori_loop(0, REP, body, k))

    for tag, rows in (("baseline", None), ("rows512", 512), ("rows128", 128)):
        fn = jax.jit(lambda k, r=rows: pm.sort_full_large(k, stage1_rows=r))
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(dev)); _ = np.asarray(out[:1])
        print(f"{tag}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
        got = np.asarray(out)
        assert np.array_equal(got, want), f"{tag}: WRONG OUTPUT"
        cf = chain(lambda k, r=rows: pm.sort_full_large(k, stage1_rows=r))
        jax.block_until_ready(cf(dev)); 
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(cf(dev))
            ts.append((time.perf_counter() - t0) / REP)
        med = statistics.median(ts)
        results[tag] = med
        print(f"{tag}: {med*1e3:.1f} ms/sort = {N/med/1e6:.1f}M keys/s "
              f"(chains {[f'{t*1e3:.0f}ms' for t in ts]})", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
