"""Round-4 probe: merge-level output-block size (b_out) re-sweep at the
round-4 kernel vintage (row-stage stage-1, alignment-free win1 frame).

B_OUT=2^16 was picked in round 2; the level network runs 1 + log2(b_out)
stages, so smaller blocks trade fewer VPU stages per level against more
per-block fixed costs (split search, window DMA slack, alignment rolls).
Chain-timed at 64M, exactness-gated, vs production.  Run alone (one
process owns the TPU)."""

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

    N, REP = 64 * 1024 * 1024, 10
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

    for tag, b_out in (("b16_prod", 1 << 16), ("b15", 1 << 15),
                       ("b14", 1 << 14)):
        fn = jax.jit(lambda k, b=b_out: pm.sort_full_large(k, b_out=b))
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(dev)); _ = np.asarray(out[:1])
        print(f"{tag}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
        got = np.asarray(out)
        assert np.array_equal(got, want), f"{tag}: WRONG OUTPUT"
        cf = chain(lambda k, b=b_out: pm.sort_full_large(k, b_out=b))
        jax.block_until_ready(cf(dev)); _ = np.asarray(cf(dev)[:1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = jax.block_until_ready(cf(dev)); _ = np.asarray(o[:1])
            ts.append((time.perf_counter() - t0) / REP)
        med = statistics.median(ts)
        results[tag] = med
        print(f"{tag}: {med*1e3:.2f} ms/sort = {N/med/1e6:.1f}M keys/s "
              f"(chains {[f'{t*1e3:.0f}ms' for t in ts]})", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
