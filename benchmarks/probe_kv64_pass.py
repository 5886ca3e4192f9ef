"""Round-4 bounded experiment (VERDICT r3 item 9): ONE 4-bit kv binning
pass with 16 payload column streams at 16M rows, to bound an 8-pass full
kv64 sort against the 37.9M rows/s grouped-lane path (BENCH_R3).
Adopt if the extrapolated full sort >= 1.3x; else record the negative.
Run alone."""

import json
import statistics
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpu_radix_sort_tpu.ops import pallas_radix as pr
    from gpu_radix_sort_tpu.utils.keygen import Pcg32

    N, NCOLS, REPS = 16 << 20, 16, 3
    keys = jax.device_put(jnp.asarray(Pcg32(21).fill(N)))
    rng = np.random.default_rng(9)
    cols = tuple(
        jax.device_put(jnp.asarray(
            rng.integers(0, 1 << 32, N, dtype=np.uint32)))
        for _ in range(NCOLS)
    )
    jax.block_until_ready((keys, cols)); _ = np.asarray(keys[:1])

    fn = jax.jit(lambda k, c: pr.binning_pass_kv_cols(k, c, 0, 4))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(keys, cols))
    _ = np.asarray(out[0][:1])
    print(f"compile+run {time.perf_counter()-t0:.1f}s", flush=True)

    # exactness: stable digit argsort oracle on key + 2 spot-checked lanes
    hk = np.asarray(jax.device_get(keys))
    order = np.argsort((hk & 0xF).astype(np.uint8), kind="stable")
    assert np.array_equal(np.asarray(jax.device_get(out[0])), hk[order])
    for ci in (0, NCOLS - 1):
        hc = np.asarray(jax.device_get(cols[ci]))
        assert np.array_equal(
            np.asarray(jax.device_get(out[1][ci])), hc[order]
        ), f"lane {ci} wrong"
    print("exact (key + lanes 0,15 vs stable oracle)", flush=True)

    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(keys, cols))
        _ = np.asarray(out[0][:1])
        ts.append(time.perf_counter() - t0)
    t_pass = statistics.median(ts) - 0.027  # relay dispatch overhead
    full = 8 * t_pass
    rows_s = N / full
    print(json.dumps({
        "t_pass_ms": round(t_pass * 1e3, 1),
        "extrapolated_full_ms": round(full * 1e3, 1),
        "rows_per_s_M": round(rows_s / 1e6, 1),
        "grouped_lane_baseline_M": 37.9,
        "ratio": round(rows_s / 37.9e6, 3),
    }))


if __name__ == "__main__":
    main()
