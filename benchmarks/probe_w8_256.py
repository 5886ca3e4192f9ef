"""Round-4 probe: width-8 partial sort at the reference's 256Mi workload
(VERDICT r3 item 3).  Re-measures the keys-only two-pass w8 binning with
the round-4 kernel vintage, plus one fragment-count lever (larger T), vs
the XLA route — against BOTH reference numbers (349M keys/s kernels-only,
193M incl-PCIe; analysis/libsort8b.csv).  Run alone."""

import json
import statistics
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    import numpy as np

    from gpu_radix_sort_tpu.ops import pallas_radix as pr
    from gpu_radix_sort_tpu.ops.radix_sort import sort_by_digits
    from gpu_radix_sort_tpu.utils.keygen import Pcg32

    N, REP = 256 << 20, 4
    keys = Pcg32(11).fill(N)
    dev = jax.device_put(jnp.asarray(keys))
    jax.block_until_ready(dev); _ = np.asarray(dev[:1])
    print(f"n={N} geometry={pr.auto_geometry(N, 4)}", flush=True)

    def chain(fn):
        def body(i, acc):
            s = fn(acc)
            x = s * jnp.uint32(0x9E3779B1) + i.astype(jnp.uint32)
            return x ^ (x >> jnp.uint32(16))
        return jax.jit(lambda k: lax.fori_loop(0, REP, body, k))

    results = {}
    xla_fn = jax.jit(lambda k: sort_by_digits(k, 0, 8, strategy="xla"))
    variants = [
        ("xla_w8", xla_fn),
        ("engine_w8_auto",
         jax.jit(lambda k: pr.sort_by_digits_large(k, 0, 8))),
        ("engine_w8_T256K",
         jax.jit(lambda k: pr.sort_by_digits_large(k, 0, 8, tile=1 << 18))),
    ]
    oracle = None
    for tag, fn in variants:
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(dev)); _ = np.asarray(out[:1])
        print(f"{tag}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
        if oracle is None:
            oracle = out  # XLA stable digit sort IS the oracle
        else:
            same = bool(jax.device_get(jnp.array_equal(out, oracle)))
            assert same, f"{tag}: output differs from the stable oracle"
            print(f"{tag}: exact vs oracle", flush=True)
        cf = chain(lambda k, f=fn: f(k))
        jax.block_until_ready(cf(dev))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(cf(dev))
            ts.append((time.perf_counter() - t0) / REP)
        med = statistics.median(ts)
        results[tag] = med
        print(f"{tag}: {med*1e3:.1f} ms = {N/med/1e6:.1f}M keys/s", flush=True)
    results["ref_kernels_only_Mkeys"] = 349.0
    results["ref_incl_pcie_Mkeys"] = 193.0
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
