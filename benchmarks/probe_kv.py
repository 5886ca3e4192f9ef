"""On-chip probes for the kv radix binning engine (round 3).

Measures, device-true (repeat chains; docs/PERF_NOTES.md methodology):
  1. XLA baseline: lax.sort_key_val-style stable digit sort on
     (u32 key, u32 payload) at 64M — width 4 and width 8
  2. binning_pass_kv (L=1) at 64M width 4 for candidate geometries
  3. sort_key_value_by_digits_large width 8 (two kv subpasses)
  4. the 64B-payload kv row at BASELINE config-3 scale (32M rows):
     sort_key_value with payload_bytes=64 (grouped lane-riding sorts)

Run alone (one process owns the TPU):  python benchmarks/probe_kv.py
"""

import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")
from gpu_radix_sort_tpu.ops import pallas_radix as pr  # noqa: E402
from gpu_radix_sort_tpu.ops import radix_sort  # noqa: E402
from gpu_radix_sort_tpu.ops.bits import extract_digits  # noqa: E402
from gpu_radix_sort_tpu.utils.keygen import Pcg32  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def drain(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def _remix(k, i):
    x = k * jnp.uint32(0x9E3779B1) + i.astype(jnp.uint32)
    return x ^ (x >> jnp.uint32(16))


def device_time_chain_kv(build_body, keys, vals, rep=6, outer=3):
    """Median per-iteration device time of a REP-chain of body(k, v)."""

    def chained(k, v):
        def body(i, acc):
            sk, sv = build_body(acc[0], acc[1])
            return _remix(sk, i), _remix(sv, i + jnp.int32(1))

        return lax.fori_loop(0, rep, body, (k, v))

    fn = jax.jit(chained)
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(keys, vals))
    drain(out)
    log(f"  compile+first: {time.perf_counter() - t0:.1f}s")
    times = []
    for _ in range(outer):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(keys, vals))
        times.append(time.perf_counter() - t0)
    drain(out)
    return statistics.median(times) / rep


def probe_xla_kv(n):
    keys = jnp.asarray(Pcg32().fill(n))
    vals = jnp.asarray(Pcg32(12345).fill(n))
    for width in (4, 8):
        def body(k, v, width=width):
            d = extract_digits(k, 8, width)
            _, sk, sv = lax.sort((d, k, v), num_keys=1, is_stable=True)
            return sk, sv

        t = device_time_chain_kv(body, keys, vals)
        log(f"XLA kv digit sort w{width} n={n}: {t*1e3:.1f}ms "
            f"= {n/t/1e6:.0f}M pairs/s")


def probe_binning_kv(n, geoms):
    keys = jnp.asarray(Pcg32().fill(n))
    vals = jnp.asarray(Pcg32(12345).fill(n))
    for tile, b_out in geoms:
        def body(k, v, tile=tile, b_out=b_out):
            sk, (sv,) = pr.binning_pass_kv_cols(
                k, (v,), 8, 4, tile=tile, b_out=b_out
            )
            return sk, sv

        try:
            t = device_time_chain_kv(body, keys, vals)
        except Exception as e:  # geometry may violate Mosaic limits
            log(f"binning_pass_kv T={tile} B={b_out}: FAILED {type(e).__name__}: {e}")
            continue
        log(f"binning_pass_kv w4 T={tile} B={b_out} n={n}: {t*1e3:.1f}ms "
            f"= {n/t/1e6:.0f}M pairs/s")


def probe_binning_kv_w8(n, tile, b_out):
    keys = jnp.asarray(Pcg32().fill(n))
    vals = jnp.asarray(Pcg32(12345).fill(n))

    def body(k, v):
        sk, (sv,) = pr.sort_key_value_by_digits_large(
            k, (v,), 8, 8, tile=tile, b_out=b_out
        )
        return sk, sv

    t = device_time_chain_kv(body, keys, vals)
    log(f"kv_by_digits_large w8 T={tile} B={b_out} n={n}: {t*1e3:.1f}ms "
        f"= {n/t/1e6:.0f}M pairs/s")


def probe_kv64(n_rows):
    """64B-payload full kv sort (BASELINE config 3 building block)."""
    keys = jnp.asarray(Pcg32().fill(n_rows))
    payload = jnp.asarray(
        np.frombuffer(
            Pcg32(777).fill(n_rows * 16).tobytes(), dtype=np.uint8
        ).reshape(n_rows, 64)
    )

    def chained(k, p):
        def body(i, acc):
            k_, p_ = acc
            sk, sp = radix_sort.sort_key_value(k_, p_)
            return _remix(sk, i), sp

        return lax.fori_loop(0, 4, body, (k, p))

    fn = jax.jit(chained)
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(keys, payload))
    drain(out)
    log(f"  compile+first: {time.perf_counter() - t0:.1f}s")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(keys, payload))
        times.append(time.perf_counter() - t0)
    drain(out)
    t = statistics.median(times) / 4
    log(f"kv 64B-payload full sort n={n_rows}: {t*1e3:.1f}ms "
        f"= {n_rows/t/1e6:.1f}M rows/s")


def main():
    log(f"device: {jax.devices()[0]} backend={jax.default_backend()}")
    n = 64 * 1024 * 1024
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "xla"):
        probe_xla_kv(n)
    if which in ("all", "bin"):
        probe_binning_kv(n, [(32768, 8192), (65536, 8192)])
    if which in ("all", "w8"):
        probe_binning_kv_w8(n, 32768, 8192)
    if which in ("all", "kv64"):
        # 16M rows: 32M OOMs HBM — the grouped lane sorts keep the (n, 16)
        # u32 lane block plus sort temps live, >16 GiB at 32M x 64B.
        probe_kv64(16 * 1024 * 1024)


if __name__ == "__main__":
    main()
