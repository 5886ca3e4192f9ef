"""On-chip probes for the Pallas radix binning engine (round 2).

Measures, device-true (repeat chains; docs/PERF_NOTES.md methodology):
  1. stage A candidates: XLA row digit-sort rate vs tile width
  2. binning_pass end-to-end at 64M for candidate (TILE, B_OUT) geometries
  3. baselines: lax.sort_key_val digit sort at the same n

Run alone (one process owns the TPU):  python benchmarks/probe_radix.py
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
from gpu_radix_sort_tpu.ops.bits import extract_digits  # noqa: E402
from gpu_radix_sort_tpu.utils.keygen import Pcg32  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def drain(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def device_time_chain(build_body, keys, rep=8, outer=3):
    """Median per-iteration device time of a REP-chain of body(keys)."""

    def chained(k):
        def body(i, acc):
            s = build_body(acc)
            x = s * jnp.uint32(0x9E3779B1) + i.astype(jnp.uint32)
            return x ^ (x >> jnp.uint32(16))

        return lax.fori_loop(0, rep, body, k)

    fn = jax.jit(chained)
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(keys))
    drain(out)
    log(f"  compile+first: {time.perf_counter() - t0:.1f}s")
    times = []
    for _ in range(outer):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(keys))
        times.append(time.perf_counter() - t0)
    drain(out)
    return statistics.median(times) / rep


def probe_row_sort(n, widths):
    keys = jax.device_put(Pcg32().fill(n))
    for T in widths:
        if n % T:
            continue

        def body(k, T=T):
            kt = k.reshape(n // T, T)
            d = extract_digits(kt, 8, 4)
            _, sk = lax.sort((d, kt), dimension=1, num_keys=1, is_stable=True)
            return sk.reshape(-1)

        t = device_time_chain(body, keys)
        log(f"row_digit_sort T={T:>7}: {t * 1e3:8.2f}ms  "
            f"{n / t / 1e6:7.0f}M keys/s")


def probe_row_sort_u8(n, T):
    keys = jax.device_put(Pcg32().fill(n))

    def body(k):
        kt = k.reshape(n // T, T)
        d = extract_digits(kt, 8, 4).astype(jnp.uint8)
        _, sk = lax.sort((d, kt), dimension=1, num_keys=1, is_stable=True)
        return sk.reshape(-1)

    t = device_time_chain(body, keys)
    log(f"row_digit_sort_u8key T={T}: {t * 1e3:8.2f}ms  "
        f"{n / t / 1e6:7.0f}M keys/s")


def probe_binning(n, tile, b_out, offset=8, width=4):
    keys = jax.device_put(Pcg32().fill(n))

    def body(k):
        return pr.binning_pass(k, offset, width, tile=tile, b_out=b_out)

    t = device_time_chain(body, keys)
    log(f"binning_pass n={n} T={tile} B={b_out} w{width}: {t * 1e3:8.2f}ms  "
        f"{n / t / 1e6:7.0f}M keys/s")
    # exactness spot check (outside timing)
    got = np.asarray(jax.device_get(jax.jit(body)(keys)))
    kh = np.asarray(jax.device_get(keys))
    want = kh[np.argsort((kh >> offset) & ((1 << width) - 1), kind="stable")]
    ok = np.array_equal(got, want)
    log(f"  exact: {ok}")
    if not ok:
        bad = np.nonzero(got != want)[0]
        log(f"  first mismatches at {bad[:5]} of {bad.size}")


def probe_baseline(n):
    keys = jax.device_put(Pcg32().fill(n))

    def body(k):
        d = extract_digits(k, 8, 4)
        _, sk = lax.sort_key_val(d, k, is_stable=True)
        return sk

    t = device_time_chain(body, keys)
    log(f"lax.sort_key_val digit n={n}: {t * 1e3:8.2f}ms  "
        f"{n / t / 1e6:7.0f}M keys/s")


def probe_stage_b_only(n, tile, b_out):
    """Binning alone (tile-sorted input precomputed outside the chain)."""
    keys = jax.device_put(Pcg32().fill(n))
    n_tiles = n // tile
    sorted_t, starts = jax.jit(
        lambda k: pr.tile_digit_sort(k.reshape(n_tiles, tile), 8, 4)
    )(keys)
    g_run, sflat, k0, nfrag = jax.jit(
        lambda s: pr._binning_metadata(s, tile, b_out, n)
    )(starts)
    # MUST match binning_pass's source layout: the kernel's window-anchored
    # chunk reads start up to SRC_FRONT_ROWS before a fragment's first
    # source row — feeding x without the front padding reads outside the
    # allocation and FAULTS THE CHIP (~5 min recovery; hit in round 3).
    x = jnp.concatenate(
        [jnp.full((pr.SRC_FRONT_ROWS, 128), np.uint32(0xFFFFFFFF),
                  jnp.uint32),
         sorted_t.reshape(-1, 128),
         jnp.full((2 * pr.CHUNK_ROWS, 128), np.uint32(0xFFFFFFFF),
                  jnp.uint32)]
    )
    call = pr._bin_call(n // b_out, b_out, False)

    def run(k0_, nfrag_, g_, s_, x_):
        return call(k0_, nfrag_, g_, s_, x_)

    fn = jax.jit(run)
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(k0, nfrag, g_run, sflat, x))
    drain(out)
    log(f"  stage-B compile+first: {time.perf_counter() - t0:.1f}s")
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(k0, nfrag, g_run, sflat, x))
        times.append(time.perf_counter() - t0)
    drain(out)
    t = statistics.median(times)
    log(f"stage_b_only n={n} T={tile} B={b_out}: {t * 1e3:8.2f}ms "
        f"(incl ~27ms dispatch)  {n / t / 1e6:7.0f}M keys/s")


if __name__ == "__main__":
    log(f"device: {jax.devices()[0]}")
    which = sys.argv[1] if len(sys.argv) > 1 else "small"
    if which == "small":
        # tiny first: validate the kernel compiles + runs on chip at all
        probe_binning(1 << 18, 1 << 16, 1 << 13)
    elif which == "rows":
        probe_row_sort(1 << 24, [8192, 16384, 32768, 65536, 131072])
        probe_row_sort_u8(1 << 24, 32768)
    elif which == "stageb":
        probe_stage_b_only(1 << 26, 1 << 16, 1 << 13)
    elif which == "full":
        probe_baseline(1 << 26)
        # same B reuses the compiled binning kernel across T
        for tile, b in [(1 << 14, 1 << 13), (1 << 15, 1 << 13),
                        (1 << 16, 1 << 13)]:
            probe_binning(1 << 26, tile, b)
    elif which == "b4k":
        for tile, b in [(1 << 15, 1 << 12), (1 << 14, 1 << 12)]:
            probe_binning(1 << 26, tile, b)
    else:
        log(f"unknown probe {which}")
