"""Guarded CHUNK_ROWS=32 probe at 256Mi (VERDICT r4 item 5 — the one
declined w8-engine lever).  Same-process interleaved A/B of the keys-only
w8 digit sort (two 4-bit binning passes) at chunk granularities 16 vs 32,
exactness-gated on device against the XLA stable digit sort at 4M.

The geometry is safe by construction now: binning_pass(chunk_rows=...)
asserts the window-anchoring invariants (_check_chunk_rows) and interpret
mode validated both granularities exact (tests/test_pallas_radix.py).

Run ON the TPU: python benchmarks/probe_chunk32.py
"""

import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gpu_radix_sort_tpu.ops import pallas_radix as pr
from gpu_radix_sort_tpu.ops.bits import extract_digits
from gpu_radix_sort_tpu.utils.keygen import Pcg32

N = 256 * 1024 * 1024
N_CHECK = 4 * 1024 * 1024
REP = 4
WIDTH = 8


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_fn(chunk_rows):
    def f(k):
        return pr.sort_by_digits_large(k, 0, WIDTH, chunk_rows=chunk_rows)

    return jax.jit(f)


def main():
    log(f"device: {jax.devices()[0]}")
    tile, b_out = pr.auto_geometry(N, WIDTH)
    log(f"auto geometry at 256Mi: tile={tile} b_out={b_out}")

    # exactness gate ON DEVICE at 4M vs the XLA stable digit sort
    keys_c = Pcg32().fill(N_CHECK)
    dev_c = jax.device_put(keys_c)

    def xla_digit_sort(k):
        d = extract_digits(k, 0, WIDTH).astype(jnp.uint16)
        _, out = lax.sort((d, k), num_keys=1, is_stable=True)
        return out

    want = jax.jit(xla_digit_sort)(dev_c)
    for cr in (16, 32):
        # check at the PRODUCTION geometry so the compiled kernel under
        # test is the one the 256Mi run uses (modulo nblocks)
        got = jax.jit(
            lambda k, cr=cr: pr.sort_by_digits_large(
                k, 0, WIDTH, tile=tile, b_out=b_out, chunk_rows=cr
            )
        )(dev_c)
        ok = bool(jnp.all(got == want))
        log(f"chunk_rows={cr}: exactness at 4M (prod geometry) = {ok}")
        assert ok

    keys = Pcg32().fill(N)
    dev_keys = jax.device_put(keys)

    def build_chain(cr):
        def chained(k):
            def body(i, acc):
                s = pr.sort_by_digits_large(acc, 0, WIDTH, chunk_rows=cr)
                # mix so iterations can't collapse; keep the multiset alive
                x = s + i.astype(jnp.uint32)
                return x ^ (x >> jnp.uint32(16))

            return lax.fori_loop(0, REP, body, k)

        cfn = jax.jit(chained)
        t0 = time.perf_counter()
        jax.block_until_ready(cfn(dev_keys))
        log(f"chunk_rows={cr}: chain compile+run {time.perf_counter()-t0:.1f}s")
        return cfn

    cfn16 = build_chain(16)
    cfn32 = build_chain(32)

    results = {}
    for rnd in range(2):
        for tag, cfn in (("16", cfn16), ("32", cfn32)):
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                jax.block_until_ready(cfn(dev_keys))
                ts.append(time.perf_counter() - t0)
            t = statistics.median(ts) / REP
            log(f"chunk_rows={tag} r{rnd}: {t*1e3:.1f}ms/sort = "
                f"{N/t/1e6:.1f}M keys/s")
            results.setdefault(tag, []).append(t)
    for tag, ts in results.items():
        best = min(ts)
        log(f"FINAL chunk_rows={tag}: {best*1e3:.1f}ms = "
            f"{N/best/1e6:.1f}M keys/s")


if __name__ == "__main__":
    main()
