"""Round-4 probe: 4-way merge level (VERDICT r3 item 1, candidate A).

One Pallas program per b_out output block merges FOUR alternating-direction
runs of length L into one 4L run (two 2-way pair mergers -> full pair
networks -> final half-cleaner -> final network), replacing TWO 2-way
levels (and one full HBM read+write) per application.

Model prediction (docs/PERF_NOTES.md round-4): NEGATIVE — the two pair
networks must fully sort their survivors before the second half-cleaner
(positionwise min of two merely-bitonic sequences is not a half-cleaner),
so VPU stages per output element triple (48 vs 16) while only one ~1.4ms
HBM pass is saved.  This probe measures it honestly: exactness-gated, REP
grid-axis device timing, against the production 2-way level pair in the
SAME harness.

Splits are computed EXACTLY on the host (numpy rank-partition per quad) —
a production 4-way would need an in-XLA multiway merge-path search (the
2-way's binary search does not generalize cheaply), so the kernel-only
comparison here is the candidate's BEST case.

Usage:
  JAX_PLATFORMS=cpu ... python benchmarks/probe_merge4.py check   (interpret exactness)
  python benchmarks/probe_merge4.py bench                          (TPU timing)
"""

import functools
import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

from gpu_radix_sort_tpu.ops.pallas_merge import (  # noqa: E402
    B_OUT,
    LANES,
    SIGN,
    SPAD,
    TILE,
    _pad_rows,
    _w_rows,
    sort_tiles,
    _merge_splits,
)
from gpu_radix_sort_tpu.ops.pallas_sort import _tpu_roll  # noqa: E402
from gpu_radix_sort_tpu.ops.bits import KEY_DTYPE  # noqa: E402
from gpu_radix_sort_tpu.utils.keygen import Pcg32  # noqa: E402


def _interpret():
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Exact 4-way splits (host, numpy): per output block, the take a_i from each
# of its quad's 4 runs such that elements with union-rank < r are excluded.
# ---------------------------------------------------------------------------

def splits4_np(x: np.ndarray, L: int, n: int, b_out: int):
    four_l = 4 * L
    bpq = four_l // b_out
    nquads = n // four_l
    nblocks = n // b_out
    out = {k: np.zeros(nblocks, np.int32) for k in
           ("w1_row", "s1", "e1", "e2", "s2",
            "w3_row", "s3", "e3", "e4", "s4", "dflag")}
    runid = np.repeat(np.arange(4), L)
    pos = np.tile(np.arange(L), 4)
    rks = (np.arange(bpq) * b_out).astype(np.int64)
    for q in range(nquads):
        base = q * four_l
        d = q & 1
        v = x[base:base + four_l]
        if d:
            v = ~v
        # run j is ascending-in-v iff (j even) XOR d
        asc_run = ((runid % 2) == 0) ^ bool(d)
        rank = np.where(asc_run, pos, L - 1 - pos)
        order = np.lexsort((rank, runid, v))  # primary v, then run, then rank
        rid_sorted = runid[order]
        prefix = np.cumsum(
            rid_sorted[None, :] == np.arange(4)[:, None], axis=1
        )
        a = np.zeros((4, bpq), np.int64)
        a[:, 1:] = prefix[:, rks[1:] - 1]
        blocks = q * bpq + np.arange(bpq)
        out["dflag"][blocks] = d
        if not d:
            s1 = base + a[0]
            e1, s2, e2 = base + L, base + L, base + 2 * L - a[1]
            s3 = base + 2 * L + a[2]
            e3, s4, e4 = base + 3 * L, base + 3 * L, base + 4 * L - a[3]
        else:
            s1 = base + L + a[1]
            e1, s2, e2 = base + 2 * L, base, base + L - a[0]
            s3 = base + 3 * L + a[3]
            e3, s4, e4 = base + 4 * L, base + 2 * L, base + 3 * L - a[2]
        out["s1"][blocks], out["e1"][blocks] = s1, e1
        out["s2"][blocks], out["e2"][blocks] = s2, e2
        out["s3"][blocks], out["e3"][blocks] = s3, e3
        out["s4"][blocks], out["e4"][blocks] = s4, e4
        out["w1_row"][blocks] = s1 // LANES
        out["w3_row"][blocks] = s3 // LANES
    return out


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _net(x, idx, b_out: int, roll):
    """Full ascending bitonic merge network on a (rotated-)bitonic buffer."""
    for j_log in range(b_out.bit_length() - 2, -1, -1):
        j = 1 << j_log
        axis, amt = (1, j) if j < LANES else (0, j // LANES)
        lo = jnp.minimum(x, roll(x, -amt, axis))
        hi = jnp.maximum(x, roll(x, amt, axis))
        x = jnp.where((idx & j) == 0, lo, hi)
    return x


def _pair_low(wa, wb, s1, e1, e2, s2, w1_row, *, b_out, w_rows, roll, pos, cc):
    """One 2-way pair merger (identical math to pallas_merge._merge_kernel):
    win1 raw frame, win2 lane-rotated by delta, mask, half-cleaner min,
    cyclic fold -> (b_rows, LANES) survivors, bitonic rotated by slack."""
    b_rows = b_out // LANES
    slack = s1 - w1_row * LANES
    delta = (e2 - b_out - s1) % LANES
    for i in range(7):
        rotated = roll(wb, -(1 << i), 1)
        wb = jnp.where(((delta >> i) & 1) == 1, rotated, wb)
    wb = jnp.where(cc < LANES - delta, wb, roll(wb, -1, 0))
    valid_a = jnp.minimum(e1 - s1, b_out)
    va = jnp.where((pos >= slack) & (pos < slack + valid_a), wa, SPAD)
    valid_b = jnp.minimum(e2 - s2, b_out)
    vb = jnp.where(
        (pos >= slack + b_out - valid_b) & (pos < slack + b_out), wb, SPAD
    )
    low = jnp.minimum(va, vb)
    extra = w_rows - b_rows
    if extra <= b_rows:
        head = jnp.minimum(low[:extra], low[b_rows:])
        low = jnp.concatenate([head, low[extra:b_rows]], axis=0)
    else:
        low = jnp.minimum(low[:b_rows], low[b_rows:2 * b_rows])
    return low


def _merge4_kernel(
    w1_row, s1, e1, e2, s2, w3_row, s3, e3, e4, s4, dflag,
    x_hbm, o_ref, sa, sb, sc, sd, sems,
    *, b_out: int, nblocks: int, interpret: bool,
):
    from jax.experimental.pallas import tpu as pltpu

    b_rows = b_out // LANES
    w_rows = _w_rows(b_out)
    g = pl.program_id(1)  # block within the level; program_id(0) = REP axis

    def copies(i, slot):
        sl1 = s1[i] - w1_row[i] * LANES
        d1 = (e2[i] - b_out - s1[i]) % LANES
        rb = jnp.maximum((e2[i] - b_out - sl1 - d1) // LANES, 0)
        sl3 = s3[i] - w3_row[i] * LANES
        d2 = (e4[i] - b_out - s3[i]) % LANES
        rd = jnp.maximum((e4[i] - b_out - sl3 - d2) // LANES, 0)
        return [
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(row, w_rows), :], buf.at[slot],
                sems.at[slot, k],
            )
            for k, (row, buf) in enumerate(
                [(w1_row[i], sa), (rb, sb), (w3_row[i], sc), (rd, sd)]
            )
        ]

    slot = g % 2

    @pl.when(g == 0)
    def _prime():
        for c in copies(0, 0):
            c.start()

    @pl.when(g + 1 < nblocks)
    def _prefetch_next():
        for c in copies(g + 1, (g + 1) % 2):
            c.start()

    for c in copies(g, slot):
        c.wait()

    inv = dflag[g] != 0
    flip = jnp.where(inv, ~SIGN, SIGN)
    wa = jax.lax.bitcast_convert_type(sa[slot] ^ flip, jnp.int32)
    wb = jax.lax.bitcast_convert_type(sb[slot] ^ flip, jnp.int32)
    wc = jax.lax.bitcast_convert_type(sc[slot] ^ flip, jnp.int32)
    wd = jax.lax.bitcast_convert_type(sd[slot] ^ flip, jnp.int32)

    roll = jnp.roll if interpret else _tpu_roll
    rr = jax.lax.broadcasted_iota(jnp.int32, (w_rows, LANES), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (w_rows, LANES), 1)
    pos = rr * LANES + cc

    surv1 = _pair_low(wa, wb, s1[g], e1[g], e2[g], s2[g], w1_row[g],
                      b_out=b_out, w_rows=w_rows, roll=roll, pos=pos, cc=cc)
    surv2 = _pair_low(wc, wd, s3[g], e3[g], e4[g], s4[g], w3_row[g],
                      b_out=b_out, w_rows=w_rows, roll=roll, pos=pos, cc=cc)

    idx = pos[:b_rows]
    s1n = _net(surv1, idx, b_out, roll)          # ascending
    s2n = ~_net(~surv2, idx, b_out, roll)        # descending (+inf pads first)
    low = jnp.minimum(s1n, s2n)                  # b_out smallest, bitonic
    out = _net(low, idx, b_out, roll)
    o_ref[...] = jax.lax.bitcast_convert_type(out, KEY_DTYPE) ^ flip


@functools.lru_cache(maxsize=None)
def _merge4_call(nblocks: int, b_out: int, rep: int, interpret: bool):
    from jax.experimental.pallas import tpu as pltpu

    b_rows = b_out // LANES
    w_rows = _w_rows(b_out)
    kernel = functools.partial(
        _merge4_kernel, b_out=b_out, nblocks=nblocks, interpret=interpret
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=11,
            grid=(rep, nblocks),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((b_rows, LANES), lambda r, g, *_: (g, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, w_rows, LANES), KEY_DTYPE),
                pltpu.VMEM((2, w_rows, LANES), KEY_DTYPE),
                pltpu.VMEM((2, w_rows, LANES), KEY_DTYPE),
                pltpu.VMEM((2, w_rows, LANES), KEY_DTYPE),
                pltpu.SemaphoreType.DMA((2, 4)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nblocks * b_rows + _pad_rows(b_out), LANES), KEY_DTYPE
        ),
        interpret=interpret,
    )


def merge4_level(x2d, splits, L: int, n: int, b_out: int, rep: int = 1):
    args = [jnp.asarray(splits[k]) for k in
            ("w1_row", "s1", "e1", "e2", "s2",
             "w3_row", "s3", "e3", "e4", "s4", "dflag")]
    return _merge4_call(n // b_out, b_out, rep, _interpret())(*args, x2d)


@functools.lru_cache(maxsize=None)
def _merge2_call(nblocks: int, b_out: int, rep: int, interpret: bool):
    """The production 2-way merge kernel body (pallas_merge._merge_kernel,
    transcribed with program_id(1) as the block id) under a (rep, nblocks)
    grid — the same REP harness as merge4, for a fair comparison."""
    from jax.experimental.pallas import tpu as pltpu

    from gpu_radix_sort_tpu.ops import pallas_merge as pm

    b_rows = b_out // LANES
    w_rows = pm._w_rows(b_out)

    def kernel(w1_row, s1, e1, e2, s2, dflag, x_hbm, o_ref, sa, sb, sems):
        g = pl.program_id(1)
        copies = functools.partial(
            pm._window_copies, w1_row=w1_row, s1=s1, e2=e2, x_hbm=x_hbm,
            sa=sa, sb=sb, sems=sems, b_out=b_out, w_rows=w_rows,
        )
        slot = g % 2

        @pl.when(g == 0)
        def _prime():
            ca, cb = copies(0, 0)
            ca.start()
            cb.start()

        @pl.when(g + 1 < nblocks)
        def _prefetch():
            ca, cb = copies(g + 1, (g + 1) % 2)
            ca.start()
            cb.start()

        ca, cb = copies(g, slot)
        ca.wait()
        cb.wait()

        slack_a = s1[g] - w1_row[g] * LANES
        delta = (e2[g] - b_out - s1[g]) % LANES
        inv = dflag[g] != 0
        flip = jnp.where(inv, ~SIGN, SIGN)
        wa = jax.lax.bitcast_convert_type(sa[slot] ^ flip, jnp.int32)
        wb = jax.lax.bitcast_convert_type(sb[slot] ^ flip, jnp.int32)
        roll = jnp.roll if interpret else _tpu_roll
        for i in range(7):
            rotated = roll(wb, -(1 << i), 1)
            wb = jnp.where(((delta >> i) & 1) == 1, rotated, wb)
        rr = jax.lax.broadcasted_iota(jnp.int32, (w_rows, LANES), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (w_rows, LANES), 1)
        pos = rr * LANES + cc
        wb = jnp.where(cc < LANES - delta, wb, roll(wb, -1, 0))
        valid_a = jnp.minimum(e1[g] - s1[g], b_out)
        va = jnp.where((pos >= slack_a) & (pos < slack_a + valid_a), wa, SPAD)
        valid_b = jnp.minimum(e2[g] - s2[g], b_out)
        vb = jnp.where(
            (pos >= slack_a + b_out - valid_b) & (pos < slack_a + b_out),
            wb, SPAD,
        )
        low = jnp.minimum(va, vb)
        extra = w_rows - b_rows
        if extra <= b_rows:
            head = jnp.minimum(low[:extra], low[b_rows:])
            low = jnp.concatenate([head, low[extra:b_rows]], axis=0)
        else:
            low = jnp.minimum(low[:b_rows], low[b_rows:2 * b_rows])
        idx = pos[:b_rows]
        out = _net(low, idx, b_out, roll)
        o_ref[...] = jax.lax.bitcast_convert_type(out, KEY_DTYPE) ^ flip

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(rep, nblocks),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((b_rows, LANES), lambda r, g, *_: (g, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, w_rows, LANES), KEY_DTYPE),
                pltpu.VMEM((2, w_rows, LANES), KEY_DTYPE),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nblocks * b_rows + pm._pad_rows(b_out), LANES), KEY_DTYPE
        ),
        interpret=interpret,
    )


def merge2_level_rep(x2d, L: int, n: int, b_out: int, rep: int = 1):
    splits = _merge_splits(x2d, L, n, b_out)
    return _merge2_call(n // b_out, b_out, rep, _interpret())(*splits, x2d)


# ---------------------------------------------------------------------------
# Harness
# ---------------------------------------------------------------------------

def _expected_4l(keys, n, L):
    """Run-p (length 4L) expected content: sorted slice, reversed if odd."""
    want = np.empty(n, np.uint32)
    for p in range(n // (4 * L)):
        sl = np.sort(keys[p * 4 * L:(p + 1) * 4 * L])
        want[p * 4 * L:(p + 1) * 4 * L] = sl if p % 2 == 0 else sl[::-1]
    return want


def check(n=1 << 15, L=2048, b_out=512, seed=5):
    keys = Pcg32(seed).fill(n)
    tail = -(-_pad_rows(b_out) // (L // LANES)) * (L // LANES)
    x = sort_tiles(jnp.asarray(keys).reshape(-1, LANES), L,
                   alternate=True, tail_rows=tail)
    host_runs = np.asarray(x.reshape(-1)[:n])
    splits = splits4_np(host_runs, L, n, b_out)
    out = merge4_level(x, splits, L, n, b_out)
    got = np.asarray(out.reshape(-1)[:n])
    want = _expected_4l(keys, n, L)
    assert np.array_equal(got, want), "merge4 mismatch"
    # duplicate-heavy quad
    keys2 = np.random.default_rng(1).choice(
        np.array([3, 3, 9, 0xFFFFFFFF], np.uint32), size=n)
    x2 = sort_tiles(jnp.asarray(keys2).reshape(-1, LANES), L,
                    alternate=True, tail_rows=tail)
    h2 = np.asarray(x2.reshape(-1)[:n])
    out2 = merge4_level(x2, splits4_np(h2, L, n, b_out), L, n, b_out)
    assert np.array_equal(
        np.asarray(out2.reshape(-1)[:n]), _expected_4l(keys2, n, L)
    ), "merge4 duplicate mismatch"
    print(f"merge4 exact at n={n} L={L} b_out={b_out} (incl. duplicates)")


def bench(n=64 * 1024 * 1024, L=TILE, b_out=B_OUT, rep=8):
    keys = Pcg32(3).fill(n)
    tail = -(-_pad_rows(b_out) // (L // LANES)) * (L // LANES)
    x = jax.block_until_ready(
        sort_tiles(jnp.asarray(keys).reshape(-1, LANES), L,
                   alternate=True, tail_rows=tail))
    _ = np.asarray(x[:1, :1])
    host_runs = np.asarray(x.reshape(-1)[:n])
    t0 = time.perf_counter()
    splits = splits4_np(host_runs, L, n, b_out)
    print(f"host splits4: {time.perf_counter()-t0:.1f}s", flush=True)

    results = {}

    def timeit(tag, fn, total_levels):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn())
        _ = np.asarray(out[:1, :1])
        print(f"{tag}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn())
            _ = np.asarray(out[:1, :1])
            ts.append(time.perf_counter() - t0)
        med = statistics.median(ts)
        per_level = (med - 0.027) / rep / total_levels  # subtract dispatch
        results[tag] = per_level
        print(f"{tag}: {med*1e3:.1f}ms total -> {per_level*1e3:.2f} ms/level "
              f"(rep={rep}, chains {[f'{t*1e3:.0f}' for t in ts]})",
              flush=True)
        return out

    # exactness first (rep includes recomputation of the same output).
    # Splits are passed as DEVICE arrays and the calls are jitted: an
    # un-jitted _merge_splits pays ~19 sequential lazy gathers x 27 ms
    # relay latency (measured 560 ms/level — a harness artifact, not
    # kernel time).  Production runs splits inside the sort's jit.
    s4 = [jax.device_put(jnp.asarray(splits[k])) for k in
          ("w1_row", "s1", "e1", "e2", "s2",
           "w3_row", "s3", "e3", "e4", "s4", "dflag")]
    call4 = jax.jit(functools.partial(
        _merge4_call(n // b_out, b_out, rep, _interpret())))
    out4 = timeit("merge4(L)", lambda: call4(*s4, x), 1)
    got = np.asarray(out4.reshape(-1)[:n])
    want = _expected_4l(keys, n, L)
    assert np.array_equal(got, want), "merge4 WRONG at 64M"
    print("merge4 exact at 64M", flush=True)

    # production 2-way pair in the same REP harness: level L then level 2L
    sp2a = [jax.device_put(s) for s in jax.jit(
        lambda v: _merge_splits(v, L, n, b_out))(x)]
    call2 = _merge2_call(n // b_out, b_out, rep, _interpret())
    call2j = jax.jit(call2)
    out2a = timeit("merge2(L)", lambda: call2j(*sp2a, x), 1)
    x2 = out2a
    sp2b = [jax.device_put(s) for s in jax.jit(
        lambda v: _merge_splits(v, 2 * L, n, b_out))(x2)]
    out2b = timeit("merge2(2L)", lambda: call2j(*sp2b, x2), 1)
    got2 = np.asarray(out2b.reshape(-1)[:n])
    assert np.array_equal(got2, want), "merge2 pair WRONG at 64M"
    results["merge2_pair"] = results["merge2(L)"] + results["merge2(2L)"]
    results["ratio_4way_vs_2way_pair"] = (
        results["merge4(L)"] / results["merge2_pair"]
    )
    # splits cost, amortized honestly: time ONE jitted split computation
    # per side (runs per level in production)
    for tag, fn in (
        ("splits2", jax.jit(lambda v: _merge_splits(v, L, n, b_out))),
    ):
        jax.block_until_ready(fn(x))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x))
            ts.append(time.perf_counter() - t0)
        results[tag] = statistics.median(ts)
        print(f"{tag}: {results[tag]*1e3:.2f} ms (jitted, incl dispatch)",
              flush=True)
    print(json.dumps({k: round(v * 1e3, 3) if "ratio" not in k else round(v, 3)
                      for k, v in results.items()}))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "check":
        check()
    else:
        bench()
