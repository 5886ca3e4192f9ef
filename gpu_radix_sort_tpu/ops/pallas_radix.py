"""Pallas radix digit-binning engine: HBM-scale stable digit sorts.

TPU-native counterpart of the reference's radix core — the per-block digit
sort (gpu_radix_sort_local, libsort/sort.cu:29-184), the Blelloch scan of
per-block digit counts (scan.cu:165-250), and the global shuffle
(gpu_glbl_shuffle, sort.cu:186-213) — re-architected for hardware where
fine-grained scatter is unavailable (in-kernel scatter unsupported, XLA
scatter ~120M elem/s; docs/PERF_NOTES.md):

    stage A   per-tile stable digit sort: XLA row sort over (n_tiles, TILE)
              — one comparison network per tile at multi-G keys/s (the
              reference's per-block shared-memory sort, minus its 2-bit
              width limit: a GPU shmem artifact)
    metadata  per-tile digit starts via vectorized searchsorted; global
              run destinations via one exclusive cumsum over the (D,
              n_tiles) counts in output order (the reference's
              scan-of-block-sums, scan.cu, collapsed to one XLA cumsum —
              grids here are thousands of tiles, not millions of blocks)
    stage B   Pallas binning kernel, one program per B_OUT-key output
              block: GATHER-side reconstruction.  Each block DMAs in the
              run fragments that land in it (8-row chunks into slot
              buffers, NSLOT fragments in flight), rotates each fragment
              to its destination phase in-register (dynamic rotation =
              conditional static rolls; Mosaic has no dynamic shifts),
              masks, and accumulates.  Writes are whole sequential blocks.

Why gather-side: a scatter-side formulation (each tile DMA-ing its runs
out) must read-modify-write the boundary blocks that two runs share, which
imposes a global write order across grid steps (digit regions interleave
tiles); reading is order-free, so the gather form is race-free by
construction and exact under ANY digit distribution — skew only adds loop
iterations, never wrong bytes.

Stability: stage A is a stable sort and output order is (digit, tile,
within-tile rank), i.e. exactly the stable digit order of the input.

Sizes: n is padded to a whole number of tiles with 0xFFFFFFFF (maximal
digit at any window — pads land at the global tail and are sliced off).
Digit widths wider than PASS_WIDTH run as stable LSD subpasses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

from .bits import KEY_DTYPE, extract_digits, validate_digit_range
from .pallas_merge import _flat_rot_left
from .pallas_sort import LANES, _interpret

PAD = np.uint32(0xFFFFFFFF)

PASS_WIDTH = 4  # digits per binning pass (D=16 keeps fragment counts low)
# Measured (TPU v5e, 64M keys, device-true): T=32K/B=8K best at 125.3ms
# (536M keys/s, 2.11x lax.sort_key_val); T=16K loses to fragment count,
# T=64K to the wider row sort.  docs/PERF_NOTES.md round-2 addendum.
TILE = 1 << 15  # stage-A tile (keys)
B_OUT = 1 << 13  # stage-B output block (keys)

# The binning kernel's run/block metadata rides scalar prefetch in SMEM
# (1 MiB total).  Cap tile and block counts so 2*(tiles*D) + 2*blocks i32
# scalars stay well under it (~400 KiB at the caps); geometry scales up
# with n instead (measured: 256Mi at TILE=32K blew SMEM by 261 KiB).
MAX_TILES = 2048
MAX_BLOCKS = 16384


def auto_geometry(n: int, width: int) -> tuple[int, int]:
    """(tile, b_out) for a pass over n keys: the measured-fastest defaults,
    scaled up to honor the SMEM metadata caps."""
    tile = TILE
    while -(-n // tile) > MAX_TILES:
        tile *= 2
    n_pad = max(-(-n // tile) * tile, tile)
    b_out = B_OUT
    while n_pad // b_out > MAX_BLOCKS:
        b_out *= 2
    return tile, b_out
NSLOT = 8  # fragment DMA slots in flight per block
# DMA granularity: must be a multiple of 8 rows (Mosaic crashes otherwise);
# 16 halves the per-fragment chunk-branch count on the scalar core, which
# is what stage B is bound by (measured ~1us/fragment of scalar work).
# Probe-able via binning_pass(chunk_rows=...) — the window-anchoring
# invariants below are asserted per call, so a larger granularity (e.g. 32,
# the declared round-4 lever) can be measured without mis-sized-DMA risk.
CHUNK_ROWS = 16


def _check_chunk_rows(chunk_rows: int, b_out: int) -> None:
    """Window-anchoring invariants (VERDICT r4 item 5 guard): chunk reads
    start at rs = SRC_FRONT_ROWS + r0 - (dr0 - a0) - extra with dr0 - a0 <
    chunk_rows and extra <= 1, so the earliest read row is SRC_FRONT_ROWS -
    chunk_rows >= 0; tail overreads are covered by the 2*chunk_rows pad
    rows binning_pass appends.  DMA row counts must be multiples of 8
    (violations crash the TPU worker, docs/PERF_NOTES.md)."""
    if chunk_rows % 8 or chunk_rows <= 0:
        raise ValueError(f"chunk_rows {chunk_rows} must be a positive x8")
    if SRC_FRONT_ROWS < chunk_rows:
        raise ValueError(
            f"chunk_rows {chunk_rows} exceeds SRC_FRONT_ROWS "
            f"{SRC_FRONT_ROWS} (front-padding containment)"
        )
    if b_out % (chunk_rows * LANES):
        raise ValueError(
            f"b_out {b_out} must be a multiple of {chunk_rows * LANES}"
        )


def _slot_rows(b_out: int, chunk_rows: int = CHUNK_ROWS) -> int:
    """Fragment staging rows: chunk reads are anchored at the destination
    window base floor(dst_row, chunk), so a fragment sits up to
    chunk_rows+1 rows deep plus its own b_out/128 rows and <1 row of
    lane-phase slack, rounded up to whole chunks."""
    raw = b_out // LANES + chunk_rows + 2 + (chunk_rows - 1)
    return (raw // chunk_rows) * chunk_rows


# front padding of the source array: with window-anchored fragments the
# chunk reads start at most (dr0 mod CHUNK_ROWS) + 1 <= CHUNK_ROWS rows
# before the fragment's first source row (rs = SRC_FRONT_ROWS + r0 -
# (dr0 - a0) - extra), INDEPENDENT of b_out — so any b_out from
# auto_geometry is in bounds.  520 rows is generous headroom (one-time
# 260 KiB concat), kept stable so compiled Mosaic geometries stay cached.
SRC_FRONT_ROWS = 520  # multiple of CHUNK_ROWS


# ---------------------------------------------------------------------------
# Stage A: per-tile stable digit sort (XLA row sort)
# ---------------------------------------------------------------------------

def tile_digit_sort(keys_t: jnp.ndarray, offset: int, width: int):
    """Stably sort each row of (n_tiles, TILE) by its digit; returns
    (sorted_keys (n_tiles, TILE), starts (n_tiles, D+1) int32) where
    starts[t, d] is the within-tile start of digit d's run."""
    digits = extract_digits(keys_t, offset, width)
    if width <= 7:
        # u8 digit keys measured 23% faster through the row sort than u32
        # (v5e, T=32768; docs/PERF_NOTES.md round-2 addendum); D+1 queries
        # must still fit the dtype.
        digits = digits.astype(jnp.uint8)
    sorted_digits, sorted_keys = lax.sort(
        (digits, keys_t), dimension=1, num_keys=1, is_stable=True
    )
    queries = jnp.arange((1 << width) + 1, dtype=jnp.int32)
    starts = jax.vmap(
        lambda row: jnp.searchsorted(
            row.astype(jnp.int32), queries, side="left"
        )
    )(sorted_digits)
    return sorted_keys, starts.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Metadata: run destinations + per-block fragment ranges (XLA)
# ---------------------------------------------------------------------------

def _binning_metadata(starts: jnp.ndarray, tile: int, b_out: int, n_pad: int):
    """Runs are the (digit, tile) segments of the tile-sorted array, in
    OUTPUT order k = d * n_tiles + t.  Returns
      g_run (n_runs+1,)  destination start of run k (g_run[-1] = n_pad);
                         run k's length is g_run[k+1] - g_run[k]
      sflat (n_runs,)    source flat position of run k in the tile-sorted
                         array (t * tile + starts[t, d])
      k0    (nblocks,)   first run intersecting each output block
      nfrag (nblocks,)   number of runs intersecting each output block
    All int32 — single-chip n < 2^31 (the distributed paths own the >2^31
    regime via their x64 metadata, parallel/exchange.py)."""
    n_tiles = starts.shape[0]
    counts = starts[:, 1:] - starts[:, :-1]  # (n_tiles, D)
    ct = counts.T.reshape(-1)  # run order (d, t)
    g_run = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(ct, dtype=jnp.int32)]
    )
    tbase = jnp.arange(n_tiles, dtype=jnp.int32) * tile
    sflat = (starts[:, :-1].T + tbase[None, :]).reshape(-1)

    nblocks = n_pad // b_out
    jb = jnp.arange(nblocks, dtype=jnp.int32) * b_out
    ends = g_run[1:]
    k0 = jnp.searchsorted(ends, jb, side="right").astype(jnp.int32)
    k1 = jnp.searchsorted(g_run[:-1], jb + b_out, side="left").astype(
        jnp.int32
    )
    return g_run, sflat, k0, k1 - k0


# ---------------------------------------------------------------------------
# Stage B: binning kernel
# ---------------------------------------------------------------------------

def _rot_lanes_left(win, dl, interpret: bool):
    """Flat rotation left by dynamic dl in [0, 128): 7 conditional static
    flat rotations (lane roll with row carry)."""
    for i in range(7):
        rolled = _flat_rot_left(win, 1 << i, interpret)
        win = jnp.where(((dl >> i) & 1) == 1, rolled, win)
    return win


def _bin_kernel(
    k0_ref, nfrag_ref, g_ref, s_ref,  # scalar prefetch
    x_hbm, o_ref, acc, slots, sems, *, b_out: int, interpret: bool,
    chunk_rows: int = CHUNK_ROWS,
):
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(0)
    b_rows = b_out // LANES
    srows = _slot_rows(b_out, chunk_rows)
    max_chunks = srows // chunk_rows
    jb = j * b_out
    k0j = k0_ref[j]
    nf = nfrag_ref[j]
    acc[...] = jnp.zeros((b_rows + srows, LANES), KEY_DTYPE)

    def frag_params(k):
        """Window-anchored read plan.  The fragment's chunk reads start
        (dst-row - chunk-alignment) rows before its first source row, and
        land at SLOT ROW 0 — so the fragment sits at a STATIC window whose
        base in destination coordinates is a0 = floor8(dst_row).  Only a
        <128 lane-phase rotation (with row carry) remains, applied to a
        small static window sized by the fragment's row extent."""
        g_k = g_ref[k]
        end_k = g_ref[k + 1]
        lo = jnp.maximum(g_k, jb)
        hi = jnp.minimum(end_k, jb + b_out)
        ln = jnp.maximum(hi - lo, 0)
        dst0 = lo - jb
        dr0 = dst0 // LANES
        lmod = dst0 - dr0 * LANES
        src0 = s_ref[k] + (lo - g_k)
        r0 = src0 // LANES
        phase = src0 - r0 * LANES
        extra = jnp.where(phase < lmod, 1, 0)  # borrow one row of shift
        a0 = (dr0 // chunk_rows) * chunk_rows  # window base (dst rows)
        # padded-x row corresponding to slot row 0 (= dst row a0)
        rs = SRC_FRONT_ROWS + r0 - dr0 - extra + a0
        start_row = dr0 - a0 + extra  # fragment's first row in the window
        end_row = (start_row * LANES + phase + ln + LANES - 1) // LANES
        # chunks == 0 encodes an empty fragment, so chunk/place predicates
        # need no separate ln > 0 conjunction (scalar-core savings)
        chunks = jnp.where(
            ln > 0, (end_row + chunk_rows - 1) // chunk_rows, 0
        )
        return ln, rs, a0, chunks, dst0, phase, lmod

    def chunk_copy(u: int, rs, q: int):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(rs + q * chunk_rows, chunk_rows), :],
            slots.at[u, q * chunk_rows : (q + 1) * chunk_rows, :],
            sems.at[u, q],
        )

    def place(u: int, wrows: int, ln, a0, dst0, phase, lmod):
        """Rotate the fragment's lane phase within a static wrows-row
        window and merge it into acc at dynamic row offset a0."""
        win = slots[u, :wrows, :]
        dl = jnp.mod(phase - lmod, LANES)
        win = _rot_lanes_left(win, dl, interpret)
        rr = lax.broadcasted_iota(jnp.int32, (wrows, LANES), 0)
        cc = lax.broadcasted_iota(jnp.int32, (wrows, LANES), 1)
        pos = (a0 + rr) * LANES + cc
        m = (pos >= dst0) & (pos < dst0 + ln)
        cur = acc[pl.ds(a0, wrows), :]
        acc[pl.ds(a0, wrows), :] = jnp.where(m, win, cur)

    # fragment row-extent classes: most fragments are far smaller than the
    # slot; rotating only their window is the dominant VPU saving.
    classes = [c for c in (1, 2) if c < max_chunks] + [max_chunks]

    def wave(w, carry):
        base = k0j + w * NSLOT
        for u in range(NSLOT):
            @pl.when(w * NSLOT + u < nf)
            def _(u=u):
                ln, rs, a0, chunks, dst0, phase, lmod = frag_params(base + u)
                for q in range(max_chunks):
                    @pl.when(q < chunks)
                    def _(q=q):
                        chunk_copy(u, rs, q).start()

        for u in range(NSLOT):
            @pl.when(w * NSLOT + u < nf)
            def _(u=u):
                ln, rs, a0, chunks, dst0, phase, lmod = frag_params(base + u)
                for q in range(max_chunks):
                    @pl.when(q < chunks)
                    def _(q=q):
                        chunk_copy(u, rs, q).wait()

                prev = 0
                for cls in classes:
                    @pl.when((prev < chunks) & (chunks <= cls))
                    def _(cls=cls):
                        place(u, cls * chunk_rows, ln, a0, dst0, phase, lmod)
                    prev = cls

        return carry

    nwaves = (nf + NSLOT - 1) // NSLOT
    lax.fori_loop(0, nwaves, wave, 0)
    o_ref[...] = acc[:b_rows, :]


@functools.lru_cache(maxsize=None)
def _bin_call(
    nblocks: int, b_out: int, interpret: bool,
    chunk_rows: int = CHUNK_ROWS,
):
    from jax.experimental.pallas import tpu as pltpu

    b_rows = b_out // LANES
    srows = _slot_rows(b_out, chunk_rows)
    kernel = functools.partial(
        _bin_kernel, b_out=b_out, interpret=interpret, chunk_rows=chunk_rows
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((b_rows, LANES), lambda j, *_: (j, 0)),
            scratch_shapes=[
                # accumulator with window overhang room (dynamic-offset
                # window writes may extend past b_rows; only [:b_rows]
                # is ever emitted)
                pltpu.VMEM((b_rows + srows, LANES), KEY_DTYPE),
                pltpu.VMEM((NSLOT, srows, LANES), KEY_DTYPE),  # frag slots
                pltpu.SemaphoreType.DMA((NSLOT, srows // chunk_rows)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nblocks * b_rows, LANES), KEY_DTYPE),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def binning_pass(
    keys: jnp.ndarray,
    offset: int,
    width: int,
    *,
    tile: int | None = None,
    b_out: int | None = None,
    chunk_rows: int = CHUNK_ROWS,
) -> jnp.ndarray:
    """One stable binning pass by bits [offset, offset+width).  ``width``
    must keep D = 2^width small (fragment count per block grows with D);
    wider windows should go through :func:`sort_by_digits_large`.
    Geometry defaults to :func:`auto_geometry` (SMEM-bounded).
    ``chunk_rows``: DMA chunk granularity (probe lever; invariants
    asserted by :func:`_check_chunk_rows`)."""
    validate_digit_range(offset, width)
    if tile is None or b_out is None:
        at, ab = auto_geometry(keys.shape[0], width)
        tile = tile or at
        b_out = b_out or ab
    if tile % b_out:
        raise ValueError(f"tile {tile} must be a multiple of b_out {b_out}")
    _check_chunk_rows(chunk_rows, b_out)
    n = keys.shape[0]
    if n == 0:
        return keys.astype(KEY_DTYPE)
    n_pad = max(-(-n // tile) * tile, tile)
    padded = jnp.concatenate(
        [keys.astype(KEY_DTYPE), jnp.full((n_pad - n,), PAD, KEY_DTYPE)]
    )
    n_tiles = n_pad // tile
    sorted_t, starts = tile_digit_sort(
        padded.reshape(n_tiles, tile), offset, width
    )
    g_run, sflat, k0, nfrag = _binning_metadata(starts, tile, b_out, n_pad)
    x = jnp.concatenate(
        [
            # dst-row-aligned chunk reads start up to b_out/128 rows early
            jnp.full((SRC_FRONT_ROWS, LANES), PAD, KEY_DTYPE),
            sorted_t.reshape(-1, LANES),
            # ... and chunk rounding may overread past the last row
            jnp.full((2 * chunk_rows, LANES), PAD, KEY_DTYPE),
        ]
    )
    out = _bin_call(n_pad // b_out, b_out, _interpret(), chunk_rows)(
        k0, nfrag, g_run, sflat, x
    )
    return out.reshape(-1)[:n]


def binning_pass_kv_cols(
    keys: jnp.ndarray,
    cols: tuple,
    offset: int,
    width: int,
    *,
    tile: int | None = None,
    b_out: int | None = None,
) -> tuple[jnp.ndarray, tuple]:
    """One stable kv binning pass over COLUMN streams: each element of
    ``cols`` is a (n,) uint32 payload lane following its key (reference:
    the paired key/value radix pipeline, libsort/sort.cu:29-213).

    Stage A carries the lanes as extra row-sort operands; stage B runs the
    UNCHANGED binning kernel once per stream — keys, then each lane — with
    the SAME (key-digit-derived) run metadata: stage A's row sort moves
    whole records, so every stream shares one tile-sorted layout and one
    fragment plan.  Fragment work (the scalar-core bound of stage B,
    docs/PERF_NOTES.md round-2 addendum) scales with the number of
    streams, but stage B is ~20% of pass time at production geometry, so
    lanes cost far less than a second XLA sort operand.

    Columns, not an (n, L) matrix, on purpose: TPU tiled layouts pad a
    minor axis of L < 128 up to the 128-lane tile — an (n, 2) uint32
    array materializes at 64x its logical bytes (measured: 32 GiB for
    64M records).  Everything here stays (n,) / (rows, 128)."""
    validate_digit_range(offset, width)
    n = keys.shape[0]
    for c in cols:
        if c.shape != (n,):
            raise ValueError(
                f"each payload column must be ({n},); got {c.shape}"
            )
    if tile is None or b_out is None:
        at, ab = auto_geometry(n, width)
        tile = tile or at
        b_out = b_out or ab
    if tile % b_out:
        raise ValueError(f"tile {tile} must be a multiple of b_out {b_out}")
    if b_out % (CHUNK_ROWS * LANES):
        raise ValueError(
            f"b_out {b_out} must be a multiple of {CHUNK_ROWS * LANES}"
        )
    if n == 0 or not cols:
        return binning_pass(
            keys, offset, width, tile=tile, b_out=b_out
        ), tuple(c.astype(jnp.uint32) for c in cols)
    n_pad = max(-(-n // tile) * tile, tile)
    pk = jnp.concatenate(
        [keys.astype(KEY_DTYPE), jnp.full((n_pad - n,), PAD, KEY_DTYPE)]
    )
    n_tiles = n_pad // tile
    keys_t = pk.reshape(n_tiles, tile)
    digits = extract_digits(keys_t, offset, width)
    if width <= 7:
        digits = digits.astype(jnp.uint8)  # same measured row-sort win
    padded_cols = tuple(
        jnp.concatenate(
            [c.astype(jnp.uint32), jnp.zeros(n_pad - n, jnp.uint32)]
        ).reshape(n_tiles, tile)
        for c in cols
    )
    ops = lax.sort(
        (digits, keys_t) + padded_cols,
        dimension=1,
        num_keys=1,
        is_stable=True,
    )
    sorted_digits, sorted_keys = ops[0], ops[1]
    queries = jnp.arange((1 << width) + 1, dtype=jnp.int32)
    starts = jax.vmap(
        lambda row: jnp.searchsorted(
            row.astype(jnp.int32), queries, side="left"
        )
    )(sorted_digits).astype(jnp.int32)

    g_run, sflat, k0, nfrag = _binning_metadata(starts, tile, b_out, n_pad)
    # pass chunk_rows explicitly so this shares ONE lru_cache entry (and
    # ONE ~300s Mosaic compile) with binning_pass at the same geometry
    call = _bin_call(n_pad // b_out, b_out, _interpret(), CHUNK_ROWS)

    def run_stream(stream_t):
        x = jnp.concatenate(
            [
                jnp.full((SRC_FRONT_ROWS, LANES), PAD, KEY_DTYPE),
                stream_t.reshape(-1, LANES),
                jnp.full((2 * CHUNK_ROWS, LANES), PAD, KEY_DTYPE),
            ]
        )
        return call(k0, nfrag, g_run, sflat, x).reshape(-1)[:n]

    out_keys = run_stream(sorted_keys)
    out_cols = tuple(run_stream(o) for o in ops[2:])
    return out_keys, out_cols


def binning_pass_kv(
    keys: jnp.ndarray,
    lanes: jnp.ndarray,
    offset: int,
    width: int,
    *,
    tile: int | None = None,
    b_out: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(n, L)-matrix convenience wrapper over
    :func:`binning_pass_kv_cols`.  Prefer the column API under jit — the
    (n, L) form round-trips through a lane-padded layout at the jit
    boundary (see binning_pass_kv_cols docstring)."""
    if lanes.ndim != 2 or lanes.shape[0] != keys.shape[0]:
        raise ValueError(
            f"lanes must be (n, L) with n == len(keys); got {lanes.shape}"
        )
    L = lanes.shape[1]
    out_keys, out_cols = binning_pass_kv_cols(
        keys,
        tuple(lanes[:, w] for w in range(L)),
        offset,
        width,
        tile=tile,
        b_out=b_out,
    )
    return out_keys, jnp.stack(out_cols, axis=1) if L else lanes


def sort_key_value_by_digits_large(
    keys: jnp.ndarray,
    cols: tuple,
    offset: int,
    width: int,
    *,
    tile: int | None = None,
    b_out: int | None = None,
) -> tuple[jnp.ndarray, tuple]:
    """Stable kv sort by bits [offset, offset+width) as LSD subpasses of
    PASS_WIDTH bits (see :func:`sort_by_digits_large`).  ``cols`` may be a
    tuple of (n,) uint32 columns (preferred under jit — layout-safe) or an
    (n, L) matrix; the return matches the input form."""
    validate_digit_range(offset, width)
    matrix = getattr(cols, "ndim", None) == 2
    if matrix:
        lanes = cols
        cols = tuple(lanes[:, w] for w in range(lanes.shape[1]))
    done = 0
    while done < width:
        w = min(PASS_WIDTH, width - done)
        keys, cols = binning_pass_kv_cols(
            keys, cols, offset + done, w, tile=tile, b_out=b_out
        )
        done += w
    if matrix:
        return keys, jnp.stack(cols, axis=1)
    return keys, cols


def sort_by_digits_large(
    keys: jnp.ndarray,
    offset: int,
    width: int,
    *,
    tile: int | None = None,
    b_out: int | None = None,
    chunk_rows: int = CHUNK_ROWS,
) -> jnp.ndarray:
    """Stable sort by bits [offset, offset+width) as LSD subpasses of
    PASS_WIDTH bits (stable subpasses compose to a stable sort of the whole
    window — the reference realizes width the same way as 2-bit LSD passes,
    sort.cu:322-344)."""
    validate_digit_range(offset, width)
    done = 0
    while done < width:
        w = min(PASS_WIDTH, width - done)
        keys = binning_pass(
            keys, offset + done, w, tile=tile, b_out=b_out,
            chunk_rows=chunk_rows,
        )
        done += w
    return keys


# Measured dispatch window (TPU v5e, 64M keys, device-true — see
# docs/PERF_NOTES.md round-2 addendum).  The engine is exact at any size;
# "auto" routes only configurations where it beats lax.sort_key_val:
#   width 4: 127.6ms vs 263.8ms = 2.07x  -> routed here
#   width 8 (two passes): ~255ms vs 263.8ms = 1.03x — parity, not worth the
#     Mosaic compile; kept on XLA (negative result recorded in PERF_NOTES)
AUTO_MIN_N = 1 << 22
AUTO_MAX_WIDTH = 4
# Keys-only width 5-8 as two subpasses: re-probed at the reference's
# 256Mi workload with the round-4 kernel vintage
# (benchmarks/probe_w8_256.py): engine 253.4M keys/s vs XLA 239.9M
# (1.06x, exact vs the stable oracle on device) — the round-2 64M
# parity verdict flips at large n, so w5-8 routes here from 2^27 up.
# (The larger-T fragment lever measured NEGATIVE: T=256K 224.3M.)
AUTO_MIN_N_W8 = 1 << 27


def supported_auto(n: int, width: int) -> bool:
    if _interpret():
        return False
    if width <= AUTO_MAX_WIDTH:
        return n >= AUTO_MIN_N
    return width <= 2 * PASS_WIDTH and n >= AUTO_MIN_N_W8


# kv lanes: width 4 measured 2.31x XLA at 64M pairs; width 5-8 runs as
# two subpasses at 1.12x — only worth the Mosaic compile at large n
# (docs/BENCH_R3.md round-3 kv probe).
AUTO_MIN_N_KV_WIDE = 1 << 25


def supported_auto_kv(n: int, width: int) -> bool:
    """Auto-dispatch gate for the kv (single u32 lane) digit sort."""
    if _interpret():
        return False
    if width <= AUTO_MAX_WIDTH:
        return n >= AUTO_MIN_N
    return width <= 2 * PASS_WIDTH and n >= AUTO_MIN_N_KV_WIDE
