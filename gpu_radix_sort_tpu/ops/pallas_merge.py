"""HBM-scale Pallas merge sort: tile sort + merge-path bitonic merge levels.

The large-n counterpart of ops/pallas_sort.py (which is VMEM-bounded).
Replaces the reference's global radix pipeline (digit kernel + Blelloch
scan + scatter, libsort/sort.cu + scan.cu) with the movement pattern TPUs
are actually good at (docs/PERF_NOTES.md): **sequential streams**, not
fine-grained scatter.

    stage 1   VMEM bitonic tile sort (grid over TILE-key tiles)
    level k   pairwise merge of sorted runs, one Pallas program per output
              block: two dynamic-offset DMA window loads -> align + mask by
              run bounds -> one VMEM bitonic *merge* (log2 stages, not
              log^2) -> emit the block

Merge-path splits (which slice of each run feeds each output block) are
computed OUTSIDE the kernel by a vectorized binary search in XLA — they are
tiny (n / b_out scalars per level).  Every HBM access in the kernel is a
≥128KB sequential window read or a block-aligned write, so levels run near
streaming bandwidth; the VPU cost per level is log2(2*b_out) ≈ 16
compare-exchange stages instead of a full sort's log^2.

Window alignment: DMA offsets are row (128-element) granular, but merge
splits are element-granular.  Each window is loaded with one row of slack,
rotated in-register so the valid run starts at flat position 0 (dynamic
rotation decomposed into 7 conditional static rolls — Mosaic supports
static shifts only), PAD-masked past the valid count, then truncated to
exactly b_out elements, giving a tight 2*b_out bitonic buffer.

Keys-only and EXACT, duplicates included: each output block materializes
the smallest b_out of the multiset union of its two bounded windows, and
the per-block splits partition each pair's multiset by rank, so the value
multiset per block is independent of how ties are ranked.

Sizes: n is padded to a power of two with 0xFFFFFFFF (sliced off after),
minimum 2 tiles.  Each level is its own pallas_call specialization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .bits import KEY_DTYPE
from .pallas_sort import LANES, _bitonic_body, _compare_exchange, _interpret
from .pallas_sort import _tpu_roll

PAD = np.uint32(0xFFFFFFFF)  # numpy scalar: kernels may not capture arrays

TILE = 1 << 17  # stage-1 sorted run length (VMEM bitonic ceiling)
B_OUT = 1 << 16  # output block per merge program (64K keys; measured best)


def _w_rows(b_out: int) -> int:
    """Window rows: one row of alignment slack, then rounded UP to a
    multiple of 8 so DMA windows/scratch stay on the (8, 128) tile — a
    non-multiple-of-8 row count crashes the TPU worker (PERF_NOTES).
    Production b_out=2^16 gives 520 rows, unchanged by the rounding (the
    compiled Mosaic geometry stays cached)."""
    rows = b_out // LANES + 8
    return rows + (-rows) % 8


# ---------------------------------------------------------------------------
# Stage 1: gridified tile sort
# ---------------------------------------------------------------------------

def _tile_sort_kernel(x_ref, o_ref, *, tile: int, interpret: bool):
    (out,) = _bitonic_body(tile, (x_ref[...],), interpret)
    o_ref[...] = out


@functools.lru_cache(maxsize=None)
def _tile_sort_call(ntiles: int, tile: int, interpret: bool):
    rows = tile // LANES
    kernel = functools.partial(
        _tile_sort_kernel, tile=tile, interpret=interpret
    )
    return pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec((rows, LANES), lambda t: (t, 0))],
        out_specs=pl.BlockSpec((rows, LANES), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((ntiles * rows, LANES), KEY_DTYPE),
        interpret=interpret,
    )


def sort_tiles(x2d: jnp.ndarray, tile: int = TILE) -> jnp.ndarray:
    """Sort each consecutive ``tile``-key run of a (rows, 128) array."""
    n = x2d.shape[0] * LANES
    if n % tile:
        raise ValueError(f"n={n} not a multiple of tile={tile}")
    return _tile_sort_call(n // tile, tile, _interpret())(x2d)


# ---------------------------------------------------------------------------
# Merge-path splits (XLA, per level)
# ---------------------------------------------------------------------------

def _merge_splits(x2d: jnp.ndarray, L: int, n: int, b_out: int):
    """For each output block (rank r = g*b_out within its pair of L-runs),
    the largest a in [max(0, r-L), min(L, r)] with A[a-1] <= B[r-a]
    (A-first on ties) — a feasible multiset split.  Returns per-block
    int32 scalars: aligned window row starts + absolute valid ranges."""
    x = x2d.reshape(-1)
    nblocks = n // b_out
    g = jnp.arange(nblocks, dtype=jnp.int32)
    two_l = 2 * L
    pair = (g * b_out) // two_l
    r = g * b_out - pair * two_l
    a_base = pair * two_l
    b_base = a_base + L

    lo = jnp.maximum(0, r - L)
    hi = jnp.minimum(L, r)
    for _ in range(int(np.log2(L)) + 2):
        mid = (lo + hi + 1) // 2
        # one packed gather per iteration (gather ops have fixed dispatch
        # cost; 28 sequential iterations x 2 gathers was a measurable
        # fraction of level time)
        probes = x[
            jnp.stack(
                [
                    jnp.clip(a_base + mid - 1, 0, n - 1),
                    jnp.clip(b_base + r - mid, 0, n - 1),
                ]
            )
        ]
        a_prev, b_at = probes[0], probes[1]
        b_in_range = (r - mid) < L  # past B's end acts as +inf
        ok = (mid == 0) | ~b_in_range | (a_prev <= b_at)
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid - 1)
    a = lo
    b = r - a

    a_lo = a_base + a
    # B's window is read from the REVERSED array xr (xr[i] = x[n-1-i]), so
    # its content is descending and no in-kernel reversal is needed.  The
    # taken range [b_base+b, b_base+L) of x maps to xr positions
    # [n - b_base - L, n - b_base - b), i.e. an xr-window ENDING at
    # n - b_base - b; the kernel loads [rb_lo, rb_lo + W) with
    # rb_lo = n - b_base - b - (W - slack) and rotates by the end slack.
    # xr is padded with w_rows of PAD at the FRONT (merge_level), so xr
    # coordinates here carry a +w_elems offset; this keeps every window's
    # start row >= 0 even for the first xr region (the last pair's B run).
    off = _w_rows(b_out) * LANES
    rb_hi = off + n - (b_base + b)  # exclusive end in padded-xr coords
    rb_lo = off + n - (b_base + L)  # start of B's region

    def row(abs_pos):
        return (abs_pos // LANES).astype(jnp.int32)

    return (
        row(a_lo),
        a_lo.astype(jnp.int32),
        (a_base + L).astype(jnp.int32),
        row(rb_lo),
        rb_lo.astype(jnp.int32),
        rb_hi.astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# Merge level kernel
# ---------------------------------------------------------------------------

def _flat_rot_left(x, s: int, interpret: bool):
    """Rotate the row-major flattening of (R, 128) left by static s < 128:
    out[flat i] = x[flat (i + s) mod n]."""
    roll = jnp.roll if interpret else _tpu_roll
    y = roll(x, -s, 1)  # lane part (cyclic within rows)
    y_next = roll(y, -1, 0)  # row carry for wrapped lanes
    cc = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(cc < LANES - s, y, y_next)


def _align_window(win, slack, valid, interpret: bool):
    """Rotate a window so the valid ascending run starts at flat position 0
    and PAD-mask everything past ``valid`` elements.  ``slack`` in [0, 128)
    and ``valid`` are dynamic scalars; the rotation decomposes into 7
    conditional static rotations."""
    for i in range(7):  # 2^7 = 128 > max slack
        rotated = _flat_rot_left(win, 1 << i, interpret)
        take = ((slack >> i) & 1) == 1
        win = jnp.where(take, rotated, win)
    rr = jax.lax.broadcasted_iota(jnp.int32, win.shape, 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, win.shape, 1)
    pos = rr * LANES + cc
    return jnp.where(pos < valid, win, PAD)


def _flat_rot_right(x, s: int, interpret: bool):
    """Rotate the row-major flattening of (R, 128) right by static s < 128:
    out[flat i] = x[flat (i - s) mod n]."""
    roll = jnp.roll if interpret else _tpu_roll
    y = roll(x, s, 1)
    y_prev = roll(y, 1, 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(cc >= s, y, y_prev)


def _align_window_end(win, end_slack, valid, interpret: bool):
    """Rotate a window so its valid *descending* run ends at the flat end
    (rotate right by ``end_slack`` in [0, 128)), then MAX-mask everything
    before the last ``valid`` elements."""
    for i in range(7):
        rotated = _flat_rot_right(win, 1 << i, interpret)
        take = ((end_slack >> i) & 1) == 1
        win = jnp.where(take, rotated, win)
    rr = jax.lax.broadcasted_iota(jnp.int32, win.shape, 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, win.shape, 1)
    pos = rr * LANES + cc
    n_win = win.shape[0] * LANES
    return jnp.where(pos >= n_win - valid, win, PAD)


def _merge_kernel(
    a_row, a_lo, a_hi, rb_row, rb_lo, rb_hi,  # scalar prefetch (nblocks,)
    x_hbm, xr_hbm, o_ref, sa, sb, sems, *, b_out: int, interpret: bool,
):
    from jax.experimental.pallas import tpu as pltpu

    b_rows = b_out // LANES
    w_rows = _w_rows(b_out)
    g = pl.program_id(0)
    # B is loaded from the reversed array so its window is descending: the
    # window must END at rb_hi (xr coords); load W rows ending at or after
    # rb_hi, clamped to B's region start.
    rb_start = jnp.maximum((rb_hi[g] + LANES - 1) // LANES - w_rows, 0)
    ca = pltpu.make_async_copy(
        x_hbm.at[pl.ds(a_row[g], w_rows), :], sa, sems.at[0]
    )
    cb = pltpu.make_async_copy(
        xr_hbm.at[pl.ds(rb_start, w_rows), :], sb, sems.at[1]
    )
    ca.start()
    cb.start()
    ca.wait()
    cb.wait()

    # A: rotate the valid ascending run to flat position 0, PAD-mask the
    # tail, truncate to b_out (at most b_out A-elements reach this block).
    w_elems = w_rows * LANES
    slack_a = a_lo[g] - a_row[g] * LANES
    va = _align_window(
        sa[...], slack_a,
        jnp.minimum(a_hi[g] - a_lo[g], w_elems - slack_a), interpret,
    )[:b_rows]

    # B: descending window; rotate so the valid run ENDS at the flat end,
    # then MAX-mask the front (excluded larger elements) and keep the last
    # b_out elements.  end slack = distance from rb_hi to the window end.
    end_slack = rb_start * LANES + w_elems - rb_hi[g]  # in [0, 128)+rows
    # rotate RIGHT by end_slack == rotate LEFT by (w_elems - end_slack).
    valid_b = jnp.minimum(rb_hi[g] - rb_lo[g], w_elems - end_slack)
    vb_full = _align_window_end(sb[...], end_slack, valid_b, interpret)
    vb = vb_full[w_rows - b_rows:]

    # Bitonic buffer: ascending(A, PAD tail) ++ descending(B, MAX front).
    buf = jnp.concatenate([va, vb], axis=0)

    buf_elems = 2 * b_out
    r2 = jax.lax.broadcasted_iota(jnp.int32, (2 * b_rows, LANES), 0)
    c2 = jax.lax.broadcasted_iota(jnp.int32, (2 * b_rows, LANES), 1)
    idx = r2 * LANES + c2
    log_buf = buf_elems.bit_length() - 1
    vals = (buf,)
    for j_log in range(log_buf - 1, -1, -1):
        vals = _compare_exchange(vals, idx, 1 << j_log, log_buf, interpret)
    o_ref[...] = vals[0][:b_rows]


@functools.lru_cache(maxsize=None)
def _merge_call(nblocks: int, b_out: int, interpret: bool):
    from jax.experimental.pallas import tpu as pltpu

    b_rows = b_out // LANES
    w_rows = _w_rows(b_out)
    kernel = functools.partial(_merge_kernel, b_out=b_out, interpret=interpret)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((b_rows, LANES), lambda g, *_: (g, 0)),
            scratch_shapes=[
                pltpu.VMEM((w_rows, LANES), KEY_DTYPE),
                pltpu.VMEM((w_rows, LANES), KEY_DTYPE),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nblocks * b_rows, LANES), KEY_DTYPE),
        interpret=interpret,
    )


def merge_level(x2d: jnp.ndarray, L: int, b_out: int = B_OUT) -> jnp.ndarray:
    """One pairwise merge level: (rows, 128) holding sorted runs of length
    L -> sorted runs of length 2L."""
    n = x2d.shape[0] * LANES
    w_elems = _w_rows(b_out) * LANES
    # L >= w_elems guarantees A windows never cross the array end and B
    # windows stay inside padded xr — no per-level padding copy of x.
    if L % b_out or n % (2 * L) or L < w_elems:
        raise ValueError(f"invalid level: n={n} L={L} b_out={b_out}")
    splits = _merge_splits(x2d, L, n, b_out)
    # Element-reversed copy: B windows read from here are descending, so
    # the kernel needs no reversal network (lax.rev is fine in XLA, just
    # not inside Mosaic).  Also guarantees B windows never cross row 0.
    w_rows = _w_rows(b_out)
    xr = jnp.concatenate(
        [jnp.full((w_rows, LANES), PAD, KEY_DTYPE), jnp.flip(x2d, (0, 1))]
    )
    return _merge_call(n // b_out, b_out, _interpret())(*splits, x2d, xr)


# ---------------------------------------------------------------------------
# Full sort
# ---------------------------------------------------------------------------

# Measured on TPU v5e at 64M: merge 153.6ms vs lax.sort 189ms device-true
# (1.23x).  Below ~16M the compile cost and stage-1 fraction erode the win;
# "auto" routes only sizes where the advantage is established.
AUTO_MIN_N = 1 << 24


def supported_auto(n: int) -> bool:
    return n >= AUTO_MIN_N and not _interpret()


def sort_full_large(
    keys: jnp.ndarray, *, tile: int = TILE, b_out: int = B_OUT
) -> jnp.ndarray:
    """HBM-scale ascending sort: pad to pow2, tile-sort, merge levels.
    Requires tile >= b_out + 8*128 (window-containment invariant)."""
    if tile < _w_rows(b_out) * LANES:
        raise ValueError(f"tile {tile} must be >= {_w_rows(b_out) * LANES}")
    n = keys.shape[0]
    n_pad = max(2 * tile, 1 << max(n - 1, 1).bit_length())
    padded = jnp.concatenate(
        [keys.astype(KEY_DTYPE), jnp.full((n_pad - n,), PAD, KEY_DTYPE)]
    )
    x = sort_tiles(padded.reshape(-1, LANES), tile)
    L = tile
    while L < n_pad:
        x = merge_level(x, L, b_out)
        L *= 2
    return x.reshape(-1)[:n]
