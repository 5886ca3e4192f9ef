"""Overlapped RDMA exchange: remote sends ride out while later tiles sort.

The north star specifies the digit-bucket shuffle "overlapped with per-chip
sort compute" (BASELINE.json).  The plain RDMA exchange
(:mod:`rdma_exchange`) is strictly sort -> exchange: the whole local shard
is digit-sorted by XLA, THEN one Pallas program issues every remote copy.
Here the local sort moves INSIDE the exchange kernel and is chunked into
VMEM-resident groups, so the DMA engine drains group g's outgoing chunks
while the vector core is still sorting group g+1 — the TPU analog of the
reference's concurrent per-round workers (localTest/benchmarks.cpp:105-109,
goroutines in distrib.go:147-158), but at DMA/compute granularity instead
of thread granularity.

Mechanics (SPMD, inside shard_map; one Pallas program per chip):
  * the shard is split into G contiguous groups of ``tile`` elements
    (tile <= 2^16, the 2-operand VMEM bitonic ceiling);
  * per-group digit histograms are computed in XLA (one fused
    broadcast-compare reduce) and all-gathered, so EVERY chip derives the
    identical (src, group, dst) chunk schedule before the kernel runs —
    receivers know exactly how many chunks to wait out, senders know every
    source row and remote destination row from scalar-prefetch metadata;
  * grid step g: pallas pipelines group g's tile into VMEM; the kernel
    sorts it with the composite-key bitonic network
    (digit * 2^16 + rank — unique keys make the network stable,
    ops/pallas_sort.py), stages the sorted tile to HBM with one local
    async copy, and STARTS the group's remote chunk DMAs without waiting
    on them.  Only the last grid step drains send/recv semaphores — every
    earlier group's traffic overlaps subsequent groups' sort compute;
  * chunk starts are 8-row aligned (DMA row-granularity rule,
    docs/PERF_NOTES.md) and RCHUNK rows long; element-granular raggedness
    is carried as per-(src, group) phase metadata, resolved by the
    receiver's stable reassembly sort exactly like the other exchanges;
  * receive layout is (src, group)-major with ascending in-group rank.
    Group g's digit-d elements precede group g+1's in the source shard,
    so positional (src, group, rank) order IS source order, and the
    stable digit reassembly restores (digit, src, rank) = global
    destination order — the same stability argument as
    parallel/exchange.py, refined one level.

Stability within a group is delivered by the composite key; between
groups by the receive layout — so the full LSD loop composes exactly like
the other exchanges (exchange="rdma_overlap" in sort_distributed).

Width is capped at 8: the schedule needs per-group per-digit counts, and
the fused histogram costs O(n * D) VPU compares — negligible at D <= 256,
prohibitive (and 128 MiB of all-gathered metadata) at D = 2^16.

Validated exactly on the virtual mesh via the Mosaic interpreter,
including under the vector-clock DMA race detector; single-chip compiled
evidence comes from the self-loop mesh (tests_tpu/test_rdma_on_chip.py).
Mirrors the repartition plane of the reference (distrib.go:119-158).

Status after on-chip measurement (docs/BENCH_R3.md): the overlap
MECHANISM works as designed — compiled, exact, race-free, and the
serial-vs-overlapped gap is directly measurable via ``serial=True`` —
but the in-kernel per-group composite bitonic costs ~113 ns/key at 2^16
tiles (~13× the XLA digit sort), so on current hardware the round is
compute-drowned and overlap wins ~0%.  ``exchange="rdma"`` with the
fused round loop (distributed._fused_sort_shard) is the production
path; this module stays as the validated overlap harness, worth
revisiting if a near-XLA-speed in-kernel tile sort or a dominant
exchange leg (real ICI at scale) materializes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from ..ops.bits import KEY_DTYPE, extract_digits, validate_digit_range
from ..ops.pallas_sort import LANES, _bitonic_body, _interpret

RCHUNK = 16      # rows per RDMA chunk (2048 keys); multiple of ALIGN
ALIGN = 8        # DMA row-alignment granularity for chunk starts
DEFAULT_TILE = 1 << 16  # bitonic kv ceiling (ops/pallas_sort.MAX_N_KV)
MAX_WIDTH = 8

# Per-segment receive padding: <= ALIGN rows of start-phase + <= RCHUNK-1
# rows of chunk rounding + 1 for the partial tail row.
_SEG_SLACK_ROWS = RCHUNK + ALIGN + 1
# Per-group staging slack: chunk reads start <= ALIGN-1 rows before the
# group's first owned row and overread <= 2*RCHUNK rows past its last.
_STAGE_SLACK_ROWS = 3 * RCHUNK


def pick_tile(n_local: int) -> int:
    """Largest power-of-two group tile <= DEFAULT_TILE that divides
    ``n_local`` (n_local must carry a pow2 factor >= ALIGN*LANES)."""
    t = n_local & -n_local  # largest pow2 dividing n_local
    t = min(t, DEFAULT_TILE)
    if t < ALIGN * LANES:
        raise ValueError(
            f"n_local {n_local} needs a power-of-two factor >= "
            f"{ALIGN * LANES} for the overlapped exchange"
        )
    return t


def _group_hist(keys: jnp.ndarray, offset: int, width: int, tile: int):
    """(G, D) per-group digit counts — one fused broadcast-compare reduce
    (scatter-free; D <= 256 keeps it a few VPU ops per element)."""
    D = 1 << width
    digits = extract_digits(keys, offset, width).astype(jnp.uint8)
    g = digits.reshape(-1, tile)
    return jnp.sum(
        g[:, :, None] == jnp.arange(D, dtype=jnp.uint8)[None, None, :],
        axis=1,
        dtype=jnp.int32,
    )


def _xchg_overlap_kernel(
    # scalar prefetch
    src_row, n_chunks, dst_row, n_in, total_out, my_ref,
    # input (whole shard, HBM), outputs, scratch
    x_hbm, stage_ref, o_ref, ibuf, sbuf, copy_sem, send_sem, recv_sem,
    *, nchips: int, ngroups: int, tile: int, offset: int, width: int,
    stage_rows: int, interpret: bool, serial: bool,
):
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    my = my_ref[0]
    rows = tile // LANES

    # Entry barrier, first group only: no chip may begin remote writes
    # until every chip has entered this round's kernel (same invariant as
    # rdma_exchange._xchg_kernel).
    @pl.when(g == 0)
    def _barrier():
        barrier = pltpu.get_barrier_semaphore()
        for s in range(1, nchips):
            pltpu.semaphore_signal(
                barrier,
                1,
                device_id=lax.rem(my + jnp.int32(s), jnp.int32(nchips)),
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
        pltpu.semaphore_wait(barrier, nchips - 1)

    # --- fetch group g's tile into VMEM (explicit copy: ANY-space input
    # keeps the interpret path on the same machinery as rdma_exchange) ---
    fetch = pltpu.make_async_copy(
        x_hbm.at[pl.ds(g * rows, rows), :], ibuf, copy_sem
    )
    fetch.start()
    fetch.wait()

    # --- sort group g in VMEM: composite = digit * 2^16 + rank ----------
    keys = ibuf[...]
    mask = jnp.uint32((1 << width) - 1)
    digits = (keys >> jnp.uint32(offset)) & mask
    r = lax.broadcasted_iota(jnp.uint32, (rows, LANES), 0)
    c = lax.broadcasted_iota(jnp.uint32, (rows, LANES), 1)
    comp = digits * jnp.uint32(tile) + (r * jnp.uint32(LANES) + c)
    _, sorted_keys = _bitonic_body(tile, (comp, keys), interpret)
    sbuf[...] = sorted_keys

    # --- stage to HBM (sends DMA from HBM rows, not reused VMEM) --------
    cp = pltpu.make_async_copy(
        sbuf, stage_ref.at[pl.ds(g * stage_rows, rows), :], copy_sem
    )
    cp.start()
    cp.wait()

    # --- fire this group's remote chunks; do NOT wait -------------------
    for s in range(nchips):
        peer = lax.rem(my + jnp.int32(s), jnp.int32(nchips))
        base = g * nchips + peer

        def send_one(q, _, peer=peer, base=base):
            pltpu.make_async_remote_copy(
                stage_ref.at[
                    pl.ds(g * stage_rows + src_row[base] + q * RCHUNK,
                          RCHUNK),
                    :,
                ],
                o_ref.at[pl.ds(dst_row[base] + q * RCHUNK, RCHUNK), :],
                send_sem,
                recv_sem,
                device_id=peer,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            ).start()
            return _

        lax.fori_loop(0, n_chunks[base], send_one, 0)

    def wait_send(q, _):
        pltpu.make_async_remote_copy(
            stage_ref.at[pl.ds(0, RCHUNK), :],
            o_ref.at[pl.ds(0, RCHUNK), :],
            send_sem,
            recv_sem,
            device_id=my,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        ).wait_send()
        return _

    if serial:
        # Measurement mode: drain THIS group's sends before the next grid
        # step may sort — the strict sort->send serialization the overlap
        # design removes (probe: benchmarks/probe_overlap.py).
        tot_g = jnp.int32(0)
        for s in range(nchips):
            tot_g = tot_g + n_chunks[g * nchips + jnp.int32(s)]
        lax.fori_loop(0, tot_g, wait_send, 0)

    # --- last group: drain every send + wait out every receive ---------
    @pl.when(g == ngroups - 1)
    def _drain():
        if not serial:
            lax.fori_loop(0, total_out[0], wait_send, 0)

        def wait_recv(q, _):
            pltpu.make_async_remote_copy(
                stage_ref.at[pl.ds(0, RCHUNK), :],
                o_ref.at[pl.ds(0, RCHUNK), :],
                send_sem,
                recv_sem,
                device_id=my,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            ).wait_recv()
            return _

        lax.fori_loop(0, n_in[0], wait_recv, 0)


@functools.lru_cache(maxsize=None)
def _xchg_overlap_call(
    ngroups: int, tile: int, out_rows: int, nchips: int, offset: int,
    width: int, axis: str, interpret: bool, detect_races: bool = False,
    serial: bool = False,
):
    from jax.experimental.pallas import tpu as pltpu

    rows = tile // LANES
    stage_rows = rows + _STAGE_SLACK_ROWS
    kernel = functools.partial(
        _xchg_overlap_kernel,
        nchips=nchips,
        ngroups=ngroups,
        tile=tile,
        offset=offset,
        width=width,
        stage_rows=stage_rows,
        interpret=interpret,
        serial=serial,
    )
    shapes = [
        jax.ShapeDtypeStruct((ngroups * stage_rows, LANES), KEY_DTYPE),
        jax.ShapeDtypeStruct((out_rows, LANES), KEY_DTYPE),
    ]
    try:
        out_shape = [
            jax.ShapeDtypeStruct(s.shape, s.dtype, vma=frozenset({axis}))
            for s in shapes
        ]
    except TypeError:  # older jax without vma
        out_shape = shapes
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(ngroups,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((rows, LANES), KEY_DTYPE),
                pltpu.VMEM((rows, LANES), KEY_DTYPE),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=7
        ),
        interpret=pltpu.InterpretParams(detect_races=detect_races)
        if interpret else False,
    )


def exchange_round_rdma_overlapped(
    local_keys: jnp.ndarray,
    offset: int,
    width: int,
    axis: str,
    *,
    tile: int = DEFAULT_TILE,
    detect_races: bool = False,
    serial: bool = False,
):
    """One distributed digit round with the overlapped RDMA exchange
    (inside shard_map).  Returns (new_local_keys, overflowed=False).

    Requires ``width <= 8`` (see module docstring) and ``n_local`` a
    multiple of ``tile`` (a power of two >= 1024).  ``serial=True`` is a
    measurement mode that drains each group's sends before the next group
    sorts (strict sort->send serialization) — the overlap win is the
    measured gap between the two (benchmarks/probe_overlap.py)."""
    validate_digit_range(offset, width)
    if width > MAX_WIDTH:
        raise ValueError(
            f"rdma_overlap supports width <= {MAX_WIDTH}, got {width} "
            "(per-group histograms scale with 2^width)"
        )
    n_local = local_keys.shape[0]
    if tile & (tile - 1) or tile < ALIGN * LANES:
        raise ValueError(f"tile must be a power of two >= {ALIGN*LANES}")
    if n_local % tile:
        raise ValueError(
            f"n_local {n_local} must be a multiple of tile {tile}"
        )
    P_ = lax.axis_size(axis)
    my = lax.axis_index(axis)
    G = n_local // tile
    D = 1 << width

    from .exchange import _pos_dtype, _run_starts_global

    pos_t = _pos_dtype()
    counts_g = _group_hist(local_keys, offset, width, tile)  # (G, D)
    all_counts_g = lax.all_gather(counts_g, axis)  # (P, G, D)
    all_counts = jnp.sum(all_counts_g, axis=1)  # (P, D)
    S_all = _run_starts_global(all_counts).astype(pos_t)  # (P, D)
    gpre = (
        jnp.cumsum(all_counts_g, axis=1) - all_counts_g
    ).astype(pos_t)  # (P, G, D): within-(chip, digit) rank of group start
    S_pg = S_all[:, None, :] + gpre  # (P, G, D) global dest of run starts
    cg = all_counts_g.astype(pos_t)

    # below[b, i, g] = #elements of (chip i, group g) destined < bound b
    chip_bounds = jnp.arange(P_ + 1, dtype=pos_t) * pos_t(n_local)
    below = jax.vmap(
        lambda b: jnp.sum(jnp.clip(b - S_pg, 0, cg), axis=-1)
    )(chip_bounds)  # (P+1, P, G)
    M = jnp.transpose(
        (below[1:] - below[:-1]).astype(jnp.int32), (1, 2, 0)
    )  # (P_src, G, P_dst)

    # Chunk schedule, identical on every chip (derived from M alone).
    sb = jnp.cumsum(M, axis=2) - M  # (P, G, P) element start in src group
    row8 = sb // (ALIGN * LANES) * ALIGN  # 8-row-aligned chunk-window start
    phase = sb - row8 * LANES  # elements into the window (< ALIGN*LANES+)
    rows_needed = jnp.where(
        M > 0, (phase + M + LANES - 1) // LANES, 0
    )
    chunks = (rows_needed + RCHUNK - 1) // RCHUNK  # (P, G, P)
    padded_rows = chunks * RCHUNK
    # Receive layout: (src, group)-major segments per destination chip.
    flat_pad = padded_rows.reshape(P_ * G, P_)  # rows per (src*G+g, dst)
    dst_rows = (
        jnp.cumsum(flat_pad, axis=0) - flat_pad
    ).reshape(P_, G, P_)

    out_rows = n_local // LANES + _SEG_SLACK_ROWS * int(P_) * G
    x = local_keys.reshape(-1, LANES)

    buf_stage, buf = _xchg_overlap_call(
        G, tile, out_rows, int(P_), offset, width, axis,
        _interpret(), detect_races, serial,
    )(
        row8[my].reshape(-1).astype(jnp.int32),      # (G*P,)
        chunks[my].reshape(-1).astype(jnp.int32),    # (G*P,)
        dst_rows[my].reshape(-1).astype(jnp.int32),  # (G*P,)
        jnp.sum(chunks[:, :, my]).astype(jnp.int32)[None],
        jnp.sum(chunks[my]).astype(jnp.int32)[None],
        my.astype(jnp.int32)[None],
        x,
    )
    del buf_stage  # staging is kernel-internal; only the receive side matters

    # Reassembly: validity from the (src, group) segment table via one
    # searchsorted (P*G segments), then the stable digit sort.
    flat = buf.reshape(-1)
    npos = flat.shape[0]
    # Empty segments schedule zero chunks but still carry a junk start
    # phase; left as-is they break seg_start's monotonicity (searchsorted
    # precondition).  Zeroed, seg_start is provably ascending: a nonempty
    # segment's valid data ends within its padded chunk window, and empty
    # segments collapse to their (nondecreasing) window base.
    phase_my = jnp.where(M[:, :, my] > 0, phase[:, :, my], 0)
    seg_start = (
        dst_rows[:, :, my] * LANES + phase_my
    ).reshape(-1)  # (P*G,) ascending (cumsum layout)
    seg_len = M[:, :, my].reshape(-1)
    seg_end = seg_start + seg_len
    pos = jnp.arange(npos, dtype=jnp.int32)
    idx = (
        jnp.searchsorted(seg_start, pos, side="right").astype(jnp.int32) - 1
    )
    idx = jnp.clip(idx, 0, seg_start.shape[0] - 1)
    # pos >= seg_start[0] guards the junk phase rows BEFORE the first
    # segment's data (idx clips to 0 there and would pass the end check).
    valid = (pos < seg_end[idx]) & (pos >= seg_start[0])
    digits = extract_digits(flat, offset, width)
    digits = jnp.where(valid, digits, jnp.uint32(D))
    _, reassembled = lax.sort_key_val(digits, flat, is_stable=True)
    return reassembled[:n_local], jnp.bool_(False)
