"""Ragged bucket exchange over ICI via Pallas remote DMA (first-class).

The north-star exchange: after the local digit sort, each chip RDMAs its
per-peer slices DIRECTLY into the receivers' buffers at counts-derived
offsets — no capacity padding at all (the `lax.all_to_all` paths pay
(capacity - count) padded slots per pair; the two-pass overflow exchange
shrinks that to a static slot; this one transfers ceil-to-chunk bytes
only, i.e. < 2 KiB of slack per pair).

Mechanics (SPMD, inside shard_map; one Pallas program per chip):
  * the send plan and the receive plan are BOTH derived from the
    all-gathered (P, P) count matrix, so sender and receiver compute the
    identical chunk schedule — the receiver waits out its incoming chunks
    by reconstructing matching fixed-shape descriptors (the standard
    recreate-to-wait pattern), with no handshake traffic;
  * transfers are CHUNK_ROWS-row units at row-aligned boundaries (DMA row
    granularity); element raggedness is carried as per-source (phase,
    count) metadata and resolved by the receiver's stable reassembly sort,
    exactly like the collective exchanges (parallel/exchange.py);
  * receive layout is source-major with ascending in-source rank, so the
    stable digit sort restores (digit, src, rank) = global destination
    order.

Status: first-class option — ``sort_distributed(..., exchange="rdma")``
runs the full LSD loop through this exchange, validated exactly on the
virtual mesh via the Mosaic interpreter (pltpu.InterpretParams, which
emulates one-sided remote DMAs + semaphores with per-device threads; the
production chip here is single-device, so multi-chip ICI cannot execute
for real).  The collective exchanges remain the default pending hardware
measurement.  Mirrors the role of the reference's storage-mediated
repartition (distrib.go:119-158) with zero intermediate storage.  Caveat:
run under shard_map with ``check_vma=False`` — interpret-mode pallas drops
varying-axis metadata on scalar-prefetch operands
(build_distributed_sort does this automatically for exchange="rdma").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from ..ops.bits import KEY_DTYPE, extract_digits
from ..ops.boundaries import digit_counts_sorted
from ..ops.radix_sort import sort_by_digits
from ..ops.pallas_sort import LANES, _interpret

RCHUNK = 16  # default rows per RDMA chunk (2048 keys)


def _out_rows(n_local: int, nchips: int, rchunk: int = RCHUNK) -> int:
    """Static receive-buffer rows: everyone's data + per-source chunk
    rounding (phase row + ceil-to-rchunk)."""
    return n_local // LANES + (rchunk + 1) * nchips


def _xchg_kernel(
    src_row, n_chunks_out, dst_row, n_in, my_ref,  # scalar prefetch
    x_hbm, o_ref, send_sem, recv_sem, *, nchips: int, rchunk: int,
):
    from jax.experimental.pallas import tpu as pltpu

    my = my_ref[0]

    # Entry barrier (uses the kernel's collective_id): no chip may begin
    # remote writes until every chip has entered this round's kernel.
    # Without it, a fast chip's round-k+1 chunks could signal a slow
    # peer's recv semaphore while it is still draining round k, making it
    # exit wait_recv early and read not-yet-written rows.
    barrier = pltpu.get_barrier_semaphore()
    for s in range(1, nchips):
        pltpu.semaphore_signal(
            barrier,
            1,
            device_id=lax.rem(my + jnp.int32(s), jnp.int32(nchips)),
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
    pltpu.semaphore_wait(barrier, nchips - 1)

    # Issue every outgoing chunk, spread over peers starting at my+1.
    for s in range(nchips):
        c = lax.rem(my + jnp.int32(s), jnp.int32(nchips))

        def send_one(q, _, c=c):
            pltpu.make_async_remote_copy(
                x_hbm.at[pl.ds(src_row[c] + q * rchunk, rchunk), :],
                o_ref.at[pl.ds(dst_row[c] + q * rchunk, rchunk), :],
                send_sem,
                recv_sem,
                device_id=c,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            ).start()
            return _

        lax.fori_loop(0, n_chunks_out[c], send_one, 0)

    # Drain send completions (one fixed-shape descriptor per chunk).
    total_out = jnp.int32(0)
    for s in range(nchips):
        total_out = total_out + n_chunks_out[s]

    def wait_send(q, _):
        pltpu.make_async_remote_copy(
            x_hbm.at[pl.ds(0, rchunk), :],
            o_ref.at[pl.ds(0, rchunk), :],
            send_sem,
            recv_sem,
            device_id=my,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        ).wait_send()
        return _

    lax.fori_loop(0, total_out, wait_send, 0)

    # Wait for every incoming chunk (count known from the count matrix).
    def wait_recv(q, _):
        pltpu.make_async_remote_copy(
            x_hbm.at[pl.ds(0, rchunk), :],
            o_ref.at[pl.ds(0, rchunk), :],
            send_sem,
            recv_sem,
            device_id=my,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        ).wait_recv()
        return _

    lax.fori_loop(0, n_in[0], wait_recv, 0)


@functools.lru_cache(maxsize=None)
def _xchg_call(src_rows_total: int, out_rows: int, nchips: int,
               axis: str, interpret: bool, detect_races: bool = False,
               rchunk: int = RCHUNK):
    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(_xchg_kernel, nchips=nchips, rchunk=rchunk)
    # the output varies across the exchange axis (vma needed when invoked
    # under shard_map with varying-mesh-axes checking on)
    try:
        out_shape = jax.ShapeDtypeStruct(
            (out_rows, LANES), KEY_DTYPE, vma=frozenset({axis})
        )
    except TypeError:  # older jax without vma
        out_shape = jax.ShapeDtypeStruct((out_rows, LANES), KEY_DTYPE)
    # On the virtual CPU mesh use the Mosaic TPU interpret machinery
    # (pltpu.InterpretParams), not the generic pallas interpreter: it
    # emulates one-sided remote DMAs + semaphores with per-device threads,
    # so data-dependent chunk schedules (asymmetric per-device send/wait
    # counts) execute without the lock-step collective lowering that
    # deadlocks the generic interpreter on skewed schedules.
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
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


def exchange_round_rdma(
    local_keys: jnp.ndarray,
    offset: int,
    width: int,
    axis: str,
    *,
    strategy: str | None = None,
    detect_races: bool = False,
    rchunk: int = RCHUNK,
):
    """One distributed digit round with the ragged RDMA exchange (inside
    shard_map).  Returns (new_local_keys, overflowed=False) — raggedness
    means there is no capacity to overflow.

    ``detect_races=True`` (virtual mesh only) runs the kernel under the
    Mosaic interpreter's vector-clock race detector — a checked proof that
    the counts-derived receive layout is write-disjoint across senders
    (the exchange's core safety invariant).  Goes beyond the reference,
    whose concurrency safety is by construction only (SURVEY §5)."""
    sorted_local = sort_by_digits(local_keys, offset, width, strategy=strategy)
    tags, flat, overflowed = exchange_round_rdma_raw(
        sorted_local, offset, width, axis,
        detect_races=detect_races, rchunk=rchunk,
    )
    _, reassembled = lax.sort_key_val(tags, flat, is_stable=True)
    return reassembled[: local_keys.shape[0]], overflowed


def exchange_round_rdma_raw(
    sorted_local: jnp.ndarray,
    offset: int,
    width: int,
    axis: str,
    *,
    detect_races: bool = False,
    rchunk: int = RCHUNK,
):
    """The RDMA exchange WITHOUT the reassembly sort: takes an already
    digit-sorted shard, returns ``(tags, flat, overflowed)`` — ``flat``
    the flattened receive buffer, ``tags`` its per-element digit with
    sentinel ``D`` on slack slots (same contract as
    exchange.exchange_round_alltoall_raw; consumed by the fused LSD loop
    in distributed.build_distributed_sort)."""
    n_local = sorted_local.shape[0]
    if n_local % LANES:
        raise ValueError(f"n_local {n_local} must be a multiple of {LANES}")
    if rchunk % 8 or rchunk <= 0:
        raise ValueError(f"rchunk must be a positive multiple of 8, got {rchunk}")
    P_ = lax.axis_size(axis)
    my = lax.axis_index(axis)
    D = 1 << width

    counts = digit_counts_sorted(sorted_local, offset, width)  # (D,)

    all_counts = lax.all_gather(counts, axis)  # (P, D)
    # destination chip of each element is monotone along the sorted shard
    # (see exchange.py); per-(src, dst) element counts:
    from .exchange import _pos_dtype, _run_starts_global, _slice_counts

    S_all = _run_starts_global(all_counts)  # (P, D)
    pos_t = _pos_dtype()
    chip_bounds = (
        jnp.arange(P_ + 1, dtype=pos_t)[:, None] * pos_t(n_local)
    )  # (P+1, 1) destination-range bounds
    below = jax.vmap(
        lambda b: jax.vmap(
            lambda S_i, c_i: _slice_counts(S_i, c_i, b[0])
        )(S_all, all_counts)
    )(chip_bounds)  # (P+1, P): [c, i] = #elements of src i destined < c*n
    M = (below[1:] - below[:-1]).astype(jnp.int32).T  # (P_src, P_dst)

    # Chunk schedule, identical on every chip (derived from M alone).
    sb = jnp.cumsum(M, axis=1) - M  # (P, P) element start in src's shard
    phase = sb % LANES
    row0 = sb // LANES
    # Empty (src, dst) pairs schedule zero chunks even when their start
    # phase is lane-misaligned (phase > 0 with M == 0 would otherwise
    # round up to a junk chunk per pair — ~P^2 wasted 8 KiB transfers
    # under skew).
    rows_needed = jnp.where(M > 0, (phase + M + LANES - 1) // LANES, 0)
    chunks = (rows_needed + rchunk - 1) // rchunk  # (P, P)
    padded_rows = chunks * rchunk
    dst_rows = jnp.cumsum(padded_rows, axis=0) - padded_rows  # (P, P) [i, c]

    out_rows = _out_rows(n_local, int(P_), rchunk)
    x = jnp.concatenate(
        [
            sorted_local.reshape(-1, LANES),
            jnp.zeros((rchunk, LANES), KEY_DTYPE),  # chunk overread slack
        ]
    )
    buf = _xchg_call(
        x.shape[0], out_rows, int(P_), axis, _interpret(), detect_races,
        rchunk,
    )(
        row0[my].astype(jnp.int32),
        chunks[my].astype(jnp.int32),
        dst_rows[my].astype(jnp.int32),
        jnp.sum(chunks[:, my]).astype(jnp.int32)[None],
        my.astype(jnp.int32)[None],
        x,
    )

    # Validity mask per source segment (broadcast compare over the P
    # sources — scatter/gather-free); the stable digit sort over (tags,
    # flat) is the reassembly, done by the caller or fused downstream.
    flat = buf.reshape(-1)
    pos = jnp.arange(flat.shape[0], dtype=jnp.int32)
    seg_start = dst_rows[:, my] * LANES + phase[:, my]  # (P,)
    seg_end = seg_start + M[:, my]
    valid = jnp.any(
        (pos[None, :] >= seg_start[:, None])
        & (pos[None, :] < seg_end[:, None]),
        axis=0,
    )
    digits = extract_digits(flat, offset, width)
    tags = jnp.where(valid, digits, jnp.uint32(D))
    return tags, flat, jnp.bool_(False)
