"""Bucket exchange: the all-to-all shuffle of one distributed radix round.

TPU-native re-design of the reference's storage-mediated repartition (the
STRIDED BucketReader merge + byte-balanced PartRef split,
benchmark/pkg/sort/helpers.go:67-121 and distrib.go:119-158): bucket
metadata is exchanged as a small device all-gather and the key payload
moves over ICI collectives — never through a filesystem, never as JSON.

Core insight exploited throughout: after a *stable local* digit sort, each
element's exact global destination index

    g = base[d] + off[my, d] + r

(base = global exclusive scan of digit totals, off = exclusive scan of the
digit's counts over chips, r = rank within this chip's digit run) is
*strictly increasing* along the locally sorted shard.  Consequently the
elements each peer needs form one contiguous slice of the local shard, the
exchange is a slice-wise all-to-all, and the receiver can reconstruct exact
order with a stable digit sort — no scatter anywhere.

Two strategies:
  * ``alltoall`` — capacity-bounded `lax.all_to_all` (static shapes; the
    capacity factor plays the role MoE capacity plays — sampled-splitter
    balancing keeps it small on skewed data).  Overflow is detected and
    reported, never silent.
  * ``gather``   — all-gather the whole round (exact for any distribution,
    O(n_global) per-chip memory); used for small inputs and as a test
    oracle for the alltoall path.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.bits import KEY_DTYPE, extract_digits
from ..ops.boundaries import digit_counts_sorted
from ..ops.radix_sort import sort_by_digits

# numpy scalar, NOT jnp: a module-scope jax array would initialize the
# backend at import (see ops/pallas_sort.PAD).
PAD_KEY = np.uint32(0xFFFFFFFF)


def _pos_dtype():
    """Destination-index dtype: int64 under jax_enable_x64 (needed for
    n_global >= 2^31, enforced by the host wrapper), else int32."""
    return jnp.int64 if jax.config.jax_enable_x64 else jnp.int32


def send_windows(padded, starts, capacity: int):
    """Per-peer send buffer: row c = ``padded[starts[c] : starts[c]+capacity]``
    (trailing axes carried whole).  Returns (P, capacity, *trailing).

    Expressed as ``lax.map`` (a scan) rather than an unrolled Python loop of
    P dynamic slices so HLO size and compile time are P-independent — the
    unrolled form bloats programs at pod scale (P=64-256).  Callers
    guarantee ``starts[c] + capacity <= padded.shape[0]`` (tail padding).
    """
    trailing = padded.shape[1:]

    def one(b):
        return lax.dynamic_slice(
            padded, (b,) + (0,) * len(trailing), (capacity,) + trailing
        )

    return lax.map(one, starts.astype(jnp.int32))


def default_capacity(n_local: int, nchips: int, capacity_factor: float) -> int:
    """Per-peer slot capacity for the padded all-to-all."""
    if nchips == 1:
        return n_local
    even = -(-n_local // nchips)
    cap = int(even * capacity_factor) + 64
    return min(n_local, cap)


def _round_metadata(local_keys, offset, width, axis, strategy):
    """Counts-first prologue shared by every collective exchange: local
    stable digit sort, all-gathered count matrix, and the metadata-derived
    (send_bounds, send_count, recv_count) — destinations are monotone
    along the digit-sorted shard, so per-peer slices are windows."""
    sorted_local = sort_by_digits(local_keys, offset, width, strategy=strategy)
    return _round_metadata_sorted(sorted_local, offset, width, axis)


def _round_metadata_sorted(sorted_local, offset, width, axis):
    """_round_metadata for an ALREADY digit-sorted shard (the fused round
    loop sorts by composite key before calling the exchange — see
    distributed.build_distributed_sort)."""
    n_local = sorted_local.shape[0]
    P_ = lax.axis_size(axis)
    my = lax.axis_index(axis)
    pos_t = _pos_dtype()

    counts = digit_counts_sorted(sorted_local, offset, width)  # (D,) int32

    all_counts = lax.all_gather(counts, axis)  # (P, D)
    S_all = _run_starts_global(all_counts)  # (P, D) global run starts
    S_my = S_all[my]

    # Send slice boundaries: first local index destined to chip c.
    chip_bounds = jnp.arange(P_ + 1, dtype=pos_t) * pos_t(n_local)
    send_bounds = jax.vmap(
        lambda b: _slice_counts(S_my, counts, b)
    )(chip_bounds)  # (P+1,)
    send_count = send_bounds[1:] - send_bounds[:-1]

    # Valid counts per received chunk, from metadata alone:
    # recv_count[i] = |{elements of chip i with dest in my range}|.
    lo = pos_t(n_local) * my.astype(pos_t)
    hi = lo + pos_t(n_local)
    recv_count = jax.vmap(
        lambda S_i, c_i: _slice_counts(S_i, c_i, hi)
        - _slice_counts(S_i, c_i, lo)
    )(S_all, all_counts)  # (P,)
    return sorted_local, send_bounds, send_count, recv_count


def _run_starts_global(all_counts: jnp.ndarray):
    """S[i, d] = global destination index of chip i's first element with
    digit d, given all_counts (P, D) in chip order.  (P, D) metadata math."""
    counts = all_counts.astype(_pos_dtype())
    totals = counts.sum(axis=0)  # (D,)
    base = jnp.cumsum(totals) - totals  # global digit starts
    off_chips = jnp.cumsum(counts, axis=0) - counts  # exclusive over chips
    return base[None, :] + off_chips  # (P, D)


def _slice_counts(S: jnp.ndarray, counts: jnp.ndarray, bound):
    """Number of elements with destination < bound, per digit run:
    sum_d clip(bound - S[d], 0, counts[d]).  Closed form — avoids
    materializing per-element destination indices."""
    return jnp.sum(
        jnp.clip(bound - S, 0, counts.astype(_pos_dtype()))
    ).astype(jnp.int32)


def exchange_round_alltoall(
    local_keys: jnp.ndarray,
    offset: int,
    width: int,
    axis: str,
    capacity: int,
    *,
    strategy: str | None = None,
):
    """One distributed digit round over mesh axis ``axis`` (inside
    shard_map).  Returns (new_local_keys, overflowed: bool scalar).

    Entirely scatter/gather-free on the per-element path (XLA
    gather/scatter run at ~100M elem/s on TPU — docs/PERF_NOTES.md):
    metadata is (P, D) closed-form math, send buffers are P dynamic
    slices, reassembly is one stable kv-sort.  Requires n_global < 2^31
    unless jax_enable_x64 is set.
    """
    sorted_local = sort_by_digits(local_keys, offset, width, strategy=strategy)
    tags, flat, overflowed = exchange_round_alltoall_raw(
        sorted_local, offset, width, axis, capacity
    )
    _, reassembled = lax.sort_key_val(tags, flat, is_stable=True)
    return reassembled[: local_keys.shape[0]], overflowed


def exchange_round_alltoall_raw(
    sorted_local: jnp.ndarray,
    offset: int,
    width: int,
    axis: str,
    capacity: int,
):
    """The all-to-all exchange WITHOUT the reassembly sort: takes an
    already digit-sorted shard, returns ``(tags, flat, overflowed)`` where
    ``flat`` is the flattened (src-major) receive buffer and ``tags`` its
    per-element digit with sentinel ``D`` on padding slots.  A stable sort
    of (tags, flat) is the round's stable reassembly (the unfused loop);
    the default fused loop never reassembles — it sorts the receive buffer
    directly by the NEXT round's rotated key value, using ``tags`` only to
    mask padding slots (distributed._fused_sort_shard)."""
    n_local = sorted_local.shape[0]
    P_ = lax.axis_size(axis)
    D = 1 << width

    _, send_bounds, send_count, recv_count = _round_metadata_sorted(
        sorted_local, offset, width, axis
    )
    overflowed = jnp.any(send_count > capacity)

    # (P, capacity) send buffer: one windowed slice per destination chip.
    # Pad the shard tail so fixed-size slices never run out of bounds.
    padded = jnp.concatenate(
        [sorted_local, jnp.full((capacity,), PAD_KEY, KEY_DTYPE)]
    )
    send_keys = send_windows(padded, send_bounds[:-1], capacity)  # (P, C)

    recv_keys = lax.all_to_all(send_keys, axis, 0, 0, tiled=False)

    # Receive order is (src chip, run order) = (i, (d, r)); a stable sort
    # by digit yields (d, i, r) — global destination order restricted to
    # my range.  Padding gets sentinel digit D, sorts last; valid total ==
    # n_local by construction.
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (P_, capacity), 1)
    valid = k_iota < recv_count[:, None]
    recv_digits = extract_digits(recv_keys, offset, width)
    recv_digits = jnp.where(valid, recv_digits, jnp.uint32(D))
    return recv_digits.reshape(-1), recv_keys.reshape(-1), overflowed


def overflow_capacities(n_local: int, nchips: int, ov_frac: float = 0.25):
    """(C0, C_ov) for the two-pass exchange: C0 is the EVEN share (factor
    1.0) and C_ov a small static overflow slot."""
    if nchips == 1:
        return n_local, 64
    even = -(-n_local // nchips)
    c_ov = min(n_local, max(64, int(even * ov_frac)))
    return min(n_local, even), c_ov


def exchange_round_alltoall_overflow(
    local_keys: jnp.ndarray,
    offset: int,
    width: int,
    axis: str,
    capacity0: int,
    capacity_ov: int,
    *,
    strategy: str | None = None,
):
    """Two-pass near-ragged exchange: a main all-to-all at the EVEN share
    (capacity factor 1.0 — zero headroom) plus a small overflow all-to-all
    carrying only each peer-pair's excess.

    Padding waste drops from ``(cf - 1) * n`` per round (the single-pass
    capacity-factor headroom paid on EVERY transfer) to the static overflow
    slot ``P * C_ov``, which rides a second collective only.  Counts-first
    metadata is identical to the single-pass exchange; like it, a pair
    exceeding C0 + C_ov is reported as overflow, never silent (north-star
    "ragged all-to-all": the true Pallas ICI-RDMA ragged transfer is the
    remaining step — docs/PERF_NOTES.md).
    """
    sorted_local = sort_by_digits(local_keys, offset, width, strategy=strategy)
    tags, flat, overflowed = exchange_round_alltoall_overflow_raw(
        sorted_local, offset, width, axis, capacity0, capacity_ov
    )
    _, reassembled = lax.sort_key_val(tags, flat, is_stable=True)
    return reassembled[: local_keys.shape[0]], overflowed


def exchange_round_alltoall_overflow_raw(
    sorted_local: jnp.ndarray,
    offset: int,
    width: int,
    axis: str,
    capacity0: int,
    capacity_ov: int,
):
    """Two-pass exchange without the reassembly sort (see
    :func:`exchange_round_alltoall_raw` for the contract)."""
    n_local = sorted_local.shape[0]
    P_ = lax.axis_size(axis)
    D = 1 << width

    _, send_bounds, send_count, recv_count = _round_metadata_sorted(
        sorted_local, offset, width, axis
    )
    send1 = jnp.minimum(send_count, capacity0)
    send2 = send_count - send1
    overflowed = jnp.any(send2 > capacity_ov)

    pad_len = capacity0 + capacity_ov
    padded = jnp.concatenate(
        [sorted_local, jnp.full((pad_len,), PAD_KEY, KEY_DTYPE)]
    )
    send_main = send_windows(padded, send_bounds[:-1], capacity0)
    send_over = send_windows(padded, send_bounds[:-1] + send1, capacity_ov)

    recv_main = lax.all_to_all(send_main, axis, 0, 0, tiled=False)
    recv_over = lax.all_to_all(send_over, axis, 0, 0, tiled=False)

    recv1 = jnp.minimum(recv_count, capacity0)
    recv2 = recv_count - recv1

    # Per-source-contiguous layout (main chunk then its overflow chunk)
    # keeps receive order (src, rank); the stable digit sort then restores
    # (digit, src, rank) = global destination order, as in the single pass.
    k1 = jax.lax.broadcasted_iota(jnp.int32, (P_, capacity0), 1)
    k2 = jax.lax.broadcasted_iota(jnp.int32, (P_, capacity_ov), 1)
    valid = jnp.concatenate(
        [k1 < recv1[:, None], k2 < recv2[:, None]], axis=1
    )
    recv_keys = jnp.concatenate([recv_main, recv_over], axis=1)
    recv_digits = extract_digits(recv_keys, offset, width)
    recv_digits = jnp.where(valid, recv_digits, jnp.uint32(D))
    return recv_digits.reshape(-1), recv_keys.reshape(-1), overflowed


def exchange_round_gather(
    local_keys: jnp.ndarray,
    offset: int,
    width: int,
    axis: str,
    *,
    strategy: str | None = None,
):
    """Exact all-gather exchange: globally digit-sort the gathered round and
    keep this chip's slice.  O(n_global) per-chip memory."""
    n_local = local_keys.shape[0]
    my = lax.axis_index(axis)
    gathered = lax.all_gather(local_keys, axis)  # (P, n_local), chip order
    full = gathered.reshape(-1)
    full_sorted = sort_by_digits(full, offset, width, strategy=strategy)
    out = lax.dynamic_slice_in_dim(full_sorted, my * n_local, n_local)
    return out, jnp.bool_(False)
