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

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.bits import KEY_DTYPE, digit_mask, extract_digits
from ..ops.boundaries import digit_counts
from ..ops.radix_sort import sort_by_digits

PAD_KEY = jnp.uint32(0xFFFFFFFF)


def _pos_dtype():
    """Destination-index dtype: int64 under jax_enable_x64 (needed for
    n_global >= 2^31, enforced by the host wrapper), else int32."""
    return jnp.int64 if jax.config.jax_enable_x64 else jnp.int32


def default_capacity(n_local: int, nchips: int, capacity_factor: float) -> int:
    """Per-peer slot capacity for the padded all-to-all."""
    if nchips == 1:
        return n_local
    even = -(-n_local // nchips)
    cap = int(even * capacity_factor) + 64
    return min(n_local, cap)


def _destination_meta(all_counts: jnp.ndarray, my: jnp.ndarray, n_local: int):
    """Per-digit global start positions for this chip's runs.

    all_counts: (P, D) int32 per-chip digit counts (chip order = global
    linear order of shards).  Returns s where s[d] = global destination
    index of this chip's first element with digit d.
    """
    counts64 = all_counts.astype(_pos_dtype())
    totals = counts64.sum(axis=0)  # (D,)
    base = jnp.cumsum(totals) - totals  # exclusive scan: global digit starts
    off_chips = jnp.cumsum(counts64, axis=0) - counts64  # (P, D) excl. over chips
    my_off = off_chips[my]  # (D,)
    return base + my_off


def _local_ranks(digits: jnp.ndarray, width: int) -> jnp.ndarray:
    """r[e] = rank of element e within its digit run, for digit-sorted
    input: e - start_of_run = e - excl_cumsum(counts)[digit[e]]."""
    d_counts = jnp.bincount(digits, length=1 << width)
    starts = jnp.cumsum(d_counts) - d_counts
    idx = jnp.arange(digits.shape[0], dtype=jnp.int32)
    return idx - starts[digits].astype(jnp.int32)


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
    Requires n_global < 2^31 unless jax_enable_x64 is set (destination
    indices are computed in int64)."""
    n_local = local_keys.shape[0]
    P_ = lax.axis_size(axis)
    my = lax.axis_index(axis)

    counts = digit_counts(local_keys, offset, width)  # (D,) int32
    sorted_local = sort_by_digits(local_keys, offset, width, strategy=strategy)
    digits = extract_digits(sorted_local, offset, width)

    all_counts = lax.all_gather(counts, axis)  # (P, D)
    pos_t = _pos_dtype()
    s_d = _destination_meta(all_counts, my, n_local)  # (D,)
    r = _local_ranks(digits, width)  # (n,) int32
    g = s_d[digits] + r.astype(pos_t)  # strictly increasing

    # Send slice boundaries: first local index destined to chip c.
    chip_starts = jnp.arange(P_ + 1, dtype=pos_t) * pos_t(n_local)
    send_start = jnp.searchsorted(g, chip_starts[:-1], side="left").astype(
        jnp.int32
    )
    send_end = jnp.searchsorted(g, chip_starts[1:], side="left").astype(jnp.int32)
    send_count = send_end - send_start
    overflowed = jnp.any(send_count > capacity)

    # Build (P, capacity) send buffer by slicing the locally sorted shard.
    k = jax.lax.broadcasted_iota(jnp.int32, (P_, capacity), 1)
    src_idx = jnp.minimum(send_start[:, None] + k, n_local - 1)
    valid = k < send_count[:, None]
    send_keys = jnp.where(valid, sorted_local[src_idx], PAD_KEY)
    # Padding carries digit sentinel D so it sorts after all real digits.
    send_digits = jnp.where(
        valid, digits[src_idx], jnp.uint32(1 << width)
    )

    recv_keys = lax.all_to_all(send_keys, axis, 0, 0, tiled=False)
    recv_digits = lax.all_to_all(send_digits, axis, 0, 0, tiled=False)

    # Reassembly: receive order is (src chip, local order) = (i, (d, r));
    # a stable sort by digit yields (d, i, r) — exactly global destination
    # order restricted to my range.  Valid count == n_local by construction.
    flat_digits = recv_digits.reshape(-1)
    flat_keys = recv_keys.reshape(-1)
    _, reassembled = lax.sort_key_val(flat_digits, flat_keys, is_stable=True)
    return reassembled[:n_local], overflowed


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
