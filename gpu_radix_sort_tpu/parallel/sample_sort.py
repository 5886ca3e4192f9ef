"""Distributed sample sort (PSRS) — the performance-mode distributed sort.

The reference's distributed algorithm is LSD radix with 32/width bulk-
synchronous rounds (benchmark/pkg/sort/distrib.go:109); each round costs a
full local sort plus a full-data exchange.  On TPU the local sort dominates
(XLA sort is comparison-based, so digit width doesn't reduce its cost —
docs/PERF_NOTES.md), which makes Parallel Sorting by Regular Sampling the
right architecture: ONE local sort, ONE splitter-partitioned all-to-all,
ONE local merge — ~4x less sort work than the width-8 LSD structure, with
sampled splitters bounding partition skew (the BASELINE.json requirement).

Phases (inside shard_map over mesh axis "x"):
  1. local full sort;
  2. regular sampling: P local quantiles, all-gathered, re-sorted; global
     quantiles of the P*P candidates become the P-1 splitters (classic PSRS
     guarantee: no partition exceeds ~2 n/P for distinct keys);
  3. splitter boundaries via searchsorted on the sorted shard -> P
     contiguous slices; capacity-bounded all_to_all (overflow detected,
     never silent — duplicates concentrated on one splitter can exceed any
     fixed capacity, callers fall back to the exact gather exchange);
  4. reassembly: sort of the received padded buffer (pads carry the max
     key and are truncated by the valid count).

Output shards are ragged (counts returned per chip); the host wrapper
linearizes exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.bits import KEY_DTYPE
from .exchange import PAD_KEY, send_windows
from .mesh import KEY_AXIS, key_mesh

# Payload lanes narrower than this ride XLA sorts as extra operands (fast
# row movement); wider payloads use permutation gathers — sort compile time
# grows steeply with operand count (16 lanes measured at 5+ min).
from ..ops.radix_sort import MAX_SORT_LANES  # single source of truth


# Capacity of one (src chip -> dst chip) transfer slot — same policy as
# the LSD exchange; one implementation so headroom changes can't drift.
from .exchange import default_capacity as default_pair_capacity


def _sample_sort_shard(local_keys, *, axis, capacity):
    P_ = lax.axis_size(axis)
    my = lax.axis_index(axis)
    n = local_keys.shape[0]

    s = jnp.sort(local_keys.astype(KEY_DTYPE))

    # Regular sampling: P evenly spaced local quantiles.
    stride = max(n // P_, 1)
    sample_pos = jnp.arange(P_, dtype=jnp.int32) * stride
    samples = s[sample_pos]  # (P,)
    cand = jnp.sort(lax.all_gather(samples, axis).reshape(-1))  # (P*P,)
    splitters = cand[jnp.arange(1, P_, dtype=jnp.int32) * P_]  # (P-1,)

    bounds = jnp.searchsorted(s, splitters, side="left").astype(jnp.int32)
    send_bounds = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), bounds, jnp.full(1, n, jnp.int32)]
    )  # (P+1,)
    send_count = send_bounds[1:] - send_bounds[:-1]
    overflowed = jnp.any(send_count > capacity)

    padded = jnp.concatenate([s, jnp.full((capacity,), PAD_KEY, KEY_DTYPE)])
    # (P, C) — rows unmasked; receiver masks by exact counts.
    send_keys = send_windows(padded, send_bounds[:-1], capacity)

    counts_mat = lax.all_gather(send_count, axis)  # (P, P): [i, c] = i -> c
    recv_count = counts_mat[:, my]  # (P,)

    recv = lax.all_to_all(send_keys, axis, 0, 0, tiled=False)
    k_iota = lax.broadcasted_iota(jnp.int32, (P_, capacity), 1)
    masked = jnp.where(k_iota < recv_count[:, None], recv, PAD_KEY)
    merged = jnp.sort(masked.reshape(-1))  # pads (max key) sort last
    total = recv_count.sum().astype(jnp.int32)
    return merged, total[None], lax.psum(overflowed.astype(jnp.int32), axis)


def build_sample_sort(
    mesh,
    n_local: int,
    *,
    capacity_factor: float = 1.5,
    axis: str = KEY_AXIS,
):
    """Compile-ready distributed sample sort over ``axis``.

    Returns ``fn(keys) -> (padded_shards, shard_counts, overflow)`` where
    keys has global shape (P*n_local,) sharded over ``axis``; padded_shards
    has global shape (P * P * C,) (per-chip sorted buffer incl. padding),
    shard_counts (P,) gives each chip's valid prefix length.
    """
    nchips = mesh.shape[axis]
    capacity = default_pair_capacity(n_local, nchips, capacity_factor)

    fn = shard_map(
        lambda k: _sample_sort_shard(k, axis=axis, capacity=capacity),
        mesh=mesh,
        in_specs=P(axis),
        out_specs=(P(axis), P(axis), P()),
    )
    return jax.jit(fn), capacity


def _sample_sort_kv_shard(local_keys, local_vals, *, axis, capacity):
    """PSRS with payload rows riding the exchange.

    ``local_vals``: (n, W) uint32 lanes (the host wrapper packs arbitrary
    fixed-size byte payloads into lanes).  Stability: ties broken by
    (source chip, original local index), i.e. global input order — matching
    a stable single-chip kv sort of the linearized input.
    """
    P_ = lax.axis_size(axis)
    my = lax.axis_index(axis)
    n = local_keys.shape[0]
    W = local_vals.shape[1]

    # Narrow payloads ride the sort as extra operands (XLA sort moves rows
    # at multi-G/s; a permutation gather runs at ~100M elem/s).  Wide
    # payloads fall back to the gather: compile time grows steeply with
    # sort operand count (measured: 16 lanes -> 5+ min compiles).
    if 0 < W <= MAX_SORT_LANES:
        lanes = tuple(local_vals[:, w] for w in range(W))
        sorted_ops = lax.sort(
            (local_keys.astype(KEY_DTYPE), *lanes), num_keys=1, is_stable=True
        )
        s = sorted_ops[0]
        vals_s = jnp.stack(sorted_ops[1:], axis=1)
    else:
        idx = jnp.arange(n, dtype=jnp.uint32)
        s, order = lax.sort_key_val(
            local_keys.astype(KEY_DTYPE), idx, is_stable=True
        )
        vals_s = jnp.take(local_vals, order, axis=0)

    stride = max(n // P_, 1)
    sample_pos = jnp.arange(P_, dtype=jnp.int32) * stride
    samples = s[sample_pos]
    cand = jnp.sort(lax.all_gather(samples, axis).reshape(-1))
    splitters = cand[jnp.arange(1, P_, dtype=jnp.int32) * P_]

    bounds = jnp.searchsorted(s, splitters, side="left").astype(jnp.int32)
    send_bounds = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), bounds, jnp.full(1, n, jnp.int32)]
    )
    send_count = send_bounds[1:] - send_bounds[:-1]
    overflowed = jnp.any(send_count > capacity)

    padded_k = jnp.concatenate([s, jnp.full((capacity,), PAD_KEY, KEY_DTYPE)])
    padded_v = jnp.concatenate(
        [vals_s, jnp.zeros((capacity, W), jnp.uint32)], axis=0
    )
    send_keys = send_windows(padded_k, send_bounds[:-1], capacity)  # (P, C)
    send_vals = send_windows(padded_v, send_bounds[:-1], capacity)  # (P, C, W)

    counts_mat = lax.all_gather(send_count, axis)
    recv_count = counts_mat[:, my]

    recv_k = lax.all_to_all(send_keys, axis, 0, 0, tiled=False)
    recv_v = lax.all_to_all(send_vals, axis, 0, 0, tiled=False)

    # Reassembly: receive order is (src chip, local rank); a stable sort by
    # key therefore breaks ties by global input order.  Invalid slots must
    # sort after ALL valid rows — a real 0xFFFFFFFF key from a later chip
    # would otherwise tie with an earlier chip's padding and lose its
    # payload to truncation — so validity is a second sort key, not a
    # sentinel on the first.
    k_iota = lax.broadcasted_iota(jnp.int32, (P_, capacity), 1)
    invalid = (k_iota >= recv_count[:, None]).astype(jnp.uint32)
    keys_masked = jnp.where(invalid.astype(bool), PAD_KEY, recv_k)
    recv_rows = recv_v.reshape(P_ * capacity, W)
    if 0 < W <= MAX_SORT_LANES:
        recv_lanes = tuple(recv_rows[:, w] for w in range(W))
        merged = lax.sort(
            (keys_masked.reshape(-1), invalid.reshape(-1), *recv_lanes),
            num_keys=2,
            is_stable=True,
        )
        merged_k = merged[0]
        merged_v = jnp.stack(merged[2:], axis=1)
    else:
        flat_idx = jnp.arange(P_ * capacity, dtype=jnp.uint32)
        merged_k, _, perm = lax.sort(
            (keys_masked.reshape(-1), invalid.reshape(-1), flat_idx),
            num_keys=2,
            is_stable=True,
        )
        merged_v = jnp.take(recv_rows, perm, axis=0)
    total = recv_count.sum().astype(jnp.int32)
    return merged_k, merged_v, total[None], lax.psum(
        overflowed.astype(jnp.int32), axis
    )


def build_sample_sort_kv(
    mesh,
    n_local: int,
    payload_lanes: int,
    *,
    capacity_factor: float = 1.5,
    axis: str = KEY_AXIS,
):
    """Compile-ready distributed stable key-value sample sort.

    ``fn(keys, vals) -> (padded_keys, padded_vals, counts, overflow)`` with
    keys (P*n_local,) and vals (P*n_local, payload_lanes) uint32, both
    sharded over ``axis``.
    """
    nchips = mesh.shape[axis]
    capacity = default_pair_capacity(n_local, nchips, capacity_factor)
    fn = shard_map(
        lambda k, v: _sample_sort_kv_shard(k, v, axis=axis, capacity=capacity),
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P()),
    )
    return jax.jit(fn), capacity


def sort_key_value_distributed(
    keys,
    values,
    *,
    mesh=None,
    capacity_factor: float = 1.5,
) -> tuple[np.ndarray, np.ndarray]:
    """Host-facing distributed stable key-value sort (BASELINE.json config
    3: payload rows follow their keys with deterministic placement).

    ``values``: (n, B) uint8 rows (B a multiple of 4) or any (n, W) uint32
    array.  Returns (sorted_keys, values_in_sorted_order) exactly matching
    a stable single-chip kv sort.
    """
    from .distributed import OverflowError_

    mesh = mesh or key_mesh()
    nchips = mesh.shape[KEY_AXIS]
    keys = np.asarray(keys, dtype=np.uint32)
    values = np.asarray(values)
    n = keys.size
    if values.shape[0] != n:
        raise ValueError(f"values rows {values.shape[0]} != keys {n}")
    vals_u32 = values
    if values.dtype != np.uint32:
        if values.dtype != np.uint8 or values.ndim != 2 or values.shape[1] % 4:
            raise ValueError(
                "values must be (n, W) uint32 or (n, B) uint8 with B % 4 == 0"
            )
        vals_u32 = values.view(np.uint32).reshape(n, -1)
    if vals_u32.ndim != 2:
        raise ValueError(
            "values must be (n, W) uint32 or (n, B) uint8 with B % 4 == 0"
        )
    W = vals_u32.shape[1]

    n_local = max(-(-n // nchips), nchips)
    n_pad = n_local * nchips
    pk = np.full(n_pad, 0xFFFFFFFF, dtype=np.uint32)
    pk[:n] = keys
    pv = np.zeros((n_pad, W), dtype=np.uint32)
    pv[:n] = vals_u32

    sharding = NamedSharding(mesh, P(KEY_AXIS))
    dk = jax.device_put(pk, sharding)
    dv = jax.device_put(pv, sharding)
    fn, capacity = build_sample_sort_kv(
        mesh, n_local, W, capacity_factor=capacity_factor
    )
    mk, mv, counts, overflow = fn(dk, dv)
    if int(overflow) > 0:
        raise OverflowError_(
            "kv sample-sort capacity overflowed; increase capacity_factor"
        )
    mk = np.asarray(jax.device_get(mk)).reshape(nchips, -1)
    mv = np.asarray(jax.device_get(mv)).reshape(nchips, mk.shape[1], W)
    counts = np.asarray(jax.device_get(counts)).reshape(-1)
    out_k = np.concatenate([mk[i, : counts[i]] for i in range(nchips)])
    out_v = np.concatenate([mv[i, : counts[i]] for i in range(nchips)])
    assert out_k.size == n_pad
    out_k, out_v = out_k[:n], out_v[:n]
    if values.dtype != np.uint32:
        out_v = (
            np.ascontiguousarray(out_v.reshape(n, -1))
            .view(np.uint8)
            .reshape(values.shape)
        )
    return out_k, out_v


def sort_distributed_sample(
    keys,
    *,
    mesh=None,
    capacity_factor: float = 1.5,
    fallback: bool = True,
) -> np.ndarray:
    """Host-facing distributed sample sort: pads, shards, runs PSRS,
    linearizes the ragged sorted shards exactly.

    Degenerate distributions (duplicate-heavy, or already-sorted inputs
    where every shard is self-destined) exceed any fixed pair capacity;
    with ``fallback=True`` such overflows retry through the exact gather
    exchange, otherwise they raise ``OverflowError_``.
    """
    from .distributed import OverflowError_

    mesh = mesh or key_mesh()
    nchips = mesh.shape[KEY_AXIS]
    keys = np.asarray(keys, dtype=np.uint32)
    n = keys.size
    n_local = max(-(-n // nchips), nchips)  # >= P for regular sampling
    n_pad = n_local * nchips
    padded = np.full(n_pad, 0xFFFFFFFF, dtype=np.uint32)
    padded[:n] = keys

    dev = jax.device_put(padded, NamedSharding(mesh, P(KEY_AXIS)))
    fn, capacity = build_sample_sort(
        mesh, n_local, capacity_factor=capacity_factor
    )
    shards, counts, overflow = fn(dev)
    if int(overflow) > 0:
        if fallback:
            from .distributed import sort_distributed

            return sort_distributed(keys, mesh=mesh, exchange="gather")
        raise OverflowError_(
            "sample-sort pair capacity overflowed; increase capacity_factor "
            "or use the gather exchange for duplicate-heavy data"
        )
    shards = np.asarray(jax.device_get(shards)).reshape(nchips, -1)
    counts = np.asarray(jax.device_get(counts)).reshape(-1)
    out = np.concatenate([shards[i, : counts[i]] for i in range(nchips)])
    assert out.size == n_pad, (out.size, n_pad)
    return out[:n]
