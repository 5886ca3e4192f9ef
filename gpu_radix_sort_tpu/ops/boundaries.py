"""Group-boundary detection over digit-sorted keys.

TPU-native re-design of the reference's boundary machinery
(gpu_groups kernel, libsort/sort.cu:14-27, plus the host-side empty-group
backfill in SortState::GetBoundaries, sort.cu:367-394): instead of a
one-thread-per-element kernel followed by a host loop, the change-point
scatter and the backfill both run as O(2^width) vectorized device ops (the
backfill is an associative suffix scan), so boundaries never leave the
device — bucket metadata stays a device array rather than JSON, the
explicit design goal recorded in SURVEY.md §6.

Two contracts are provided:
  * :func:`compute_boundaries` — bit-exact with the reference (including its
    quirks: the group of element 0 is never marked and group 1 is never
    backfilled), for API/test parity.
  * :func:`digit_counts` — exact per-digit histogram, the metadata the
    distributed path actually uses (immune to the reference's
    empty-group-0/1 edge cases).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .bits import KEY_DTYPE, extract_digits, validate_digit_range


def compute_boundaries(
    sorted_keys: jnp.ndarray, offset: int, width: int
) -> jnp.ndarray:
    """Reference-contract boundaries of each digit group (uint32[2^width]).

    Input must already be sorted by bits [offset, offset+width).
    Matches SortState::GetBoundaries (sort.cu:367-394) bitwise.
    """
    validate_digit_range(offset, width)
    nb = 1 << width
    n = sorted_keys.shape[0]

    b = jnp.zeros(nb, dtype=KEY_DTYPE)
    if n > 1:
        d = extract_digits(sorted_keys, offset, width)
        changed = d[1:] != d[:-1]
        # Scatter first-change indices; unchanged positions target index nb,
        # dropped by the out-of-bounds mode (gpu_groups analog, sort.cu:14-27).
        targets = jnp.where(changed, d[1:], jnp.uint32(nb))
        idx = jnp.arange(1, n, dtype=KEY_DTYPE)
        b = b.at[targets].set(idx, mode="drop")

    if nb > 2:
        # Empty-group backfill (sort.cu:381-387): scanning groups high->low,
        # a zero entry takes the next-higher group's (possibly backfilled)
        # boundary, seeded with n; groups 0 and 1 are never backfilled.
        tail = b[2:][::-1]
        seeded = jnp.concatenate(
            [jnp.asarray([n], dtype=KEY_DTYPE), tail]
        )
        filled = jax.lax.associative_scan(
            lambda a, x: jnp.where(x == 0, a, x), seeded
        )
        b = b.at[2:].set(filled[1:][::-1])
    return b


def digit_counts(keys: jnp.ndarray, offset: int, width: int) -> jnp.ndarray:
    """Exact per-digit counts (int32[2^width]).  The TPU-native bucket
    metadata used by the distributed exchange; replaces
    boundaries->sizes derivation (benchmark/pkg/sort/distrib.go:45-53)."""
    validate_digit_range(offset, width)
    d = extract_digits(keys, offset, width)
    return jnp.bincount(d, length=1 << width).astype(jnp.int32)


def counts_to_boundaries(counts: jnp.ndarray) -> jnp.ndarray:
    """Exclusive prefix sum of counts = true start index of each digit group
    (the histogram-derived oracle of localTest/tests.cpp:44-55)."""
    return jnp.concatenate(
        [jnp.zeros(1, counts.dtype), jnp.cumsum(counts)[:-1]]
    )
