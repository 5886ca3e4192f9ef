"""Table operator tests: hash partition, compaction filter, group aggregate
(numpy oracles; no reference equivalent — north-star capability set)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpu_radix_sort_tpu.ops.table import (
    compact,
    filter_range,
    group_aggregate,
    group_aggregate_sorted,
    hash_partition_ids,
    hash_u32,
    partition_by_ids,
)
from gpu_radix_sort_tpu.utils.keygen import Pcg32, generate_zipf_keys


def test_hash_is_bijective_on_sample():
    keys = Pcg32().fill(1 << 16)
    hashed = np.asarray(hash_u32(jnp.asarray(keys)))
    assert np.unique(hashed).size == np.unique(keys).size


def test_hash_partition_uniformity():
    keys = Pcg32().fill(1 << 16)
    ids = np.asarray(hash_partition_ids(jnp.asarray(keys), 8))
    counts = np.bincount(ids, minlength=8)
    assert counts.min() > 0.8 * keys.size / 8
    assert counts.max() < 1.2 * keys.size / 8
    with pytest.raises(ValueError):
        hash_partition_ids(jnp.asarray(keys), 6)


def test_partition_by_ids_stable():
    keys = Pcg32().fill(4099)
    ids = hash_partition_ids(jnp.asarray(keys), 4)
    reordered, counts = jax.jit(partition_by_ids, static_argnums=2)(
        jnp.asarray(keys), ids, 4
    )
    reordered, counts = np.asarray(reordered), np.asarray(counts)
    ids_np = np.asarray(ids)
    assert counts.sum() == keys.size
    start = 0
    for p in range(4):
        want = keys[ids_np == p]  # stable: original order within partition
        np.testing.assert_array_equal(reordered[start : start + counts[p]], want)
        start += counts[p]


def test_compact_preserves_order():
    vals = Pcg32().fill(1021)
    mask = (vals % 3) == 0
    packed, cnt = jax.jit(compact)(jnp.asarray(vals), jnp.asarray(mask))
    packed, cnt = np.asarray(packed), int(cnt)
    assert cnt == mask.sum()
    np.testing.assert_array_equal(packed[:cnt], vals[mask])
    assert packed.shape == vals.shape  # static shape


def test_filter_range():
    vals = Pcg32().fill(5000)
    packed, cnt = filter_range(jnp.asarray(vals), 1 << 30, 3 << 30)
    packed, cnt = np.asarray(packed), int(cnt)
    want = vals[(vals >= (1 << 30)) & (vals < (3 << 30))]
    np.testing.assert_array_equal(packed[:cnt], want)


@pytest.mark.parametrize("op", ["sum", "count", "min", "max"])
def test_group_aggregate_vs_numpy(op):
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 50, size=3000).astype(np.uint32)  # heavy dupes
    vals = rng.random(3000).astype(np.float32) * 100

    uniq, agg, ng = jax.jit(group_aggregate, static_argnames="op")(
        jnp.asarray(keys), jnp.asarray(vals), op=op
    )
    uniq, agg, ng = np.asarray(uniq), np.asarray(agg), int(ng)

    want_keys = np.unique(keys)
    assert ng == want_keys.size
    np.testing.assert_array_equal(uniq[:ng], want_keys)
    for i, k in enumerate(want_keys):
        group = vals[keys == k]
        if op == "sum":
            np.testing.assert_allclose(agg[i], group.sum(), rtol=1e-5)
        elif op == "count":
            assert agg[i] == group.size
        elif op == "min":
            assert agg[i] == group.min()
        else:
            assert agg[i] == group.max()


def test_group_aggregate_uint32_sum_wraps_exactly():
    """Integer sums ride a cumsum-difference (group_aggregate_sorted); the
    diffs must recover group sums EXACTLY under modular wraparound, so
    full-range uint32 values are the adversarial case."""
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 20, size=4000).astype(np.uint32)
    vals = rng.integers(0, 1 << 32, size=4000, dtype=np.uint64).astype(
        np.uint32
    )
    uniq, agg, ng = jax.jit(group_aggregate, static_argnames="op")(
        jnp.asarray(keys), jnp.asarray(vals), op="sum"
    )
    uniq, agg, ng = np.asarray(uniq), np.asarray(agg), int(ng)
    want_keys = np.unique(keys)
    np.testing.assert_array_equal(uniq[:ng], want_keys)
    for i, k in enumerate(want_keys):
        want = np.uint32(vals[keys == k].astype(np.uint64).sum() % (1 << 32))
        assert agg[i] == want, (k, agg[i], want)


@pytest.mark.parametrize("op", ["min", "max"])
def test_group_aggregate_minmax_uint32_full_range(op):
    """min/max ride a segmented associative scan; uint32 values above
    2^31 catch any accidental signed comparison."""
    rng = np.random.default_rng(12)
    keys = rng.integers(0, 9, size=2000).astype(np.uint32)
    vals = rng.integers(0, 1 << 32, size=2000, dtype=np.uint64).astype(
        np.uint32
    )
    uniq, agg, ng = jax.jit(group_aggregate, static_argnames="op")(
        jnp.asarray(keys), jnp.asarray(vals), op=op
    )
    uniq, agg, ng = np.asarray(uniq), np.asarray(agg), int(ng)
    for i, k in enumerate(np.unique(keys)):
        group = vals[keys == k]
        want = group.min() if op == "min" else group.max()
        assert agg[i] == want


def test_group_aggregate_sorted_accepts_hash_clustered_input():
    """The relaxed contract the fused hash-aggregate shard relies on:
    equal keys adjacent in ANY order (here: hash order) aggregates
    per-run, preserving the input's run order in the output."""
    keys = np.array([7, 1, 4, 9, 2], dtype=np.uint32)
    order = np.argsort([int(h) for h in np.asarray(hash_u32(keys))])
    clustered = np.repeat(keys[order], 3)
    vals = np.arange(clustered.size, dtype=np.uint32)
    uniq, agg, ng = group_aggregate_sorted(
        jnp.asarray(clustered), jnp.asarray(vals), "sum"
    )
    uniq, agg, ng = np.asarray(uniq), np.asarray(agg), int(ng)
    assert ng == keys.size
    np.testing.assert_array_equal(uniq[:ng], keys[order])
    want = vals.reshape(-1, 3).sum(axis=1, dtype=np.uint32)
    np.testing.assert_array_equal(agg[:ng], want)


def test_group_aggregate_sorted_requires_no_values_for_count():
    keys = np.sort(np.array([5, 5, 9, 9, 9, 11], dtype=np.uint32))
    uniq, agg, ng = group_aggregate_sorted(jnp.asarray(keys), None, "count")
    assert int(ng) == 3
    np.testing.assert_array_equal(np.asarray(uniq)[:3], [5, 9, 11])
    np.testing.assert_array_equal(np.asarray(agg)[:3], [2, 3, 1])


def test_group_aggregate_zipf_skew():
    """Zipf keys: a few dominant groups (the skew scenario of
    BASELINE.json config 5)."""
    keys = generate_zipf_keys(20000, alpha=1.3, seed=3)
    uniq, agg, ng = group_aggregate(jnp.asarray(keys), None, "count")
    uniq, agg, ng = np.asarray(uniq), np.asarray(agg), int(ng)
    want_keys, want_counts = np.unique(keys, return_counts=True)
    assert ng == want_keys.size
    np.testing.assert_array_equal(uniq[:ng], want_keys)
    np.testing.assert_array_equal(agg[:ng].astype(np.int64), want_counts)


def test_group_aggregate_bad_op():
    with pytest.raises(ValueError, match="op"):
        group_aggregate(jnp.zeros(4, jnp.uint32), None, "median")
