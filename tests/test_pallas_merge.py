"""HBM-scale Pallas merge sort tests (interpret mode, small geometry;
production geometry on the real chip is exercised by /verify + bench)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpu_radix_sort_tpu.ops import pallas_merge as pm
from gpu_radix_sort_tpu.utils.keygen import Pcg32

TILE, B_OUT = 2048, 512  # small geometry (tile >= b_out + 1024), fast interpret


def _sorted_tiles(keys, tile=TILE):
    x = np.asarray(keys, dtype=np.uint32)
    return jnp.asarray(
        np.sort(x.reshape(-1, tile), axis=1).reshape(-1, 128)
    )


def test_sort_tiles_each_run_sorted():
    keys = Pcg32().fill(4 * TILE)
    out = np.asarray(pm.sort_tiles(jnp.asarray(keys).reshape(-1, 128), TILE))
    out = out.reshape(-1)
    for t in range(4):
        np.testing.assert_array_equal(
            out[t * TILE : (t + 1) * TILE],
            np.sort(keys[t * TILE : (t + 1) * TILE]),
        )


def test_merge_level_pairs():
    keys = Pcg32().fill(8 * TILE)  # 8 runs -> 4 merged pairs
    x = _sorted_tiles(keys)
    out = np.asarray(pm.merge_level(x, TILE, B_OUT)).reshape(-1)
    for p in range(4):
        lo, hi = p * 2 * TILE, (p + 1) * 2 * TILE
        np.testing.assert_array_equal(out[lo:hi], np.sort(keys[lo:hi]))


def test_merge_level_validates():
    x = jnp.zeros((32, 128), jnp.uint32)
    with pytest.raises(ValueError, match="invalid level"):
        pm.merge_level(x, 1536, B_OUT)  # L not multiple of b_out
    with pytest.raises(ValueError, match="invalid level"):
        pm.merge_level(x, 1024, 1024)  # L < window (b_out + 1024)


@pytest.mark.parametrize("n", [1, 2048, 5000, 40000])
def test_sort_full_large_exact(n):
    keys = Pcg32().fill(n)
    out = np.asarray(
        pm.sort_full_large(jnp.asarray(keys), tile=TILE, b_out=B_OUT)
    )
    np.testing.assert_array_equal(out, np.sort(keys))


@pytest.mark.parametrize(
    "maker",
    [
        lambda rng: rng.integers(0, 4, size=6000).astype(np.uint32),
        lambda rng: np.full(4096, 0xFFFFFFFF, dtype=np.uint32),
        lambda rng: np.sort(Pcg32().fill(4096)),
        lambda rng: np.sort(Pcg32().fill(4096))[::-1].copy(),
        lambda rng: np.zeros(3000, dtype=np.uint32),
        lambda rng: np.concatenate(
            [np.full(2000, 7, np.uint32), np.full(2000, 0xFFFFFFFF, np.uint32)]
        ),
    ],
    ids=["dup-heavy", "all-max", "presorted", "reversed", "all-zero",
         "two-values-with-max"],
)
def test_sort_full_large_adversarial(maker):
    keys = maker(np.random.default_rng(0))
    out = np.asarray(
        pm.sort_full_large(jnp.asarray(keys), tile=TILE, b_out=B_OUT)
    )
    np.testing.assert_array_equal(out, np.sort(keys))


def test_merge_splits_are_feasible():
    """Every split satisfies the multiset partition property."""
    keys = Pcg32().fill(4 * TILE)
    x = _sorted_tiles(keys)
    xs = np.asarray(x).reshape(-1)
    n = 4 * TILE
    off = pm._w_rows(B_OUT) * 128
    a_row, a_lo, a_hi, rb_row, rb_lo, rb_hi = (
        np.asarray(s) for s in pm._merge_splits(x, TILE, n, B_OUT)
    )
    two_l = 2 * TILE
    for g in range(len(a_lo)):
        pair = (g * B_OUT) // two_l
        r = g * B_OUT - pair * two_l
        a = a_lo[g] - pair * two_l
        # rb_hi is in padded-xr coords: rb_hi = off + n - (b_base + b)
        b = off + n - (pair * two_l + TILE) - rb_hi[g]
        assert a + b == r
        assert 0 <= a <= TILE and 0 <= b <= TILE
        taken = np.concatenate(
            [xs[pair * two_l : pair * two_l + a],
             xs[pair * two_l + TILE : pair * two_l + TILE + b]]
        )
        rest = np.concatenate(
            [xs[pair * two_l + a : pair * two_l + TILE],
             xs[pair * two_l + TILE + b : (pair + 1) * two_l]]
        )
        if taken.size and rest.size:
            assert taken.max() <= rest.min()
