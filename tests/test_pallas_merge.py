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


def _alt_tiles(keys, tile=TILE, b_out=B_OUT):
    """Merge-level input convention: alternating-direction sorted runs
    plus the uninitialized headroom tail merge_level requires."""
    x = np.sort(np.asarray(keys, np.uint32).reshape(-1, tile), axis=1)
    x[1::2] = x[1::2, ::-1]
    pad = pm._pad_rows(b_out) * 128
    flat = np.concatenate([x.reshape(-1), np.zeros(pad, np.uint32)])
    return jnp.asarray(flat.reshape(-1, 128))


def test_merge_level_pairs():
    keys = Pcg32().fill(8 * TILE)  # 8 runs -> 4 merged pairs
    n = keys.size
    x = _alt_tiles(keys)
    out = np.asarray(pm.merge_level(x, TILE, B_OUT, n=n)).reshape(-1)[:n]
    for p in range(4):  # output run p ascending iff p even
        lo, hi = p * 2 * TILE, (p + 1) * 2 * TILE
        want = np.sort(keys[lo:hi])
        np.testing.assert_array_equal(
            out[lo:hi], want if p % 2 == 0 else want[::-1]
        )


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


def test_auto_gate_is_pad_aware(monkeypatch):
    """The auto route must account for pow2 padding: merge sorts n_pad
    elements while XLA sorts n, so sizes just above a power of two stay
    on XLA until the measured rate model says merge still wins."""
    monkeypatch.setattr(pm, "_interpret", lambda: False)
    assert not pm.supported_auto((1 << 20) - 1)  # below floor
    assert pm.supported_auto(1 << 20)  # exact pow2: measured 1.14x
    assert pm.supported_auto(1_700_000)  # pad 1.23x: still ahead
    assert pm.supported_auto(3_000_000)  # pad 1.33x at 4Mi: model says win
    assert not pm.supported_auto(4_300_000)  # pad 1.95x at 8Mi: XLA wins
    assert pm.supported_auto(9_000_000)  # >= 2^24 padded: merge >= XLA
    assert pm.supported_auto((1 << 23) + 1)  # worst >=2^24 pad: parity


def test_merge_splits_are_feasible():
    """Every split satisfies the multiset partition property: the block at
    rank r consumes the r smallest keys (in network order) of its pair —
    ``a`` from win1's ascending front, ``r - a`` from win2's descending
    tail.  Descending-output blocks are checked in the complement domain
    (the kernel runs the same ascending network on ~keys)."""
    keys = Pcg32().fill(4 * TILE)  # 2 pairs: one asc-output, one desc-output
    n = keys.size
    x = _alt_tiles(keys)
    xs = np.asarray(x).reshape(-1)
    w1_row, s1, e1, e2, s2, d = (
        np.asarray(s) for s in pm._merge_splits(x, TILE, n, B_OUT)
    )
    two_l = 2 * TILE
    for g in range(n // B_OUT):
        pair = (g * B_OUT) // two_l
        r = g * B_OUT - pair * two_l
        base = pair * two_l
        off1 = TILE if d[g] else 0
        a = s1[g] - (base + off1)
        b = r - a
        assert 0 <= a <= TILE and 0 <= b <= TILE
        assert e1[g] == base + off1 + TILE
        assert s2[g] == base + (0 if d[g] else TILE)
        assert e2[g] - s2[g] == TILE - b
        w1 = xs[base + off1 : base + off1 + TILE]
        w2 = xs[s2[g] : s2[g] + TILE]
        if d[g]:  # complement domain: win1 ascending, win2 descending
            w1, w2 = ~w1, ~w2
        taken = np.concatenate([w1[:a], w2[TILE - b :]])
        rest = np.concatenate([w1[a:], w2[: TILE - b]])
        if taken.size and rest.size:
            assert taken.max() <= rest.min()


@pytest.mark.parametrize("nruns", [2, 4, 8])
def test_merge_presorted_exact(nruns):
    """Presorted-runs merge (levels only, no stage-1): exact vs np.sort
    (VERDICT r3 item 7b)."""
    run = 2048  # == min_presorted_run(B_OUT=512) at the test geometry
    assert pm.min_presorted_run(B_OUT) == 2048
    rng = np.random.default_rng(nruns)
    x = rng.integers(0, 1 << 32, nruns * run, dtype=np.uint32)
    runs = np.sort(x.reshape(nruns, run), axis=1).reshape(-1)
    got = np.asarray(pm.merge_presorted(jnp.asarray(runs), run, b_out=B_OUT))
    np.testing.assert_array_equal(got, np.sort(x))


def test_merge_presorted_duplicates_and_max_keys():
    run = 2048
    rng = np.random.default_rng(3)
    x = rng.choice(
        np.array([0, 5, 5, 7, 0xFFFFFFFF], dtype=np.uint32), size=4 * run
    )
    runs = np.sort(x.reshape(4, run), axis=1).reshape(-1)
    got = np.asarray(pm.merge_presorted(jnp.asarray(runs), run, b_out=B_OUT))
    np.testing.assert_array_equal(got, np.sort(x))


def test_merge_presorted_single_run_and_rejects():
    run = 2048
    x = np.sort(np.arange(run, dtype=np.uint32))
    got = np.asarray(pm.merge_presorted(jnp.asarray(x), run, b_out=B_OUT))
    np.testing.assert_array_equal(got, x)
    with pytest.raises(ValueError, match="powers of 2"):
        pm.merge_presorted(jnp.zeros(3 * run, np.uint32), run, b_out=B_OUT)
    with pytest.raises(ValueError, match="window-containment"):
        pm.merge_presorted(jnp.zeros(2048, np.uint32), 1024, b_out=B_OUT)


@pytest.mark.parametrize("prerun", [128, 256, 512])
def test_sort_full_large_rowstage(prerun):
    """stage1_rows: batched XLA row sort replaces the first network phases
    (VERDICT r3 item 1 stage-1 candidate) — bit-exact vs np.sort."""
    keys = Pcg32(state=77).fill(3 * TILE + 100)  # odd n: pow2 padding
    got = np.asarray(
        pm.sort_full_large(
            jnp.asarray(keys), tile=TILE, b_out=B_OUT, stage1_rows=prerun
        )
    )
    np.testing.assert_array_equal(got, np.sort(keys))


def test_sort_full_large_rowstage_duplicates():
    rng = np.random.default_rng(5)
    keys = rng.choice(
        np.array([0, 2, 2, 0xFFFFFFFF], dtype=np.uint32), size=2 * TILE
    )
    got = np.asarray(
        pm.sort_full_large(
            jnp.asarray(keys), tile=TILE, b_out=B_OUT, stage1_rows=256
        )
    )
    np.testing.assert_array_equal(got, np.sort(keys))


def test_sort_tiles_prerun_rejects():
    x = jnp.zeros((TILE // 128, 128), jnp.uint32)
    with pytest.raises(ValueError, match="prerun"):
        pm.sort_tiles(x, TILE, prerun=100)  # not a power of 2
    with pytest.raises(ValueError, match="prerun"):
        pm.sort_tiles(x, TILE, prerun=TILE)  # not < tile
