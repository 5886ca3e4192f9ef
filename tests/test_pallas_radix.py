"""Pallas radix digit-binning engine (ops/pallas_radix.py), interpret mode.

Toy geometry (TILE=1024, B_OUT=512... wait B_OUT must be >= 1024) —
production geometry runs on the real chip via the `-m tpu` suite.
Oracle: numpy stable argsort by the digit window, exactly the contract of
the reference's Step(offset, width) data movement (sort.cu:322-344).
"""

import numpy as np
import pytest

from gpu_radix_sort_tpu.ops import pallas_radix as pr
from gpu_radix_sort_tpu.utils.keygen import Pcg32

TILE = 4096
B_OUT = 2048


def _oracle(keys, offset, width):
    digits = (keys >> np.uint32(offset)) & np.uint32((1 << width) - 1)
    return keys[np.argsort(digits, kind="stable")]


@pytest.mark.parametrize("n", [1, 7, 1024, 1111, 4096, 6000, 16384 + 17])
@pytest.mark.parametrize("offset,width", [(0, 4), (8, 4), (28, 4), (5, 3)])
def test_binning_pass_exact(n, offset, width):
    keys = Pcg32().fill(n)
    got = np.asarray(
        pr.binning_pass(keys, offset, width, tile=TILE, b_out=B_OUT)
    )
    np.testing.assert_array_equal(got, _oracle(keys, offset, width))


def test_binning_pass_stability_witness():
    # duplicate-heavy digits; keys carry their original index in high bits
    n = 5000
    rng = np.random.default_rng(0)
    digits = rng.integers(0, 16, n, dtype=np.uint32)
    keys = (np.arange(n, dtype=np.uint32) << np.uint32(4)) | digits
    got = np.asarray(pr.binning_pass(keys, 0, 4, tile=TILE, b_out=B_OUT))
    np.testing.assert_array_equal(got, _oracle(keys, 0, 4))


@pytest.mark.parametrize("case", ["all_same", "two_vals", "sorted", "rev"])
def test_binning_pass_skew(case):
    n = 4096 + 321
    if case == "all_same":
        keys = np.full(n, 0xDEADBEEF, dtype=np.uint32)
    elif case == "two_vals":
        keys = np.where(
            np.arange(n) % 7 == 0, np.uint32(0xF0), np.uint32(0x0F)
        ).astype(np.uint32)
    elif case == "sorted":
        keys = np.sort(Pcg32().fill(n))
    else:
        keys = np.sort(Pcg32().fill(n))[::-1].copy()
    for offset in (0, 4):
        got = np.asarray(pr.binning_pass(keys, offset, 4, tile=TILE, b_out=B_OUT))
        np.testing.assert_array_equal(got, _oracle(keys, offset, 4))


def _kv_oracle(keys, lanes, offset, width):
    digits = (keys >> np.uint32(offset)) & np.uint32((1 << width) - 1)
    order = np.argsort(digits, kind="stable")
    return keys[order], lanes[order]


@pytest.mark.parametrize("n,L", [(1, 1), (1024, 1), (1111, 3), (6000, 1),
                                 (6000, 2)])
def test_binning_pass_kv_exact(n, L):
    keys = Pcg32().fill(n)
    lanes = np.arange(n * L, dtype=np.uint32).reshape(n, L)  # provenance
    gk, gv = (
        np.asarray(a)
        for a in pr.binning_pass_kv(
            keys, lanes, 8, 4, tile=TILE, b_out=B_OUT
        )
    )
    wk, wv = _kv_oracle(keys, lanes, 8, 4)
    np.testing.assert_array_equal(gk, wk)
    np.testing.assert_array_equal(gv, wv)


def test_binning_pass_kv_stability_duplicates():
    n = 5000
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 8, n, dtype=np.uint32)  # heavy duplicates
    lanes = np.arange(n, dtype=np.uint32).reshape(n, 1)
    gk, gv = (
        np.asarray(a)
        for a in pr.binning_pass_kv(keys, lanes, 0, 4, tile=TILE, b_out=B_OUT)
    )
    wk, wv = _kv_oracle(keys, lanes, 0, 4)
    np.testing.assert_array_equal(gk, wk)
    np.testing.assert_array_equal(gv, wv)  # payload order = stability proof


@pytest.mark.parametrize("width", [8])
def test_sort_kv_by_digits_large_multipass(width):
    n = 6000
    keys = Pcg32().fill(n)
    lanes = np.arange(n, dtype=np.uint32).reshape(n, 1)
    gk, gv = (
        np.asarray(a)
        for a in pr.sort_key_value_by_digits_large(
            keys, lanes, 4, width, tile=TILE, b_out=B_OUT
        )
    )
    wk, wv = _kv_oracle(keys, lanes, 4, width)
    np.testing.assert_array_equal(gk, wk)
    np.testing.assert_array_equal(gv, wv)


def test_binning_pass_full_range_keys():
    # 0x00000000 and 0xFFFFFFFF are data, not sentinels
    keys = np.array(
        [0xFFFFFFFF, 0, 0xFFFFFFFF, 1, 0xFFFFFFF0, 0, 0xFFFFFFFF] * 300,
        dtype=np.uint32,
    )
    got = np.asarray(pr.binning_pass(keys, 28, 4, tile=TILE, b_out=B_OUT))
    np.testing.assert_array_equal(got, _oracle(keys, 28, 4))


@pytest.mark.parametrize("width", [8, 12, 16])
def test_sort_by_digits_large_multipass(width):
    n = 6000
    keys = Pcg32().fill(n)
    got = np.asarray(
        pr.sort_by_digits_large(keys, 4, width, tile=TILE, b_out=B_OUT)
    )
    np.testing.assert_array_equal(got, _oracle(keys, 4, width))


def test_full_sort_via_eight_passes():
    # 8 x 4-bit LSD passes = full sort (the radix full-sort path)
    n = 5000
    keys = Pcg32().fill(n)
    got = np.asarray(
        pr.sort_by_digits_large(keys, 0, 32, tile=TILE, b_out=B_OUT)
    )
    np.testing.assert_array_equal(got, np.sort(keys))


def test_strategy_dispatch():
    import gpu_radix_sort_tpu as gst

    keys = Pcg32().fill(3000)
    got = np.asarray(
        gst.sort_by_digits(keys, 8, 8, strategy="pallas_radix")
    )
    np.testing.assert_array_equal(got, _oracle(keys, 8, 8))
    sk, b = gst.sort_partial(keys, 0, 8, strategy="pallas_radix")
    want, _ = gst.sort_partial(keys, 0, 8, strategy="xla")
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(want))


def test_auto_geometry_smem_bound():
    for n in (1 << 20, 64 << 20, 256 << 20, 1 << 31):
        tile, b_out = pr.auto_geometry(n, 4)
        n_tiles = -(-n // tile)
        n_pad = n_tiles * tile
        assert n_tiles <= pr.MAX_TILES
        assert n_pad // b_out <= pr.MAX_BLOCKS
        assert tile % b_out == 0
        smem_bytes = 4 * (2 * n_tiles * 16 + 2 * (n_pad // b_out))
        assert smem_bytes < 600 * 1024
    assert pr.auto_geometry(64 << 20, 4) == (pr.TILE, pr.B_OUT)


def test_metadata_run_math():
    # hand-check g_run/sflat/k0/nfrag on a tiny synthetic histogram
    import jax.numpy as jnp

    starts = jnp.asarray(
        [[0, 2, 5, 8, 8], [0, 0, 4, 4, 8]], dtype=jnp.int32
    )  # 2 tiles, D=4, tile=8
    g_run, sflat, k0, nfrag = pr._binning_metadata(starts, 8, 4, 16)
    # counts: t0 = [2,3,3,0]; t1 = [0,4,0,4]; run order (d, t)
    np.testing.assert_array_equal(
        np.asarray(g_run), [0, 2, 2, 5, 9, 12, 12, 12, 16]
    )
    np.testing.assert_array_equal(
        np.asarray(sflat), [0, 8, 2, 8, 5, 12, 8, 12]
    )
    # blocks of 4: block 0 covers [0,4) <- runs 0,1(empty),2; block 3
    # covers [12,16) <- run 7 alone (runs 5,6 are empty with end==12).
    np.testing.assert_array_equal(np.asarray(k0), [0, 2, 3, 7])
    np.testing.assert_array_equal(np.asarray(nfrag), [3, 2, 2, 1])


def test_sort_key_value_by_digits_strategy_routing():
    """The public kv digit sort routes to the binning engine when forced
    (strategy='pallas_radix') and matches the XLA path bit-for-bit,
    including non-uint32 4-byte payload dtypes (bitcast round-trip)."""
    from gpu_radix_sort_tpu.ops import radix_sort as rs

    n = 6000
    keys = Pcg32().fill(n)
    for dtype in (np.uint32, np.int32, np.float32):
        vals = np.arange(n, dtype=np.uint32).view(dtype)
        gk, gv = (
            np.asarray(a)
            for a in rs.sort_key_value_by_digits(
                keys, vals, 8, 4, strategy="pallas_radix"
            )
        )
        wk, wv = (
            np.asarray(a)
            for a in rs.sort_key_value_by_digits(
                keys, vals, 8, 4, strategy="xla"
            )
        )
        np.testing.assert_array_equal(gk, wk)
        np.testing.assert_array_equal(
            gv.view(np.uint32), wv.view(np.uint32)
        )
        assert gv.dtype == dtype


def test_supported_auto_kv_gate():
    from gpu_radix_sort_tpu.ops import pallas_radix as prm

    # interpret mode (CPU tests) always refuses auto
    assert not prm.supported_auto_kv(1 << 26, 4)


@pytest.mark.parametrize("chunk_rows", [8, 32])
def test_binning_pass_chunk_rows_exact(chunk_rows):
    """chunk_rows is a guarded probe lever (VERDICT r4 item 5): the
    window-anchoring invariants are asserted and any x8 granularity is
    exact.  b_out must be a multiple of chunk_rows*128."""
    keys = Pcg32().fill(16384 + 17)
    got = np.asarray(
        pr.binning_pass(
            keys, 4, 4, tile=TILE, b_out=4096, chunk_rows=chunk_rows
        )
    )
    np.testing.assert_array_equal(got, _oracle(keys, 4, 4))


def test_chunk_rows_validation():
    keys = Pcg32().fill(4096)
    with pytest.raises(ValueError, match="positive x8"):
        pr.binning_pass(keys, 0, 4, tile=TILE, b_out=2048, chunk_rows=12)
    with pytest.raises(ValueError, match="SRC_FRONT_ROWS"):
        pr.binning_pass(keys, 0, 4, tile=TILE, b_out=TILE, chunk_rows=1024)
    with pytest.raises(ValueError, match="multiple of"):
        pr.binning_pass(keys, 0, 4, tile=TILE, b_out=2048, chunk_rows=32)
