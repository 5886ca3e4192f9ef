"""Production-geometry kernel correctness on the real chip.

Each test runs a hand-written Pallas kernel COMPILED (Mosaic) at the
geometry the dispatch actually uses in production, against exact numpy
oracles.  Sizes are chosen to keep compile+verify time bounded while still
exercising the production tile/block shapes.
"""

import numpy as np

import gpu_radix_sort_tpu as gst
from gpu_radix_sort_tpu.ops import pallas_merge, pallas_radix, pallas_sort
from gpu_radix_sort_tpu.utils.keygen import Pcg32


def _digit_oracle(keys, offset, width):
    d = (keys >> np.uint32(offset)) & np.uint32((1 << width) - 1)
    return keys[np.argsort(d, kind="stable")]


# ---------------------------------------------------------------------------
# VMEM bitonic network (pallas_sort) at its window bounds
# ---------------------------------------------------------------------------

def test_vmem_bitonic_full_window():
    for n in (pallas_sort.AUTO_MIN_N, pallas_sort.MAX_N - 17):
        keys = Pcg32().fill(n)
        got = np.asarray(pallas_sort.sort_full(keys))
        np.testing.assert_array_equal(got, np.sort(keys))


def test_vmem_bitonic_digit_kv_cap():
    n = pallas_sort.MAX_N_KV - 3
    keys = Pcg32().fill(n)
    got = np.asarray(pallas_sort.sort_by_digits(keys, 8, 8))
    np.testing.assert_array_equal(got, _digit_oracle(keys, 8, 8))


# ---------------------------------------------------------------------------
# HBM merge sort (pallas_merge) at production TILE / B_OUT
# ---------------------------------------------------------------------------

def test_merge_sort_production_tiles():
    # production TILE=2^17, B_OUT=2^16; n covers 4 tiles + 2 merge levels,
    # odd tail exercises the padding path
    n = (1 << 19) + 4097
    keys = Pcg32().fill(n)
    got = np.asarray(pallas_merge.sort_full_large(keys))
    np.testing.assert_array_equal(got, np.sort(keys))


def test_merge_sort_duplicate_heavy():
    n = 1 << 19
    keys = (Pcg32().fill(n) & np.uint32(0xFFFF)).astype(np.uint32)
    got = np.asarray(pallas_merge.sort_full_large(keys))
    np.testing.assert_array_equal(got, np.sort(keys))


def test_merge_auto_route_padded_odd_size():
    """The pad-aware auto gate routes odd sizes with pad factor <= 1.8
    through the merge engine (docs/PERF_NOTES.md rate model); exactness of
    the padded path through the PUBLIC dispatch, compiled on chip.
    3_000_000 pads to 4Mi (factor 1.33, measured 1.40x FOR merge)."""
    n = 3_000_000
    assert pallas_merge.supported_auto(n)
    keys = Pcg32().fill(n)
    got = np.asarray(gst.sort_full(keys))
    np.testing.assert_array_equal(got, np.sort(keys))


# ---------------------------------------------------------------------------
# Radix binning engine (pallas_radix) at production TILE / B_OUT
# ---------------------------------------------------------------------------

def test_binning_pass_production_geometry():
    n = (1 << 21) + 12345  # 32+ production tiles, odd tail
    keys = Pcg32().fill(n)
    got = np.asarray(pallas_radix.binning_pass(keys, 8, 4))
    np.testing.assert_array_equal(got, _digit_oracle(keys, 8, 4))


def test_binning_pass_skew_production_geometry():
    # one digit takes nearly every key -> fragment loops at their worst
    # (same n as above so the Mosaic-compiled kernel is reused)
    n = (1 << 21) + 12345
    keys = np.full(n, 0x01020304, dtype=np.uint32)
    keys[::7] = 0xF1020304
    got = np.asarray(pallas_radix.binning_pass(keys, 28, 4))
    np.testing.assert_array_equal(got, _digit_oracle(keys, 28, 4))


def test_radix_w8_two_pass_production():
    n = (1 << 21) + 12345
    keys = Pcg32().fill(n)
    got = np.asarray(pallas_radix.sort_by_digits_large(keys, 0, 8))
    np.testing.assert_array_equal(got, _digit_oracle(keys, 0, 8))


# ---------------------------------------------------------------------------
# Boundary contract on chip (reference parity: sort.cu:367-394)
# ---------------------------------------------------------------------------

def test_partial_sort_boundaries_on_chip():
    import gpu_radix_sort_tpu.utils.checks as checks

    n = (1 << 20) + 1021
    keys = Pcg32().fill(n)
    sorted_keys, b = gst.sort_partial(keys, 8, 8)
    got = np.asarray(sorted_keys)
    np.testing.assert_array_equal(got, _digit_oracle(keys, 8, 8))
    np.testing.assert_array_equal(
        np.asarray(b), checks.boundaries_oracle(got, 8, 8)
    )


def _kv_digit_oracle(keys, vals, offset, width):
    d = (keys >> np.uint32(offset)) & np.uint32((1 << width) - 1)
    order = np.argsort(d, kind="stable")
    return keys[order], vals[order]


def test_binning_kv_production_geometry():
    """kv column lanes through the binning engine at auto geometry,
    compiled: stability proven by the payload (= original index)."""
    n = (1 << 21) + 12345
    keys = Pcg32().fill(n)
    vals = np.arange(n, dtype=np.uint32)
    gk, (gv,) = pallas_radix.binning_pass_kv_cols(keys, (vals,), 8, 4)
    wk, wv = _kv_digit_oracle(keys, vals, 8, 4)
    np.testing.assert_array_equal(np.asarray(gk), wk)
    np.testing.assert_array_equal(np.asarray(gv), wv)


def test_sort_key_value_by_digits_auto_route_on_chip():
    """The public kv digit API auto-routes to the engine at n >= 2^22 /
    width <= 4 (supported_auto_kv) and matches the XLA path bitwise."""
    from gpu_radix_sort_tpu.ops import radix_sort as rs

    n = 1 << 22
    assert pallas_radix.supported_auto_kv(n, 4)
    keys = Pcg32().fill(n)
    vals = np.arange(n, dtype=np.uint32)
    gk, gv = rs.sort_key_value_by_digits(keys, vals, 8, 4)
    wk, wv = _kv_digit_oracle(keys, vals, 8, 4)
    np.testing.assert_array_equal(np.asarray(gk), wk)
    np.testing.assert_array_equal(np.asarray(gv), wv)
