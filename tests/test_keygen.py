"""Keygen parity: the vectorized / native PCG32 must reproduce the reference
bitstream (libsort/utils.cu:63-79) word-for-word, and the process-global
stream must be continuous across calls like the reference's C static state."""

import numpy as np
import pytest

from gpu_radix_sort_tpu.utils import keygen, native
from gpu_radix_sort_tpu.utils.keygen import Pcg32, PCG32_INIT_STATE

# First words of the reference stream, computed by direct transcription of
# libsort/utils.cu:66-79 (independently verified by fill_reference_loop).
def _direct(n, state=PCG32_INIT_STATE):
    g = Pcg32(state)
    return g.fill_reference_loop(n)


def test_vectorized_matches_direct_loop():
    want = _direct(10_000)
    got = Pcg32().fill(10_000)
    np.testing.assert_array_equal(got, want)


def test_numpy_fallback_matches_direct_loop():
    want = _direct(4_097)
    states = keygen._fill_states(PCG32_INIT_STATE, 4_097)
    got = keygen._pcg32_output(states)
    np.testing.assert_array_equal(got, want)


def test_stream_continuity_across_calls():
    g1 = Pcg32()
    a = g1.fill(1_000)
    b = g1.fill(1_000)
    g2 = Pcg32()
    both = g2.fill(2_000)
    np.testing.assert_array_equal(np.concatenate([a, b]), both)
    assert g1.state == g2.state


def test_global_stream_reset():
    keygen.reset_global_stream()
    a = keygen.generate_keys(100)
    keygen.reset_global_stream()
    b = keygen.generate_keys(100)
    np.testing.assert_array_equal(a, b)


def test_odd_sizes_and_zero():
    # Non-power-of-2 sizes exercise the doubling fill's remainder path.
    for n in (0, 1, 2, 3, 1111, 1021, 4099):
        want = _direct(n)
        got = Pcg32().fill(n)
        np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_matches_numpy_large():
    # Large enough to trigger the native multi-threaded jump-ahead path.
    n = 3_000_000
    want_states = keygen._fill_states(PCG32_INIT_STATE, n)
    want = keygen._pcg32_output(want_states)
    got, new_state = native.pcg32_fill(PCG32_INIT_STATE, n)
    np.testing.assert_array_equal(got, want)
    with np.errstate(over="ignore"):
        expect_state = want_states[-1] * keygen._MULT + keygen._INC
    assert new_state == expect_state


def test_distribution_sanity():
    # Reference analog: TestGenerate (libsort_test.go:116-155) — mean within
    # the IQR, decent spread.
    keys = Pcg32().fill(100_000)
    assert keys.min() < 2**28
    assert keys.max() > 2**32 - 2**28
    q25, q75 = np.quantile(keys, [0.25, 0.75])
    assert q25 < keys.mean() < q75


def test_zipf_keys_skewed():
    keys = keygen.generate_zipf_keys(100_000, alpha=1.2, seed=3)
    assert keys.dtype == np.uint32
    _, counts = np.unique(keys, return_counts=True)
    # Heavy skew: top key much hotter than uniform expectation.
    assert counts.max() > 50
