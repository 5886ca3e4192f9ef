"""Pallas bitonic sort kernel tests (interpret mode on CPU; the same kernel
code path is compiled by Mosaic on TPU — verified by /verify + bench)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpu_radix_sort_tpu.ops import pallas_sort, radix_sort
from gpu_radix_sort_tpu.utils.checks import check_partial
from gpu_radix_sort_tpu.utils.keygen import Pcg32


@pytest.mark.parametrize("n", [1, 7, 1024, 1025, 4099, 1 << 13])
def test_pallas_full_sort_exact(n):
    keys = Pcg32().fill(n)
    out = np.asarray(pallas_sort.sort_full(jnp.asarray(keys)))
    np.testing.assert_array_equal(out, np.sort(keys))


def test_pallas_full_sort_duplicates_and_extremes():
    keys = np.array([0xFFFFFFFF, 0, 5, 5, 5, 0xFFFFFFFF, 0, 1] * 200,
                    dtype=np.uint32)
    out = np.asarray(pallas_sort.sort_full(jnp.asarray(keys)))
    np.testing.assert_array_equal(out, np.sort(keys))


@pytest.mark.parametrize("offset,width", [(0, 8), (8, 4), (24, 8), (0, 13)])
def test_pallas_digit_sort_stable(offset, width):
    keys = Pcg32().fill(4099)
    out = np.asarray(
        pallas_sort.sort_by_digits(jnp.asarray(keys), offset, width)
    )
    assert check_partial(out, keys, offset, width)


def test_pallas_via_strategy_dispatch():
    keys = Pcg32().fill(2048)
    out = np.asarray(
        radix_sort.sort_full(jnp.asarray(keys), strategy="pallas")
    )
    np.testing.assert_array_equal(out, np.sort(keys))
    s, b = radix_sort.sort_partial(jnp.asarray(keys), 0, 8, strategy="pallas")
    assert check_partial(np.asarray(s), keys, 0, 8)


def test_pallas_size_and_width_limits():
    with pytest.raises(NotImplementedError, match="n <="):
        pallas_sort.sort_full(jnp.zeros(pallas_sort.MAX_N + 1, jnp.uint32))
    # width + position bits >= 32 must refuse (stability cannot be encoded)
    with pytest.raises(NotImplementedError, match="< 32"):
        pallas_sort.sort_by_digits(
            jnp.zeros(1 << 15, jnp.uint32), 0, 18
        )


def test_auto_strategy_never_crashes_off_tpu():
    # On CPU, auto must route to xla (supported() gates on backend).
    keys = Pcg32().fill(4096)
    out = np.asarray(radix_sort.sort_full(jnp.asarray(keys), strategy="auto"))
    np.testing.assert_array_equal(out, np.sort(keys))
