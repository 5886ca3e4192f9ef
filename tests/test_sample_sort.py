"""Distributed sample sort (PSRS) on the 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from gpu_radix_sort_tpu.parallel import distributed, key_mesh, sample_sort
from gpu_radix_sort_tpu.utils.keygen import Pcg32, generate_zipf_keys


def _mesh():
    return key_mesh(jax.devices("cpu"))


@pytest.mark.parametrize("n", [64, 1111, 4099, 1 << 15])
def test_sample_sort_exact(n):
    keys = Pcg32().fill(n)
    out = sample_sort.sort_distributed_sample(keys, mesh=_mesh())
    np.testing.assert_array_equal(out, np.sort(keys))


def test_sample_sort_skewed():
    # Zipf value skew: splitters adapt (unlike fixed radix ranges).
    keys = generate_zipf_keys(1 << 14, alpha=1.2, seed=5)
    out = sample_sort.sort_distributed_sample(
        keys, mesh=_mesh(), capacity_factor=2.5
    )
    np.testing.assert_array_equal(out, np.sort(keys))


def test_sample_sort_overflow_on_constant():
    keys = np.full(1 << 13, 42, dtype=np.uint32)
    with pytest.raises(distributed.OverflowError_):
        sample_sort.sort_distributed_sample(
            keys, mesh=_mesh(), capacity_factor=1.0
        )


def test_sample_sort_tiny():
    for n in (1, 7, 9):
        keys = Pcg32().fill(n)
        out = sample_sort.sort_distributed_sample(keys, mesh=_mesh())
        np.testing.assert_array_equal(out, np.sort(keys))
