"""Deterministic cross-path fuzz: every execution path must agree with the
numpy oracle (and hence with each other) across randomized sizes, widths,
and key distributions."""

import numpy as np
import pytest

import gpu_radix_sort_tpu.utils.checks as checks
from gpu_radix_sort_tpu.data import MemArrayFactory
from gpu_radix_sort_tpu.parallel import (
    local_distrib_worker,
    sort_distrib_from_raw,
    sort_distributed,
    sort_distributed_sample,
)


def _cases(n_cases=12, seed=99):
    rng = np.random.default_rng(seed)
    for i in range(n_cases):
        n = int(rng.integers(1, 20_000))
        kind = rng.choice(["uniform", "dupes", "sorted", "reverse", "const",
                           "extremes"])
        if kind == "uniform":
            keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
        elif kind == "dupes":
            keys = rng.integers(0, 8, size=n).astype(np.uint32)
        elif kind == "sorted":
            keys = np.sort(rng.integers(0, 2**32, size=n, dtype=np.uint32))
        elif kind == "reverse":
            keys = np.sort(rng.integers(0, 2**32, size=n, dtype=np.uint32))[::-1].copy()
        elif kind == "const":
            keys = np.full(n, rng.integers(0, 2**32), dtype=np.uint32)
        else:
            keys = rng.choice(
                np.array([0, 1, 0x7FFFFFFF, 0xFFFFFFFE, 0xFFFFFFFF],
                         dtype=np.uint32), size=n)
        yield i, kind, keys


@pytest.mark.parametrize("case", list(_cases()), ids=lambda c: f"{c[0]}-{c[1]}")
def test_paths_agree_with_oracle(case):
    i, kind, keys = case
    want = np.sort(keys)

    import jax

    from gpu_radix_sort_tpu.ops.radix_sort import sort_full

    got = np.asarray(jax.device_get(sort_full(jax.device_put(keys))))
    np.testing.assert_array_equal(got, want, err_msg=f"single {kind}")

    got = sort_distributed(keys, width=16)
    np.testing.assert_array_equal(got, want, err_msg=f"mesh {kind}")

    got = sort_distributed_sample(keys)
    np.testing.assert_array_equal(got, want, err_msg=f"sample {kind}")

    if i % 3 == 0:  # storage path is slower; sample it
        got = sort_distrib_from_raw(
            keys, f"fuzz{i}", MemArrayFactory(), local_distrib_worker,
            width=8, nworker=3,
        )
        np.testing.assert_array_equal(got, want, err_msg=f"storage {kind}")
