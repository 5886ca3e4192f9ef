"""Multi-host helpers on the single-process virtual device mesh."""

import jax
import numpy as np

from gpu_radix_sort_tpu.parallel.multihost import (
    initialize_distributed,
    pod_key_mesh,
    process_shard_bounds,
)


def test_initialize_noop_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert initialize_distributed() is False


def test_pod_key_mesh_orders_host_major():
    mesh = pod_key_mesh()
    devs = list(mesh.devices.reshape(-1))
    assert len(devs) == 8
    keys = [(d.process_index, d.id) for d in devs]
    assert keys == sorted(keys)


def test_process_shard_bounds_cover_everything():
    mesh = pod_key_mesh()
    n = 1000  # not divisible by 8
    lo, hi = process_shard_bounds(n, mesh)
    # single process owns all devices -> full range
    assert (lo, hi) == (0, n)


def test_distributed_sort_on_pod_mesh():
    from gpu_radix_sort_tpu.parallel.distributed import sort_distributed
    from gpu_radix_sort_tpu.utils.keygen import Pcg32

    keys = Pcg32().fill(5000)
    out = sort_distributed(keys, mesh=pod_key_mesh(), width=16)
    np.testing.assert_array_equal(out, np.sort(keys))


def test_process_shard_bounds_tail_host_clamped():
    """A host whose nominal range starts past n_global owns nothing — the
    returned range must stay within [0, n_global] with lo <= hi."""
    import types

    import numpy as _np

    # 16 stub chips over 2 "hosts"; this process (index 0) owns the tail 8.
    def dev(pi, i):
        return types.SimpleNamespace(process_index=pi, id=i)

    devs = [dev(1, i) for i in range(8)] + [dev(0, i) for i in range(8)]
    mesh = types.SimpleNamespace(devices=_np.array(devs, dtype=object))
    lo, hi = process_shard_bounds(3, mesh)  # per_chip=1; nominal [8, 16)
    assert (lo, hi) == (3, 3)  # empty, in-bounds
    lo, hi = process_shard_bounds(12, mesh)  # nominal [8, 16) -> [8, 12)
    assert (lo, hi) == (8, 12)
