"""Real-TPU production-geometry suite (run by the /verify recipe).

Unlike tests/ (which forces an 8-device virtual CPU mesh), this suite runs
on the actual chip at the kernels' PRODUCTION geometries — interpret mode
cannot catch Mosaic-specific failure modes (DMA row-multiple faults,
scoped-VMEM limits, roll lowering; docs/PERF_NOTES.md), so these must
execute compiled.  Keep it out of CI: `python -m pytest tests_tpu/ -q`
with the chip attached and NO other process owning it.
"""

import jax
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "overlap: rdma_overlap harness tests (measured-negative mechanism "
        "kept for reproducibility) — deselect with -m 'not overlap'",
    )


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(reason="requires a real TPU chip")
        for item in items:
            item.add_marker(skip)
