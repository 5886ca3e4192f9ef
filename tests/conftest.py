"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; sharding/collective paths are
validated on virtual CPU devices (the driver separately dry-run-compiles the
multi-chip path via __graft_entry__.dryrun_multichip).

The environment pins JAX to a single tunneled TPU chip aggressively: a site
hook (PYTHONPATH sitecustomize) registers the TPU plugin and imports jax at
interpreter start — BEFORE this conftest runs — so plain env-var defaults
are too late and tests using default devices would silently run on one real
TPU chip (slow remote compiles, no multi-device coverage).  Fix: override
the platform through jax.config post-import (legal while backends are still
uninitialized) and clear the plugin hook for any child processes.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""  # site hook off in subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" in flags:
    # REPLACE a pre-existing count (e.g. =1 left over from a debug shell):
    # keeping it would shrink the virtual mesh and let every sharding test
    # pass trivially with zero multi-device coverage.
    import re as _re

    flags = _re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "--xla_force_host_platform_device_count=8",
        flags,
    )
    os.environ["XLA_FLAGS"] = flags
else:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

if "jax" in sys.modules:
    import jax

    if jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute gates (pod-scale compile subprocesses)"
    )
    config.addinivalue_line(
        "markers",
        "overlap: rdma_overlap harness tests — a measured-negative "
        "mechanism kept for reproducibility, with P<=4 interpreter "
        "carve-outs (PERF_NOTES round-3 deadlock); deselect with "
        "-m 'not overlap' to run the main paths free of its "
        "environment idiosyncrasies (VERDICT r3 weak point 4)",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
