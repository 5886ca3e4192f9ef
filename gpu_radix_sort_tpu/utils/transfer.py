"""Device→host transfer helpers for tunneled TPU runtimes.

The reference pays PCIe H2D/D2H per round (~320ms/GiB each way,
analysis/libsort8b.csv:7-8 — SURVEY.md §6).  On this runtime the
device→host direction is the narrow edge (~20 MB/s single-stream through
the relay vs ~100 MB/s host→device); fetching a large array as concurrent
chunk streams measures ~1.6x faster (docs/PERF_NOTES.md round-2 addendum).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

# 32 MiB chunks: large enough to amortize per-fetch dispatch (~27ms),
# small enough that 4-8 streams interleave on the relay.
_CHUNK_BYTES = 32 << 20
_MAX_STREAMS = 8


def chunked_device_get(x, *, limit: int | None = None,
                       chunk_bytes: int = _CHUNK_BYTES,
                       max_streams: int = _MAX_STREAMS) -> np.ndarray:
    """Fetch a 1-D device array to host as parallel chunk streams.

    ``limit`` fetches only the first ``limit`` elements — chunks keep
    their uniform (compile-cached) shapes and at most one trailing chunk
    of excess crosses the wire, so pow2-padded workers don't pay up to 2x
    D2H for the pad tail.

    Falls back to a plain copy for host arrays and small transfers.
    Device-side slicing materializes chunk buffers (brief 2x HBM for the
    array) — callers moving multi-GiB results per round (the out-of-core
    storage plane) win far more on the wire than the slices cost.
    """
    import jax

    if not hasattr(x, "addressable_shards"):  # plain numpy already
        return np.asarray(x) if limit is None else np.asarray(x)[:limit]
    n = x.shape[0] if limit is None else min(limit, x.shape[0])
    rows_per = max(chunk_bytes // max(x.dtype.itemsize, 1), 1)
    if x.ndim != 1 or x.shape[0] <= rows_per:
        return np.asarray(x)[:n]
    slices = [x[i : i + rows_per] for i in range(0, n, rows_per)]
    jax.block_until_ready(slices)
    out = np.empty(n, dtype=x.dtype)
    starts = range(0, n, rows_per)
    with ThreadPoolExecutor(min(max_streams, len(slices))) as pool:
        for i, chunk in zip(starts, pool.map(np.asarray, slices)):
            m = min(chunk.shape[0], n - i)  # trailing chunk may pass limit
            out[i : i + m] = chunk[:m]
    return out
