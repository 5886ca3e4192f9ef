"""Data-plane helpers: PartRef gather.

Reference analog: FetchPartRefs (benchmark/pkg/data/helpers.go:10-38) and
pylibsort's readPartRefs (faasTest/pylibsort/data.py:265-278): assemble a
list of byte-range references into one contiguous buffer — the input
assembly step of every distributed worker.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from .interface import PartRef, iter_refs_bytes


def fetch_part_refs(refs: Sequence[PartRef]) -> bytearray:
    """Gather the referenced byte ranges, in order, into one buffer."""
    total = sum(r.nbyte for r in refs)
    out = bytearray(total)
    pos = 0
    for chunk in iter_refs_bytes(refs):
        out[pos : pos + len(chunk)] = chunk
        pos += len(chunk)
    return out


def fetch_part_refs_u32(refs: Sequence[PartRef]) -> np.ndarray:
    """Gather byte ranges and view as uint32 keys (the canonical unit
    conversion at the data-plane/sort edge; every nbyte must be 4-aligned)."""
    buf = fetch_part_refs(refs)
    if len(buf) % 4:
        raise ValueError(f"gathered {len(buf)} bytes, not a multiple of 4")
    # zero-copy view — bytes(buf) would duplicate the whole gather, which
    # is gigabytes in the out-of-core configurations
    return np.frombuffer(buf, dtype=np.uint32)
