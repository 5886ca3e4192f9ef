"""BucketReader: bucket-major traversal over a list of DistribArrays.

Reference analog: benchmark/pkg/sort/helpers.go:31-161.  After a round of
the distributed radix sort, each worker's output array holds 2^width
partitions (one per digit bucket).  The *merge/repartition* step of the next
round reads same-digit buckets contiguously across workers:

  * STRIDED — partition 0 of every array, then partition 1 of every array, …
    (helpers.go:67-78): this is what concatenates per-digit buckets across
    workers so the global order invariant holds into the next round.
  * INORDER — all partitions of array 0, then array 1, … (array-major).

Two consumption modes, as in the reference:

  * ``read(n)``     — io.Reader-style byte stream in traversal order.
  * ``read_ref(sz)``— emit PartRefs covering the next ``sz`` bytes WITHOUT
    copying (helpers.go:94-121) — the byte-balanced worker-shard split of
    the round loop (distrib.go:113-140) passes data by reference only.
"""

from __future__ import annotations

import enum
from typing import Sequence

from ..data.interface import DistribArray, PartRef


class ReadOrder(enum.Enum):
    INORDER = "inorder"
    STRIDED = "strided"


class BucketReader:
    def __init__(self, arrays: Sequence[DistribArray], order: ReadOrder):
        self._order = order
        # Snapshot traversal plan: (arr, part_idx, committed_len) in order.
        plan: list[tuple[DistribArray, int, int]] = []
        shapes = [(a, a.get_shape()) for a in arrays]
        if order is ReadOrder.STRIDED:
            max_np = max((s.npart for _, s in shapes), default=0)
            for p in range(max_np):
                for a, s in shapes:
                    if p < s.npart:
                        plan.append((a, p, s.len(p)))
        else:
            for a, s in shapes:
                for p in range(s.npart):
                    plan.append((a, p, s.len(p)))
        self._plan = plan
        self._seq = 0  # index into plan
        self._off = 0  # byte offset within current partition

    @property
    def total_bytes(self) -> int:
        return sum(ln for _, _, ln in self._plan)

    def _advance_past_empty(self) -> bool:
        """Position on a partition with remaining bytes; False at EOF."""
        while self._seq < len(self._plan):
            if self._off < self._plan[self._seq][2]:
                return True
            self._seq += 1
            self._off = 0
        return False

    def read_ref(self, sz: int) -> list[PartRef]:
        """PartRefs covering the next ``sz`` bytes (fewer at EOF); zero-copy
        (reference: ReadRef, helpers.go:94-121)."""
        refs: list[PartRef] = []
        remaining = sz
        while remaining > 0 and self._advance_past_empty():
            arr, part, ln = self._plan[self._seq]
            take = min(remaining, ln - self._off)
            refs.append(PartRef(arr, part, self._off, take))
            self._off += take
            remaining -= take
        return refs

    def read(self, n: int = -1) -> bytes:
        """Next ``n`` bytes in traversal order (all remaining if n < 0)."""
        if n is None or n < 0:
            n = self.total_bytes  # upper bound; loop stops at EOF
        chunks: list[bytes] = []
        got = 0
        while got < n and self._advance_past_empty():
            arr, part, ln = self._plan[self._seq]
            take = min(n - got, ln - self._off)
            with arr.get_part_range_reader(
                part, self._off, self._off + take
            ) as r:
                chunk = r.read()
            if len(chunk) != take:
                raise IOError(
                    f"short read from {arr.name}[{part}]: want {take}, "
                    f"got {len(chunk)}"
                )
            chunks.append(chunk)
            self._off += take
            got += take
        return b"".join(chunks)
