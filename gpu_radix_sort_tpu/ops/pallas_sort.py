"""Pallas TPU radix-sort kernels (single chip).

TPU-native replacement for the reference CUDA kernel pipeline
(gpu_radix_sort_local + sum_scan_blelloch + gpu_glbl_shuffle,
libsort/sort.cu + scan.cu): per-tile digit histograms, a grid-level
exclusive scan, and a run-coalesced scatter that moves contiguous per-digit
runs with DMA instead of per-element stores.

This module is being built up incrementally; ``supported`` gates the
strategy dispatcher in ops/radix_sort.py so "auto" falls back to XLA until
a given shape/backend is handled here.
"""

from __future__ import annotations


def supported(n: int) -> bool:  # noqa: ARG001 - shape gating arrives with kernels
    return False


def sort_full(keys):
    raise NotImplementedError("pallas strategy not yet available for this shape")


def sort_by_digits(keys, offset, width):
    raise NotImplementedError("pallas strategy not yet available for this shape")
