"""Digit/bit-field helpers shared by all sort strategies.

Reference analog: the ``group_bits`` macro (libsort/sort.cu:9) and the 2-bit
extraction inside the kernels (sort.cu:84).  Canonical unit everywhere in
this framework is *elements* (uint32 keys); byte offsets exist only inside
the storage layer (see data/interface.py), resolving the reference's mixed
element/byte conventions (libsort.h:19 vs benchmark/pkg/sort/libsort.go:58).
"""

from __future__ import annotations

import jax.numpy as jnp

KEY_DTYPE = jnp.uint32
KEY_BITS = 32


def validate_digit_range(offset: int, width: int) -> None:
    if not (0 < width <= KEY_BITS and 0 <= offset and offset + width <= KEY_BITS):
        raise ValueError(
            f"digit range [offset={offset}, offset+width={offset + width}) "
            f"must lie within [0, {KEY_BITS}) with width >= 1"
        )


def digit_mask(width: int) -> int:
    return 0xFFFFFFFF if width == KEY_BITS else (1 << width) - 1


def extract_digits(keys: jnp.ndarray, offset: int, width: int) -> jnp.ndarray:
    """bits [offset, offset+width) of each key, as uint32."""
    validate_digit_range(offset, width)
    keys = keys.astype(KEY_DTYPE)
    return (keys >> KEY_DTYPE(offset)) & KEY_DTYPE(digit_mask(width))
