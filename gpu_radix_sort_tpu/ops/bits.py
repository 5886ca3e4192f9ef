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


def encode_ordered(x: jnp.ndarray) -> jnp.ndarray:
    """Order-preserving bijection from int32 / float32 / uint32 keys onto
    uint32, so every u32 sort engine in this package serves typed keys.

    * uint32: identity.
    * int32:  flip the sign bit (two's complement order -> unsigned order).
    * float32: IEEE-754 totalOrder (the radix-sort classic): positive
      floats get the sign bit set; negative floats are fully complemented
      (reverses their order and places them below positives).  -0.0
      orders below +0.0; positive NaNs sort above +inf and NEGATIVE NaNs
      below -inf (totalOrder semantics — np.sort instead moves every NaN
      last) — a TOTAL order refining the usual float comparison.

    Beyond the reference (uint32-only keys, libsort.h:19); standard radix
    technique, exposed so sort_full/sort_key_value accept typed keys.
    """
    import jax.numpy as jnp_

    dt = x.dtype
    if dt == jnp_.uint32:
        return x
    if dt == jnp_.int32:
        return (x.view(jnp_.uint32)) ^ jnp_.uint32(0x80000000)
    if dt == jnp_.float32:
        u = x.view(jnp_.uint32)
        mask = jnp_.where(
            (u >> jnp_.uint32(31)) != 0,
            jnp_.uint32(0xFFFFFFFF),
            jnp_.uint32(0x80000000),
        )
        return u ^ mask
    raise TypeError(f"unsupported key dtype {dt}; use uint32/int32/float32")


def decode_ordered(u: jnp.ndarray, dtype) -> jnp.ndarray:
    """Inverse of :func:`encode_ordered` for the given original dtype."""
    import jax.numpy as jnp_

    dtype = jnp_.dtype(dtype)
    if dtype == jnp_.uint32:
        return u
    if dtype == jnp_.int32:
        return (u ^ jnp_.uint32(0x80000000)).view(jnp_.int32)
    if dtype == jnp_.float32:
        mask = jnp_.where(
            (u >> jnp_.uint32(31)) != 0,
            jnp_.uint32(0x80000000),
            jnp_.uint32(0xFFFFFFFF),
        )
        return (u ^ mask).view(jnp_.float32)
    raise TypeError(f"unsupported key dtype {dtype}")


def encode_ordered_np(x):
    """numpy twin of :func:`encode_ordered` for host-side wrappers (the
    distributed entry points encode before padding/sharding so
    out-of-core-scale arrays never round-trip through the device)."""
    import numpy as np

    dt = x.dtype
    if dt == np.uint32:
        return x
    if dt == np.int32:
        return x.view(np.uint32) ^ np.uint32(0x80000000)
    if dt == np.float32:
        u = x.view(np.uint32)
        mask = np.where(
            (u >> np.uint32(31)) != 0,
            np.uint32(0xFFFFFFFF),
            np.uint32(0x80000000),
        )
        return u ^ mask
    raise TypeError(f"unsupported key dtype {dt}; use uint32/int32/float32")


def decode_ordered_np(u, dtype):
    """numpy inverse of :func:`encode_ordered_np`."""
    import numpy as np

    dtype = np.dtype(dtype)
    if dtype == np.uint32:
        return u
    if dtype == np.int32:
        return (u ^ np.uint32(0x80000000)).view(np.int32)
    if dtype == np.float32:
        mask = np.where(
            (u >> np.uint32(31)) != 0,
            np.uint32(0x80000000),
            np.uint32(0xFFFFFFFF),
        )
        return (u ^ mask).view(np.float32)
    raise TypeError(f"unsupported key dtype {dtype}")


def encode_ordered_np64(x):
    """Order-preserving bijection from uint64 / int64 / float64 keys onto
    uint64 (numpy, host-side) — the 64-bit twin of
    :func:`encode_ordered_np`; float64 gets IEEE-754 totalOrder."""
    import numpy as np

    dt = x.dtype
    if dt == np.uint64:
        return x
    if dt == np.int64:
        return x.view(np.uint64) ^ np.uint64(1 << 63)
    if dt == np.float64:
        u = x.view(np.uint64)
        mask = np.where(
            (u >> np.uint64(63)) != 0,
            np.uint64(0xFFFFFFFFFFFFFFFF),
            np.uint64(1 << 63),
        )
        return u ^ mask
    raise TypeError(f"unsupported key dtype {dt}; use uint64/int64/float64")


def decode_ordered_np64(u, dtype):
    """numpy inverse of :func:`encode_ordered_np64`."""
    import numpy as np

    dtype = np.dtype(dtype)
    if dtype == np.uint64:
        return u
    if dtype == np.int64:
        return (u ^ np.uint64(1 << 63)).view(np.int64)
    if dtype == np.float64:
        mask = np.where(
            (u >> np.uint64(63)) != 0,
            np.uint64(1 << 63),
            np.uint64(0xFFFFFFFFFFFFFFFF),
        )
        return (u ^ mask).view(np.float64)
    raise TypeError(f"unsupported key dtype {dtype}")
