"""Pallas TPU sort kernels (single chip, VMEM-resident shapes).

TPU-native counterpart of the reference's kernel layer (the block-local
bitonic machinery of gpu_radix_sort_local, libsort/sort.cu:29-184, whose
2-bit width is a GPU shared-memory artifact): a full bitonic sorting
network executed entirely in VMEM on the (sublane, lane) tile layout.

Why bitonic, and why VMEM-bounded: on this toolchain in-kernel scatter is
unsupported and gathers are limited to (8,128) blocks (docs/PERF_NOTES.md
capability map), so a radix pass cannot be expressed in-kernel; a bitonic
network needs only static cyclic rotations (pltpu.roll), elementwise
min/max, and iota masks — all Mosaic-safe.  The network is O(n log^2 n)
VPU work but every stage runs at register/VMEM speed with zero HBM
round-trips, which is exactly the regime where it wins: arrays small
enough to live in VMEM, where `lax.sort`'s HBM-staged machinery is
latency-bound.  Larger arrays fall back to XLA sort (ops/radix_sort.py
dispatches via :func:`supported`); the HBM-scale Pallas merge path is
modeled in docs/PERF_NOTES.md as a later project.

Stability: bitonic networks are not stable, so the digit sort
(:func:`sort_by_digits`) sorts composite keys ``digit << ceil_log2(n) | i``
— unique keys make any comparison sort stable — moving the payload (the
original key) through the network alongside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .bits import KEY_DTYPE, validate_digit_range

LANES = 128
MIN_N = 8 * LANES  # one (8, 128) tile
# Scoped-VMEM ceiling: the unrolled network's live rotation temporaries
# scale with rows; (2048,128) u32 blows the 16 MiB scoped limit (measured:
# 21.7 MiB).  Keys-only tops out at 2^17; the kv network carries two
# operands, so half that.
MAX_N = 1 << 17
MAX_N_KV = 1 << 16
# Measured on TPU v5e (repeat-chain device timing): pallas ~132us/sort flat
# vs lax.sort 125->188us growing with n; crossover near 2^15.
AUTO_MIN_N = 1 << 15
# numpy scalar, NOT jnp: a module-scope jax array would initialize the
# backend at import time, locking the process onto the tunneled TPU before
# callers can pin the platform (CLAUDE.md env gotcha).
PAD = np.uint32(0xFFFFFFFF)


def _tpu_roll(x, shift: int, axis: int):
    """Static cyclic rotation; pltpu.roll on TPU, jnp.roll in interpret.

    pltpu.roll rejects negative shifts — normalize mod the axis size.
    (Without this the except-branch silently used jnp.roll for every
    negative shift, measured 1.49x slower per network on v5e.)"""
    try:
        from jax.experimental.pallas import tpu as pltpu

        return pltpu.roll(x, shift % x.shape[axis], axis)
    except Exception:  # interpret mode / non-TPU lowering
        return jnp.roll(x, shift, axis=axis)


def _compare_exchange(vals: tuple, idx, j: int, k: int, interpret: bool):
    """One bitonic stage: exchange partner = index ^ j; ascending iff bit k
    of the index is 0.  vals[0] is the comparison key; all operands move
    together."""
    roll = jnp.roll if interpret else _tpu_roll
    if j < LANES:
        axis, amt = 1, j
        upper = (idx & j) == 0  # partner is at +j
    else:
        axis, amt = 0, j // LANES
        upper = (idx & j) == 0
    asc = (idx & (1 << k)) == 0
    keep_min = asc == upper

    key = vals[0]
    partner_key = jnp.where(
        upper, roll(key, -amt, axis), roll(key, amt, axis)
    )
    take_self = keep_min == (key <= partner_key)
    # Tie handling: when key == partner_key, take_self must still pick one
    # side consistently; (key <= partner) makes min-side keep self on ties
    # and max-side take partner — partner carries the identical key, and
    # secondary operands follow the same selector, so for the kv network
    # ties are broken by the (unique) composite key, never reached here.
    out = []
    for i, v in enumerate(vals):
        # the key's partner is already materialized for the comparison —
        # reuse it (halves the rolls of keys-only networks)
        pv = partner_key if i == 0 else jnp.where(
            upper, roll(v, -amt, axis), roll(v, amt, axis)
        )
        out.append(jnp.where(take_self, v, pv))
    return tuple(out)


def _bitonic_body(n: int, operands: tuple, interpret: bool,
                  start_log: int = 0):
    """CONTRACT: with len(operands) > 1 the comparison keys (operands[0])
    MUST be pairwise unique.  On a tie both sides of a compare-exchange
    resolve to the same source row (_compare_exchange's min-side keeps self,
    max-side takes partner — same row), duplicating one secondary payload
    and dropping the other.  Current multi-operand callers satisfy this by
    construction (composite digit|position keys in sort_by_digits); any new
    caller must too, or make tie selection index-symmetric first.

    ``start_log`` (keys-only): skip phases 1..start_log — the input must
    already hold runs of 2^start_log keys each sorted ascending in the
    STORED (complemented-by-run-parity) domain; see _bitonic_body_keys."""
    R = n // LANES
    r = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    idx = r * LANES + c
    log_n = n.bit_length() - 1
    if len(operands) == 1:
        return (
            _bitonic_body_keys(
                idx, log_n, operands[0], interpret, start_log
            ),
        )
    if start_log:
        raise NotImplementedError("start_log is keys-only")
    vals = operands
    for k in range(1, log_n + 1):
        for j_log in range(k - 1, -1, -1):
            vals = _compare_exchange(vals, idx, 1 << j_log, k, interpret)
    return vals


def _bitonic_body_keys(idx, log_n: int, x, interpret: bool,
                       start_log: int = 0):
    """Keys-only network in the SIGNED domain with per-phase direction
    flips: x ^ 0x8000_0000 bitcast to int32 is an order-isomorphism from
    uint32, Mosaic legalizes signed vector min/max (arith.minsi) where
    unsigned fails, and order-reversal is bitwise NOT — so complementing
    the descending regions at each phase boundary (ONE fused select per
    phase: regions where the direction bit CHANGED) makes every stage
    pure-ascending: 2 rolls + min + max + pick, with no partner select and
    no direction logic.  Exchange partners (index ^ j, j < 2^k) never
    cross a 2^k direction region, so flipped regions only compare among
    themselves.  Measured on the v5e tile sort as the successor of the
    cmp+select formulation (docs/PERF_NOTES.md round-3 late addendum).

    ``start_log`` > 0 enters the network at phase start_log+1, skipping
    the first sum(1..start_log) stages: the input must hold runs of
    2^start_log keys, each ascending in the STORED domain — i.e. run r
    sorted ascending on (value ^ (bit start_log of flat index ? ~0 : 0)),
    exactly the state the skipped phases would have left.  Callers
    produce it with one batched XLA row sort of the parity-complemented
    values (pallas_merge.sort_tiles(prerun=...))."""
    roll = jnp.roll if interpret else _tpu_roll
    sign = np.uint32(0x80000000)
    x = jax.lax.bitcast_convert_type(x ^ sign, jnp.int32)
    if start_log > 0:
        desc = (idx & (1 << start_log)) != 0
    else:
        desc = jnp.zeros(idx.shape, bool)
    for k in range(start_log + 1, log_n + 1):
        # direction of phase k: descending where bit k of the index is set
        # (the final phase has that bit beyond the index range: ascending
        # everywhere, so the network ends fully un-complemented)
        new_desc = (idx & (1 << k)) != 0
        x = jnp.where(desc != new_desc, ~x, x)
        desc = new_desc
        for j_log in range(k - 1, -1, -1):
            j = 1 << j_log
            axis, amt = (1, j) if j < LANES else (0, j // LANES)
            lo = jnp.minimum(x, roll(x, -amt, axis))
            hi = jnp.maximum(x, roll(x, amt, axis))
            x = jnp.where((idx & j) == 0, lo, hi)
    return jax.lax.bitcast_convert_type(x, KEY_DTYPE) ^ sign


def _sort_kernel(x_ref, o_ref, *, n: int, interpret: bool):
    (out,) = _bitonic_body(n, (x_ref[...],), interpret)
    o_ref[...] = out


def _sort_kv_kernel(k_ref, v_ref, ok_ref, ov_ref, *, n: int, interpret: bool):
    keys, vals = _bitonic_body(n, (k_ref[...], v_ref[...]), interpret)
    ok_ref[...] = keys
    ov_ref[...] = vals


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _padded_size(n: int) -> int:
    p = max(MIN_N, 1 << max(n - 1, 1).bit_length())
    return p


def supported(n: int, kind: str = "full") -> bool:
    """Shapes the ``auto`` strategy routes here: the measured win window on
    a real TPU (VMEM-resident, above the lax.sort crossover).  Explicit
    ``strategy="pallas"`` accepts the full MAX_N/MAX_N_KV range on any
    backend (non-TPU backends execute in interpret mode, for tests)."""
    hi = MAX_N if kind == "full" else MAX_N_KV
    return AUTO_MIN_N <= n <= hi and not _interpret()


@functools.lru_cache(maxsize=None)
def _full_sort_call(n_pad: int, interpret: bool):
    R = n_pad // LANES
    kernel = functools.partial(_sort_kernel, n=n_pad, interpret=interpret)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, LANES), KEY_DTYPE),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _kv_sort_call(n_pad: int, interpret: bool):
    R = n_pad // LANES
    kernel = functools.partial(_sort_kv_kernel, n=n_pad, interpret=interpret)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((R, LANES), KEY_DTYPE),
            jax.ShapeDtypeStruct((R, LANES), KEY_DTYPE),
        ),
        interpret=interpret,
    )


def sort_full(keys: jnp.ndarray) -> jnp.ndarray:
    """Ascending sort via the VMEM bitonic network."""
    n = keys.shape[0]
    if not 0 < n <= MAX_N:
        raise NotImplementedError(f"pallas sort supports n <= {MAX_N}, got {n}")
    n_pad = _padded_size(n)
    padded = jnp.concatenate(
        [keys.astype(KEY_DTYPE), jnp.full((n_pad - n,), PAD, KEY_DTYPE)]
    )
    out = _full_sort_call(n_pad, _interpret())(padded.reshape(-1, LANES))
    return out.reshape(-1)[:n]


def sort_by_digits(keys: jnp.ndarray, offset: int, width: int) -> jnp.ndarray:
    """Stable sort by bits [offset, offset+width) via composite-key bitonic
    kv network (digit in the high bits, original position in the low bits
    makes every comparison key unique, hence stable)."""
    validate_digit_range(offset, width)
    n = keys.shape[0]
    if not 0 < n <= MAX_N_KV:
        raise NotImplementedError(
            f"pallas digit sort supports n <= {MAX_N_KV}, got {n}"
        )
    n_pad = _padded_size(n)
    pos_bits = n_pad.bit_length() - 1
    # Strict <: composite values then stay below 2^31 < PAD, so padding can
    # never tie with a real composite (bitonic ties are unordered).
    if width + pos_bits >= 32:
        raise NotImplementedError(
            f"width {width} + position bits {pos_bits} must be < 32; use "
            "the xla strategy"
        )
    from .bits import extract_digits

    keys = keys.astype(KEY_DTYPE)
    digits = extract_digits(keys, offset, width)
    iota = jnp.arange(n, dtype=KEY_DTYPE)
    composite = jnp.concatenate(
        [
            (digits << KEY_DTYPE(pos_bits)) | iota,
            jnp.full((n_pad - n,), PAD, KEY_DTYPE),
        ]
    )
    payload = jnp.concatenate(
        [keys, jnp.zeros((n_pad - n,), KEY_DTYPE)]
    )
    _, out = _kv_sort_call(n_pad, _interpret())(
        composite.reshape(-1, LANES), payload.reshape(-1, LANES)
    )
    return out.reshape(-1)[:n]
