"""Fused Pallas TPU stage-1 kernel: bytes -> packed structural bitmask.

This is the production hot path — the TPU-native redesign of the
reference's 64-byte SSE kernel (avx/stage1.rs:193-430). One kernel fuses
everything the reference spreads over classify/clmul/mask/extract calls so
each input byte is read from HBM exactly once:

  classify (VPU compares, not a vpshufb LUT emulation)
  -> in-quote parity (two-level log-step prefix scan: 7 shift-adds along
     the 128-lane axis, log2(tile_rows) shift-adds along sublanes — the
     associative generalisation of the reference's PCLMULQDQ prefix XOR)
  -> structural AND NOT in-quote
  -> bitmask pack along sublanes into uint32 words (TPUs have no movemask;
     32 consecutive rows of a lane pack into one word, bit k = row s*32+k)
  -> per-tile structural counts (for downstream compaction sizing)

Quote parity carries across grid steps through SMEM scratch — TPU grids
execute sequentially on a core, which is exactly the role the reference's
`in_string` i64 carry plays across its block loop (reader.rs:218,239,284).

Word bit-order convention: word (s, lane) of the output holds flat byte
positions (s*32 + k) * 128 + lane for k = bit 0..31 — the sublane-major
pack. `unpack_words_host` / `unpack_words_device` invert it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DEFAULT_DIALECT, Dialect

LANES = 128
DEFAULT_ROW_TILE = 1024


def _lane_inclusive_scan(x: jnp.ndarray) -> jnp.ndarray:
    """Hillis-Steele inclusive prefix sum along the lane axis (last dim)."""
    lanes = x.shape[-1]
    shift = 1
    while shift < lanes:
        x = x + jnp.pad(x, ((0, 0), (shift, 0)))[:, :lanes]
        shift *= 2
    return x


def _sublane_exclusive_scan_mxu(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive prefix sum along the sublane axis (dim 0) of a (rows, 1)
    int32 column, as a strict-lower-triangular matmul on the MXU.

    Mosaic cannot lower sublane-axis pad/concat shifts (the Hillis-Steele
    pattern that works along lanes), but a (rows, rows) @ (rows, 1) matmul
    is native. Values here are per-row quote counts (<= 128 * rows), far
    inside f32's exact-integer range for any practical tile."""
    rows = x.shape[0]
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    tril_strict = (c < r).astype(jnp.float32)
    out = jax.lax.dot_general(
        tril_strict,
        x.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(jnp.int32)


def _stage1_kernel(carry_in_ref, b_ref, words_ref, count_ref, parity_ref, carry_sm,
                   *, dialect: Dialect):
    # carry_sm: [0] = quote parity carried across grid steps,
    #           [1] = running structural count.
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_sm[0] = carry_in_ref[0]
        carry_sm[1] = 0

    # Upcast the byte tile once: 8-bit vector compares/selects crash this
    # Mosaic toolchain, and int32 is the VPU's native register width anyway.
    b = b_ref[:].astype(jnp.int32)  # (T, 128)
    nl = b == dialect.newlines[0]
    for extra in dialect.newlines[1:]:
        nl = nl | (b == extra)
    struct = nl | (b == dialect.delimiter)
    quote = b == dialect.quote

    q = quote.astype(jnp.int32)
    within = _lane_inclusive_scan(q)  # (T, 128) inclusive per row
    row_tot = within[:, LANES - 1 :]  # (T, 1)
    row_excl = _sublane_exclusive_scan_mxu(row_tot)  # (T, 1)

    carry = carry_sm[0]
    parity = (within + row_excl + carry) & 1  # (T, 128) inclusive in-quote
    masked = jnp.where(struct & (parity == 0), jnp.int32(1), jnp.int32(0))

    # pack along sublanes: bit k of word (s, lane) = masked[s*32+k, lane].
    # int32 arithmetic throughout (Mosaic has no unsigned reductions): the
    # bit-31 contribution is INT32_MIN and the sum of distinct powers of
    # two reconstructs the exact two's-complement bit pattern.
    t = masked.shape[0]
    shifts = jax.lax.broadcasted_iota(jnp.int32, (t, LANES), 0) % 32
    contrib = masked << shifts
    words = jnp.sum(contrib.reshape(t // 32, 32, LANES), axis=1, dtype=jnp.int32)
    words_ref[:] = words

    new_count = carry_sm[1] + jnp.sum(masked)
    carry_sm[1] = new_count
    count_ref[0, 0] = new_count
    new_carry = (carry + jnp.sum(q)) & 1
    carry_sm[0] = new_carry
    parity_ref[0, 0] = new_carry


@functools.partial(
    jax.jit, static_argnames=("dialect", "row_tile", "interpret")
)
def stage1_pallas(
    b2d: jnp.ndarray,
    carry_in,
    dialect: Dialect = DEFAULT_DIALECT,
    row_tile: int = DEFAULT_ROW_TILE,
    interpret: bool = False,
):
    """(rows, 128) uint8 + carry parity -> (words (rows//32, 128) int32
    bit patterns, total structural count int32, parity_out int32 scalar).

    rows must be a multiple of 32; the tile divides rows (callers pad via
    `index.pad_to_grid`, which buckets row counts to powers of two).
    """
    rows, lanes = b2d.shape
    assert lanes == LANES and rows % 32 == 0, (rows, lanes)
    tile = min(row_tile, rows)
    assert rows % tile == 0, (rows, tile)
    grid = rows // tile

    kernel = functools.partial(_stage1_kernel, dialect=dialect)
    carry_arr = jnp.asarray(carry_in, jnp.int32).reshape(1)

    words, counts, parity = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # carry_in, whole (1,)
            pl.BlockSpec((tile, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile // 32, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows // 32, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
        interpret=interpret,
    )(carry_arr, b2d)
    return words, counts[0, 0], parity[0, 0]


# The word layout is the canonical sublane-major pack; inverses live in
# ops.pack (unpack_words_host / unpack_words_device).
