"""Stage-1 v2: the SWAR Pallas kernel (superseded by v3/v4; kept
as the documented evolution step and as a differential twin).

v1 (stage1_pallas.py) upcasts every byte to an int32 lane — correct but
4x the VPU traffic. v2 keeps bytes packed 4-per-lane and classifies with
exact SWAR byte-equality (ops/swar.py), so each VPU op covers 4 input
bytes; the two prefix scans can ride the MXU as bf16 matmuls, freeing
the VPU for the byte work:

  per (T, 128)-word tile (= T*512 input bytes):
    classify:      SWAR zero-byte detectors -> 0x80 flags per byte
    in-word scan:  p ^= p<<8; p ^= p<<16   (2 ops, replaces 7-step scan)
    lane scan:     word-parity (T,128) bf16 @ strict-upper-ones(128,128)
                   on the MXU -> exclusive lane prefix
    row scan:      row parity (T,1): log-step masked-roll or
                   strict-lower-ones (T,T) matmul (selectable)
    carry:         quote parity across tiles via SMEM (sequential grid)
    mask+pack:     struct & ~in_quote, then 4 flag bits/word packed over
                   8 sublanes -> (T/8, 128) int32 words

v2 word layout: output word (g, lane), bit (8*b + r) covers flat byte
position ((g*8 + r) * 128 + lane) * 4 + b  (b = byte-in-word 0..3,
r = row-in-group 0..7). `unpack_words_v2_host` inverts it.

Reference lineage: this fuses the same pipeline as avx/stage1.rs:193-430
(classify -> clmul prefix-xor -> mask) + crush popcounts; the SWAR
equality replaces the nibble-LUT vpshufb, and the matmul scans replace
PCLMULQDQ (prefix-XOR is an associative scan; SURVEY.md §7.1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DEFAULT_DIALECT, Dialect
from .swar import (
    swar_broadcast_flag,
    swar_eq,
    swar_popcount_flags,
    swar_prefix_xor_bytes,
    swar_word_parity,
)

LANES = 128
DEFAULT_ROW_TILE_V2 = 512  # x 512 B/row = 256 KiB of input per tile


def _row_scan_roll(row_par: jnp.ndarray, tile: int) -> jnp.ndarray:
    """Exclusive prefix-sum over rows of a (T,1) int32 column via
    log-step masked circular rolls."""
    x = row_par
    ridx = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    s = 1
    while s < tile:
        x = x + jnp.where(ridx >= s, pltpu.roll(x, s, 0), 0)
        s *= 2
    return x - row_par


def _stage1_v2_kernel(
    carry_in_ref, w_ref, triu_ref, tril_ref, packed_ref, count_ref,
    parity_ref, carry_sm, *, dialect: Dialect, tile: int, row_scan: str
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_sm[0] = carry_in_ref[0]
        carry_sm[1] = 0

    x = w_ref[:]  # (T, 128) int32, 4 bytes per lane
    qf = swar_eq(x, dialect.quote)
    sf = swar_eq(x, dialect.delimiter)
    for nl in dialect.newlines:
        sf = sf | swar_eq(x, nl)

    # in-word inclusive quote parity per byte (0x80 flags)
    p_in = swar_prefix_xor_bytes(qf)
    wp = swar_word_parity(p_in)  # (T, 128) 0/1 whole-word parity

    # exclusive prefix of word parities across lanes (MXU)
    excl_lane = jax.lax.dot_general(
        wp.astype(jnp.bfloat16),
        triu_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)

    # row-inclusive parity and exclusive prefix across rows
    row_tot = excl_lane[:, LANES - 1 :] + wp[:, LANES - 1 :]  # (T,1) counts
    if row_scan == "roll":
        row_excl = _row_scan_roll(row_tot, tile)
    else:  # "tril" — MXU
        row_excl = jax.lax.dot_general(
            tril_ref[:],
            row_tot.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)

    base_par = (excl_lane + row_excl + carry_sm[0]) & 1  # parity before word
    inq = p_in ^ swar_broadcast_flag(base_par)  # 0x80 in-quote per byte
    masked = sf & ~inq

    # pack 4 flag bits/word over 8 sublane rows -> one int32 word
    t = (masked >> 7) & 0x01010101  # bits 0,8,16,24
    sh = jax.lax.broadcasted_iota(jnp.int32, (tile, LANES), 0) % 8
    t = t << sh
    packed_ref[:] = jnp.sum(
        t.reshape(tile // 8, 8, LANES), axis=1, dtype=jnp.int32
    )

    new_count = carry_sm[1] + jnp.sum(swar_popcount_flags(masked))
    carry_sm[1] = new_count
    count_ref[0, 0] = new_count
    new_carry = (carry_sm[0] + jnp.sum(wp)) & 1
    carry_sm[0] = new_carry
    parity_ref[0, 0] = new_carry


@functools.partial(
    jax.jit, static_argnames=("dialect", "row_tile", "row_scan", "interpret")
)
def stage1_pallas_v2(
    w2d: jnp.ndarray,
    carry_in,
    dialect: Dialect = DEFAULT_DIALECT,
    row_tile: int = DEFAULT_ROW_TILE_V2,
    row_scan: str = "roll",
    interpret: bool = False,
):
    """(rows, 128) int32 byte-quad words + carry parity ->
    (packed (rows//8, 128) int32, count, parity_out)."""
    rows, lanes = w2d.shape
    assert lanes == LANES and rows % 8 == 0, (rows, lanes)
    tile = min(row_tile, rows)
    assert rows % tile == 0, (rows, tile)
    grid = rows // tile

    # strict upper-triangular ones: U[k, j] = 1 iff k < j (exclusive scan)
    triu = jnp.asarray(np.triu(np.ones((LANES, LANES), np.float32), 1), jnp.bfloat16)
    if row_scan == "tril":
        tril = jnp.asarray(
            np.tril(np.ones((tile, tile), np.float32), -1), jnp.bfloat16
        )
    else:  # dummy minimal block; the roll path never reads it
        tril = jnp.zeros((16, LANES), jnp.bfloat16)

    kernel = functools.partial(
        _stage1_v2_kernel, dialect=dialect, tile=tile, row_scan=row_scan
    )
    carry_arr = jnp.asarray(carry_in, jnp.int32).reshape(1)

    packed, count, parity = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tril.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile // 8, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows // 8, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
        interpret=interpret,
    )(carry_arr, w2d, triu, tril)
    return packed, count[0, 0], parity[0, 0]


def stage1_swar_jnp(w2d: jnp.ndarray, carry_in, dialect: Dialect = DEFAULT_DIALECT):
    """Pure-jnp twin of the v2 kernel: identical SWAR math and word
    layout, compiled by XLA for any platform. Used inside shard_map for
    the distributed build (each shard runs this or the Pallas kernel on
    its local rows) and as the CPU-runnable differential check.

    Returns (packed (rows//8, 128) int32, count, parity_out)."""
    rows, lanes = w2d.shape
    x = w2d
    qf = swar_eq(x, dialect.quote)
    sf = swar_eq(x, dialect.delimiter)
    for nl in dialect.newlines:
        sf = sf | swar_eq(x, nl)
    p_in = swar_prefix_xor_bytes(qf)
    wp = swar_word_parity(p_in)
    # lane-exclusive prefix of word parities (log-step shift-add)
    incl = wp
    s = 1
    while s < lanes:
        incl = incl + jnp.pad(incl, ((0, 0), (s, 0)))[:, :lanes]
        s *= 2
    excl_lane = incl - wp
    row_tot = incl[:, lanes - 1]
    row_excl = (jnp.cumsum(row_tot) - row_tot)[:, None]
    base = (excl_lane + row_excl + carry_in) & 1
    inq = p_in ^ swar_broadcast_flag(base)
    masked = sf & ~inq
    t = (masked >> 7) & 0x01010101
    sh = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0) % 8
    t = t << sh
    packed = jnp.sum(t.reshape(rows // 8, 8, lanes), axis=1, dtype=jnp.int32)
    count = jnp.sum(swar_popcount_flags(masked))
    parity = (jnp.sum(wp) + carry_in) & 1
    return packed, count, parity


def pad_to_words(arr: np.ndarray, row_align: int = 512) -> np.ndarray:
    """uint8 1-D -> zero-padded (rows, 128) int32 little-endian byte-quad
    words; rows bucketed like index.pad_to_grid."""
    n = arr.size
    row_bytes = LANES * 4
    rows = max(-(-n // row_bytes), 1)
    rows = -(-rows // row_align) * row_align
    if rows <= 8192:
        bucket = row_align
        while bucket < rows:
            bucket *= 2
        rows = bucket
    else:
        rows = -(-rows // 8192) * 8192
    padded = np.zeros(rows * row_bytes, dtype=np.uint8)
    padded[:n] = arr
    return padded.view("<i4").reshape(rows, LANES)


def unpack_words_v2_host(packed: np.ndarray, n_bytes: int) -> np.ndarray:
    """(rows//8, 128) int32 v2 words -> flat 0/1 uint8 mask of n_bytes.

    Bit (8*b + r) of word (g, lane) covers flat byte
    ((g*8 + r) * 128 + lane) * 4 + b."""
    groups, lanes = packed.shape
    shifts = 8 * np.arange(4)[None, :] + np.arange(8)[:, None]  # (r=8, b=4)
    bits = (packed[:, None, :, None] >> shifts[None, :, None, :]) & 1  # (G,8,L,4)
    return bits.reshape(-1)[:n_bytes].astype(np.uint8)
