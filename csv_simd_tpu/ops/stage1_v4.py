"""Stage-1 v4: the sequential-layout production kernel.

One fused pass: classify -> full-width quote scans -> mask -> MXU seq
pack, emitting the packed structural bitmask in SEQUENTIAL bit order —
the layout offsets-free serving needs (bit m of word (r, g) covers flat
byte r*512 + 32*g + m, identical to stage1_seq_xla), so a single kernel
feeds both counting and the production index artifact.

What changed vs the round-1 pair (stage1_v3.stage1_fused +
stage1_fused_seq), per tools/ablate2.py measurements:

- classify uses the shared-subexpression SWAR detector with the
  cleanup fused into the mask chain (swar_classify_raw): the low-7
  mask and bit-7 test are computed once for all four target chars
  (~20%), the mask runs in the 0x80 flag domain, and the classify's
  two flag-cleanup ANDs fold into the mask's single final
  & 0x80808080 (+10-13% then +3-5% same-batch; PERF_NOTES
  round-2-late); ONE logical right shift then yields clean 0x01
  flags for the pack;
- the quote-parity machinery is v3's proven full-width chain (in-word
  prefix-XOR + int8 MXU lane/row scans) — measured ablations showed
  scan/mask work on narrow (T,16) packed tensors lowers ~10x worse
  per element than full-width, so scanning BEFORE packing wins;
- the pack is the 4-bit nibble compress + MXU matmuls. Round-4
  default: pack_mode='mm4i8' — FOUR int8 byte-plane matmuls (weights
  {1,16} per plane) that emit int32 directly, no bf16/f32 converts
  anywhere, outputs aligned in lanes 0..15. Same-batch interleaved vs
  mm2: 283.6-286.1 vs 227.3-236.6 GB/s (+21-25%; the pack's cost was
  the CONVERTS, not the matmuls — its in-context cost fell 93.5 ->
  ~35 us/pass), gated bit-identical on 5 fuzz seeds x both carries.
  Alternatives kept selectable: 'mm2' (two bf16 (128,16) matmuls,
  lo | hi << 16 — the round-2/3 default), 'mm1'/'mm1r'/'mm1w'
  (single-matmul variants, ALL MISCOMPILE on this toolchain — the
  broken lowering class is consuming an offset lane slice of the pack
  matmul's output in this kernel's context, (T,32) AND full-width
  (T,128) outputs alike; tools/mosaic_probes.py's mm1_in_context probe
  is the adoption signal; the on-chip compiled-vs-golden gate is the
  final arbiter);
- round-4 defaults (adopted, 2-of-3 interleaved batches, avg +3%,
  bit-identical + corpus-swept): base_mode='shift' (sign-broadcast
  via two shift-class ops instead of &1 + mul) and
  compress_mode='m80' (nibble compress straight from the 0x80 flag
  domain via the 0x204081 multiply-gather). The 'mul'/'lsr7' forms
  stay selectable for A/B.

Round 5: out_mode='wide_native' — the PRODUCTION build config. A
dedicated block-geometry kernel (_stage1_v4_kernel_wide) views the
input as (rows/8, 1024), processes eight 128-lane blocks per wide row
with a dual-rail quote-carry trick (both carry parities nibble-
compressed in one pass; the row scan picks a rail afterwards), packs
via lane-placed (1024,128) int8 matmuls, and stores dense
(rows/8, 128) blocks — erasing the 1 GiB narrow-output DMA penalty
(build 153.7 -> 229.1 GB/s same-batch; BENCH 1 GiB 233.9 vs round-4's
156.9). Consumers (prefix kernel, rank-select, sharded serve) take
the wide layout natively; reshaping between (rows,16) and
(rows/8,128) INSIDE a jitted chain materializes a relayout copy at
scale and must not happen (PERF_NOTES round-5). The saved artifact
file stays the narrow format (host reshapes are free).

Reference lineage: the same fused pass as avx/stage1.rs:193-430; SWAR
equality replaces the vpshufb nibble LUTs, MXU matmuls replace both
PCLMULQDQ (prefix-XOR scans) and movemask (the bit pack).
SURVEY.md §7.1/7.4.
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
    swar_classify_raw,
    swar_eq,
    swar_prefix_xor_bytes,
)

LANES = 128
WORDS = 16  # packed int32 words per 512-byte row
DEFAULT_ROW_TILE_V4 = 512

_ONES = 0x01010101
_HI1 = -0x7F7F7F80  # 0x80808080


def _seq_pack_weights16() -> np.ndarray:
    """(2, 128, 16) bf16-exact weights: half 0 accumulates the low
    16 bits of packed word g from lanes 8g..8g+3 (weights 16^l),
    half 1 the high 16 bits from lanes 8g+4..8g+7."""
    w = np.zeros((2, LANES, WORDS), np.float32)
    for lane in range(LANES):
        g, l = divmod(lane, 8)
        w[l // 4, lane, g] = float(1 << (4 * (l % 4)))
    return w


def _seq_pack_weights128() -> np.ndarray:
    """(128, 128) wide variant: columns 0..15 = lo-half weights, 16..31
    = hi-half, 32..127 zero. ONE matmul with a full-width (T,128)
    output — the natural vreg layout — instead of mm1's (T,32) output,
    the shape class this toolchain miscompiles in context (PERF_NOTES
    round-3). Costs the same single MXU pass; the combine is an offset
    lane slice of a FULL-WIDTH matmul output."""
    w16 = _seq_pack_weights16()
    w = np.zeros((LANES, LANES), np.float32)
    w[:, :WORDS] = w16[0]
    w[:, WORDS : 2 * WORDS] = w16[1]
    return w


def _seq_pack_weights_i8() -> np.ndarray:
    """(4, 128, 16) int8 byte-plane weights: plane k accumulates byte k
    of packed word g from lanes 8g+2k (weight 1) and 8g+2k+1 (weight
    16) — nibbles are <= 15 so int8 inputs and the <= 255 int32 sums
    are exact, the matmul emits int32 DIRECTLY (no bf16/f32 converts),
    and every output stays in lanes 0..15 (no offset slices — the
    lowering class that miscompiles is never touched)."""
    w = np.zeros((4, LANES, WORDS), np.int8)
    for lane in range(LANES):
        g, l = divmod(lane, 8)
        w[l // 2, lane, g] = 1 if l % 2 == 0 else 16
    return w


def _seq_pack_weights_i8_wide() -> np.ndarray:
    """(4*1024, 128) int8 lane-PLACED byte-plane weights for the wide
    out layout: plane p (rows [p*1024, (p+1)*1024)) accumulates byte p
    of packed word g of BLOCK k into OUT lane 16k+g from concat lane
    128k + 8g+2p (weight 1) and 128k + 8g+2p+1 (weight 16) — one
    (64,1024)@(1024,128) int8 matmul packs all eight blocks of a rail
    per byte plane, output consumed whole (never the miscompiling
    offset-slice-of-matmul-output class; tools/widestore_probe{3,4}:
    BIT-EXACT)."""
    w = np.zeros((4, 8, LANES, LANES), np.int8)
    for k in range(8):
        for lane in range(LANES):
            g, l = divmod(lane, 8)
            w[l // 2, k, lane, 16 * k + g] = 1 if l % 2 == 0 else 16
    return w.reshape(4 * 8 * LANES, LANES)


def _stage1_v4_kernel_wide(
    carry_in_ref, w_ref, triu_ref, tril_ref, wlo_ref, bd_ref,
    packed_ref, parity_ref, nonascii_ref, *rest,
    dialect: Dialect, tile8: int, count_nonascii: bool, base_mode: str,
    compress_mode: str, emit_prefix: bool,
):
    """The wide-output geometry: the input is the SAME byte stream
    viewed as (rows/8, 1024) — block k (lanes 128k..128k+127) of wide
    row R is narrow row 8R+k — and the packed output is (rows/8, 128)
    with word order preserved under row-major flatten, so consumers
    reshape back to the (rows,16) contract for free. Why: the narrow
    (tile,16) out-block DMA is layout-bound at 1 GiB (narrow 298.8 /
    tall8 297.0 / wide 521.7 GB/s, tools/dma_probe2.py) and neither an
    in-kernel reshape (unsupported shape cast) nor strided sublane
    slices (vector.extract_strided_slice refused) lower on this
    toolchain — per-block ref window loads + lane-placed int8 pack
    matmuls do (tools/widestore_probe3.py).

    Same math as _stage1_v4_kernel per 128-lane block, with the quote
    parity chain composed exactly like everywhere else in this stack:
    in-word prefix XOR -> lane-prefix matmul per block -> running
    block carry within the wide row -> row-prefix matmul -> SMEM grid
    carry. Reference lineage: avx/stage1.rs:193-430."""
    prefix_ref = rest[0] if emit_prefix else None
    carry_sm = rest[-1]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_sm[0] = carry_in_ref[0]
        carry_sm[1] = 0
        carry_sm[2] = 0

    chars = dialect.newlines + (dialect.delimiter,)
    swar_ok = dialect.quote < 0x80 and all(c < 0x80 for c in chars)

    # ONE pass per block, DUAL-RAIL: the cross-row quote carry only
    # FLIPS the in-quote mask (parities add mod 2), and since
    # m0 ⊆ ms bitwise (m0 = structural & not-in-quote under carry 0,
    # ms = all structural), the carry-1 mask is exactly ms ^ m0 — so
    # both rails nibble-compress in the loop and the per-row carry
    # picks a rail AFTER the row scan. No int32 stash arrays (the
    # two-pass variant's 3x8x32 KB VMEM spill traffic was the wide
    # kernel's measured deficit), and the pack rides TWO
    # (64,1024)@(1024,128) int8 matmuls per byte plane.
    v0s, vds = [], []
    rc = None  # running (negated) quote-word count of blocks < k
    na = carry_sm[1] if count_nonascii else None
    for k in range(8):
        x = w_ref[:, LANES * k : LANES * (k + 1)]
        if swar_ok:
            s_no, qf, xh = swar_classify_raw(x, chars, dialect.quote)
        else:
            qf = swar_eq(x, dialect.quote)
            sf = swar_eq(x, dialect.delimiter)
            for nl in dialect.newlines:
                sf = sf | swar_eq(x, nl)
            s_no = ~sf
            xh = x & _HI1
        if count_nonascii:
            na = na + jnp.sum(jax.lax.population_count(xh))
        p_in = swar_prefix_xor_bytes(qf)
        wp = p_in >> 31
        lane_excl = jax.lax.dot_general(
            wp.astype(jnp.int8), triu_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        bt = lane_excl[:, LANES - 1 :] + wp[:, LANES - 1 :]
        base_cnt = lane_excl if rc is None else lane_excl + rc
        if base_mode == "shift":
            inq0 = p_in ^ ((base_cnt << 31) >> 31)
        else:
            inq0 = p_in ^ ((base_cnt & 1) * _HI1)
        m0 = ~(s_no | inq0) & _HI1
        md = (~s_no & _HI1) ^ m0  # the carry-1 rail: ms ^ m0
        if compress_mode == "m80":
            v0 = jax.lax.shift_right_logical(m0 * 0x204081, 28)
            vd = jax.lax.shift_right_logical(md * 0x204081, 28)
        else:
            v0 = ((jax.lax.shift_right_logical(m0, 7) * 0x01020408)
                  >> 24)
            vd = ((jax.lax.shift_right_logical(md, 7) * 0x01020408)
                  >> 24)
        v0s.append(v0.astype(jnp.int8))
        vds.append(vd.astype(jnp.int8))
        rc = bt if rc is None else rc + bt
    if count_nonascii:
        carry_sm[1] = na
        nonascii_ref[0, 0] = na
    else:
        nonascii_ref[0, 0] = -1

    # row scan over the (negated) per-wide-row quote counts
    rowpar = rc & 1
    rowpar8 = jnp.broadcast_to(rowpar, (tile8, 8)).astype(jnp.int8)
    row_excl = jax.lax.dot_general(
        tril_ref[:], rowpar8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    # 0/-1 per-row rail selector: this row's inherited quote parity
    rowodd = (((row_excl[:, :1] + carry_sm[0]) & 1) << 31) >> 31

    big0 = jnp.concatenate(v0s, axis=1)  # (tile8, 1024) int8
    bigd = jnp.concatenate(vds, axis=1)
    p0 = acc_d = None
    for p in range(4):
        wp_ref = wlo_ref[1024 * p : 1024 * (p + 1), :]
        t0 = jax.lax.dot_general(
            big0, wp_ref, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        td = jax.lax.dot_general(
            bigd, wp_ref, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        if p:
            t0 = t0 << (8 * p)
            td = td << (8 * p)
        p0 = t0 if p0 is None else (p0 | t0)
        acc_d = td if acc_d is None else (acc_d | td)
    acc = p0 ^ ((p0 ^ acc_d) & rowodd)
    packed_ref[:] = acc

    if emit_prefix:
        # fused row popcount prefix: the standalone prefix kernel's
        # exact construction (offsetfree._prefix_kernel) on the pack
        # output while it is still in registers — one popcount, the
        # block-triangular (128,8) bd matmul for the inclusive
        # per-narrow-row lane prefix, and the lo7/hi-split tril
        # matmuls for the wide-row prefix, running total in SMEM.
        # (Round 4 measured-REFUTED this fusion for the NARROW kernel
        # — schedule pressure cost more than the saved pass; the wide
        # kernel's profile differs, so it is re-measured, gated by
        # the same golden bit-identity.)
        pc8 = jax.lax.population_count(acc).astype(jnp.int8)
        lane_incl = jax.lax.dot_general(      # (tile8, 8) int32
            pc8, bd_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        rowsum = lane_incl[:, 7:]             # (tile8, 1), <= 4096
        rlo = (rowsum & 0x7F).astype(jnp.int8)
        rhi = (rowsum >> 7).astype(jnp.int8)  # <= 32
        excl = (
            jax.lax.dot_general(
                tril_ref[:], rlo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            + (jax.lax.dot_general(
                tril_ref[:], rhi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32) << 7)
        )
        prefix_ref[:] = lane_incl + excl + carry_sm[2]
        carry_sm[2] = (carry_sm[2] + excl[tile8 - 1, 0]
                       + rowsum[tile8 - 1, 0])

    tile_par = (row_excl[tile8 - 1, 0] + rowpar[tile8 - 1, 0]) & 1
    new_carry = (carry_sm[0] + tile_par) & 1
    carry_sm[0] = new_carry
    parity_ref[0, 0] = new_carry


def _seq_pack_weights32() -> np.ndarray:
    """(128, 32) stacked [lo | hi] variant of _seq_pack_weights16: one
    matmul emits both halves (lanes 0..15 = lo, 16..31 = hi), halving
    MXU passes at the cost of a lane-slice combine. Usable ONLY when
    the toolchain's (T,32) matmul-output path lowers correctly —
    tools/mosaic_probes.py checks; bench.py's on-chip gate guards."""
    w16 = _seq_pack_weights16()
    return np.concatenate([w16[0], w16[1]], axis=1)


def _stage1_v4_kernel(
    carry_in_ref, w_ref, triu_ref, tril_ref, wlo_ref, whi_ref,
    ones8_ref, packed_ref, parity_ref, nonascii_ref, *rest,
    dialect: Dialect, tile: int, emit_counts: bool, count_nonascii: bool,
    pack_mode: str, base_mode: str, compress_mode: str,
    emit_prefix: bool, scan_mm: str,
):
    def _store_packed(pk):
        # (the in-kernel (tile,16)->(tile/8,128) melt for wide output
        # does NOT lower — "unsupported shape cast"; wide output runs
        # the dedicated block-geometry kernel _stage1_v4_kernel_wide)
        packed_ref[:] = pk

    extra = list(rest[:-1])
    counts_ref = extra.pop(0) if emit_counts else None
    prefix_ref = extra.pop(0) if emit_prefix else None
    carry_sm = rest[-1]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_sm[0] = carry_in_ref[0]
        carry_sm[1] = 0
        carry_sm[2] = 0

    x = w_ref[:]  # (T, 128) int32, 4 bytes per lane
    chars = dialect.newlines + (dialect.delimiter,)
    if dialect.quote < 0x80 and all(c < 0x80 for c in chars):
        # fused mask chain: raw classify keeps garbage outside bit-7
        # positions; every consumer below is bit-7-safe (prefix shifts
        # are multiples of 8, >> 31 reads bit 31, the mask chain ends
        # in & 0x80808080) — see swar_classify_raw
        s_no, qf, xh = swar_classify_raw(x, chars, dialect.quote)
    else:
        qf = swar_eq(x, dialect.quote)
        sf = swar_eq(x, dialect.delimiter)
        for nl in dialect.newlines:
            sf = sf | swar_eq(x, nl)
        s_no = ~sf
        xh = x & _HI1
    if count_nonascii:
        # fused non-ASCII detection: the high-bit mask is a classify
        # intermediate for ASCII dialects, so UTF-8's fast path
        # (is_ascii, reader.rs:36) costs one popcount reduce at scan
        # time. Opt out (count_nonascii=False) when the caller won't
        # validate UTF-8 — the reduce is ~2 full-width ops of ~30.
        na = carry_sm[1] + jnp.sum(jax.lax.population_count(xh))
        carry_sm[1] = na
        nonascii_ref[0, 0] = na
    else:
        nonascii_ref[0, 0] = -1
    p_in = swar_prefix_xor_bytes(qf)          # in-word inclusive parity
    # 0/-1 sign form: parities are only consumed mod 2, (-k)&1 == k&1
    wp = p_in >> 31                           # (T, 128) 0/-1
    if scan_mm == "bf16":
        # homogeneous-MXU variant: the pack matmuls are bf16, and
        # mixing int8/bf16 MXU modes in one kernel measured ~7-13
        # us/pass of mode-switch cost in a 4-matmul microkernel —
        # running the scans in bf16 too avoids the switches. Exact:
        # wp is 0/-1 and the prefix sums stay <= 512, all f32-exact.
        lane_excl = jax.lax.dot_general(
            wp.astype(jnp.bfloat16), triu_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        rowpar = (lane_excl[:, LANES - 1 :] + wp[:, LANES - 1 :]) & 1
        rowpar8 = jnp.broadcast_to(
            rowpar, (tile, 8)).astype(jnp.bfloat16)
        row_excl = jax.lax.dot_general(
            tril_ref[:], rowpar8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
    else:
        lane_excl = jax.lax.dot_general(      # words before, same row
            wp.astype(jnp.int8), triu_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        rowpar = (lane_excl[:, LANES - 1 :] + wp[:, LANES - 1 :]) & 1
        rowpar8 = jnp.broadcast_to(rowpar, (tile, 8)).astype(jnp.int8)
        row_excl = jax.lax.dot_general(       # rows before, this tile
            tril_ref[:], rowpar8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    # carry folds into the NARROW (T,1) column, saving one full-width add
    rowcol = row_excl[:, :1] + carry_sm[0]
    if base_mode == "shift":
        # sign-broadcast via two cheap shifts: bit 0 of the parity count
        # replicated to 0/-1 per word. inq then has garbage OUTSIDE
        # bit-7 positions — its only consumer is the mask chain, whose
        # final & 0x80808080 clears every non-bit-7 bit (the same
        # contract swar_classify_raw already relies on). Replaces the
        # (& 1) alu op + (* 0x80808080) mul with two shift-class ops
        # (shifts issue ~3.6x faster than alu on this VPU —
        # tools/vpu_roofline.py).
        binq = ((lane_excl + rowcol) << 31) >> 31  # (T,128) 0/-1
        inq = p_in ^ binq
    else:
        base = (lane_excl + rowcol) & 1
        inq = p_in ^ (base * _HI1)            # 0x80 in-quote per byte
    # mask in the 0x80 domain, then one LOGICAL shift yields clean
    # 0x01 flags. The classify cleanup is folded in: bit 7 of
    # ~(s_no | inq) = structural AND not-in-quote, and the single
    # & 0x80808080 clears every garbage bit (measured +3-5% same-batch
    # vs clean-flag classify + separate mask; PERF_NOTES round-2-late)
    if compress_mode == "m80":
        # nibble compress straight from the 0x80 flag domain: the
        # multiplier 0x204081 (bits 0,7,14,21) lifts the four flag bits
        # (7,15,23,31) to bits 28..31 — pair sums 7+21, 15+14, 23+7,
        # 31+0; every cross term lands below 28 or wraps past 31 — so
        # the logical >>28 is exact. Skips materializing the 0x01 form
        # entirely (one shift-class op fewer than lsr7 + mul + asr24).
        m80 = ~(s_no | inq) & _HI1
        v = jax.lax.shift_right_logical(m80 * 0x204081, 28)
        masked_u = (jax.lax.shift_right_logical(m80, 7)
                    if emit_counts else None)
    else:
        masked_u = jax.lax.shift_right_logical(~(s_no | inq) & _HI1, 7)
        # 4 flag bits per word; bits 28..31 are provably zero so no
        # & 0xF (see swar.swar_nibble_compress's proof)
        v = (masked_u * 0x01020408) >> 24
    vb = (None if pack_mode in ("roll", "rollslice", "none", "mm4i8")
          else v.astype(jnp.bfloat16))
    # Pack constructions, in history order:
    # - mm2 (round-2 default): two (128,16) matmuls whose outputs align
    #   in lanes 0..15, no lane movement — the construction that stayed
    #   correct while the round-2 Mosaic miscompiled every consumer of
    #   a (T,32) matmul output (caught twice by bench.py's gate).
    # - mm1/mm1r: one (128,32) matmul emitting both halves, combined by
    #   an offset lane slice / pltpu.roll — measured 11% faster, BROKEN
    #   on the round-2 toolchain. Round 3: the ISOLATED (T,32) probes
    #   (tools/mosaic_probes.py) started passing, but BOTH variants
    #   still miscompile inside this full kernel (6570 mismatched bits
    #   on the 700 KB gate corpus, interpret bit-exact) — the
    #   mm1_in_context probe is the only adoption signal; mm2 stays
    #   the default.
    if pack_mode == "none":
        # MEASUREMENT ONLY (tools/ablate4.py): the full scan+mask with
        # the pack amputated — output is a meaningless (T,16) slice of
        # the masked flags, NOT the packed layout. v4(mode) - v4(none)
        # = the in-context cost of pack `mode` (VERDICT r3 item 1b).
        _store_packed((~(s_no | inq) & _HI1)[:, :WORDS])
    elif pack_mode in ("roll", "rollslice"):
        # non-MXU pack (VERDICT r3 item 1a): a 3-step lane roll ladder
        # ORs each lane's 4-bit nibble with its neighbors' at shifts
        # 4/8/16, so lane 8g accumulates the full 32-bit packed word g
        # (wrap lanes past 8g+7 produce garbage in lanes not 0 mod 8,
        # never read). Shift-class ops are ~3.6x cheaper than alu on
        # this VPU; whether 3 rolls beat 2 MXU matmuls is an empirical
        # question (tools/ablate2.py v4roll vs v4).
        s = v
        for step, sh in ((1, 4), (2, 8), (4, 16)):
            # pltpu.roll is np.roll: result lane L = x[(L - k) % 128];
            # k = 128 - step brings lane L+step down to lane L
            s = s | (pltpu.roll(s, LANES - step, 1) << sh)
        if pack_mode == "rollslice":
            # strided lane slice (1,8): the direct extraction if the
            # toolchain lowers it
            _store_packed(jax.lax.slice(
                s, (0, 0), (tile, LANES), (1, 8)))
        else:
            # int32 lane gather of lanes 0,8,..,120 (int32 gathers DO
            # lower on this toolchain; int8 don't — CLAUDE.md)
            idx = (jax.lax.broadcasted_iota(
                jnp.int32, (tile, LANES), 1) & 0x0F) << 3
            g = jnp.take_along_axis(s, idx, axis=1)
            _store_packed(g[:, :WORDS])
    elif pack_mode == "mm4i8":
        # four int8 byte-plane matmuls: no bf16 convert of v, no
        # f32->int32 output converts (int8 matmuls emit int32
        # directly), outputs aligned in lanes 0..15 (weight planes are
        # ROW slices of the stacked (512,16) int8 input ref — never an
        # offset slice of a matmul OUTPUT, the miscompiling class)
        v8 = v.astype(jnp.int8)
        planes = [
            jax.lax.dot_general(
                v8, wlo_ref[LANES * k2 : LANES * (k2 + 1), :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            for k2 in range(4)
        ]
        _store_packed(planes[0] | (planes[1] << 8)
                      | (planes[2] << 16) | (planes[3] << 24))
    elif pack_mode == "mm1w":
        # one (128,128)-weight matmul, full-width (T,128) output: lanes
        # 0..15 carry the lo halves, 16..31 the hi halves, 32..127 are
        # zero. Halves the MXU passes like mm1 but keeps the matmul
        # output at the natural full-lane shape — dodging the (T,32)
        # matmul-output lowering this toolchain miscompiles in context.
        out = jax.lax.dot_general(
            vb, wlo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        _store_packed(out[:, :WORDS] | (out[:, WORDS : 2 * WORDS] << 16))
    elif pack_mode == "mm1":
        out = jax.lax.dot_general(
            vb, wlo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        _store_packed(out[:, :WORDS] | (out[:, WORDS:] << 16))
    elif pack_mode == "mm1r":
        out = jax.lax.dot_general(
            vb, wlo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        comb = out | (pltpu.roll(out, WORDS, 1) << 16)
        _store_packed(comb[:, :WORDS])
    else:
        lo = jax.lax.dot_general(
            vb, wlo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        hi = jax.lax.dot_general(
            vb, whi_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        _store_packed(lo | (hi << 16))
    if emit_counts:
        # per-row structural popcounts, fused: the offsets-free index
        # needs cumsum(row_counts); emitting them here saves the prefix
        # pass's full re-read of the packed words. Counted from the
        # masked 0x01 flags (4 adds of shifted nibbles = popcount of
        # the row's 512 flag bits without touching the packed output).
        t = masked_u
        t = t + (t >> 8)
        t = (t + (t >> 16)) & 0xFF  # per-word flag count (0..4)
        counts_ref[:] = jnp.sum(t, axis=1, keepdims=True, dtype=jnp.int32)
    if emit_prefix:
        # FUSED inclusive per-row popcount prefix: ONE full-width
        # popcount of the masked flags (<= 4 set bits per word ->
        # int8-exact) + a ones matmul for row sums (<= 512) + the tril
        # matmul for the within-tile row prefix (totals split lo7/hi
        # so int8 inputs stay exact), running total in SMEM.
        # MEASURED-REFUTED for production (round 4, interleaved): the
        # in-kernel chain costs ~157 us/pass MORE than the separate
        # Pallas prefix pass (453.8 fused vs 346.2 two-pass vs 296.7
        # scan-only at 64 MiB) — the v4 kernel's register/schedule
        # pressure penalizes extra work far beyond its op count, the
        # same lesson as round-2's emit_counts. Kept verified for
        # single-pass count consumers; production uses
        # offsetfree._prefix_for_packed_pallas (the one-launch second
        # kernel, itself ~7 us faster than the ~20-op XLA composition).
        flags = m80 if compress_mode == "m80" else masked_u
        pc8 = jax.lax.population_count(flags).astype(jnp.int8)
        rowsum = jax.lax.dot_general(      # (T,8) int32, columns equal
            pc8, ones8_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        rlo = (rowsum & 0x7F).astype(jnp.int8)
        rhi = (rowsum >> 7).astype(jnp.int8)   # <= 4
        excl = (
            jax.lax.dot_general(
                tril_ref[:], rlo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            + (jax.lax.dot_general(
                tril_ref[:], rhi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32) << 7)
        )[:, :1]
        prefix_ref[:] = excl + rowsum[:, :1] + carry_sm[2]
        carry_sm[2] = (carry_sm[2] + excl[tile - 1, 0]
                       + rowsum[tile - 1, 0])

    tile_par = (row_excl[tile - 1, 0] + rowpar[tile - 1, 0]) & 1
    new_carry = (carry_sm[0] + tile_par) & 1
    carry_sm[0] = new_carry
    parity_ref[0, 0] = new_carry


@functools.partial(
    jax.jit,
    static_argnames=(
        "dialect", "row_tile", "interpret", "vma", "emit_counts",
        "count_nonascii", "pack_mode", "base_mode", "compress_mode",
        "emit_prefix", "scan_mm", "out_mode",
    ),
)
def stage1_fused_v4(
    w2d: jnp.ndarray,
    carry_in,
    dialect: Dialect = DEFAULT_DIALECT,
    row_tile: int = DEFAULT_ROW_TILE_V4,
    interpret: bool = False,
    vma: tuple = (),
    emit_counts: bool = False,
    count_nonascii: bool = True,
    pack_mode: str = "mm4i8",
    base_mode: str = "shift",
    compress_mode: str = "m80",
    emit_prefix: bool = False,
    scan_mm: str = "i8",
    out_mode: str = "narrow",
):
    """(rows, 128) int32 byte-quad words + carry parity ->
    (packed_seq (rows, 16) int32, parity_out, nonascii_count[,
    row_counts (rows, 1)]). Same packed layout as stage1_fused_seq /
    stage1_seq_xla; nonascii_count is the number of bytes with the high
    bit set (the fused is_ascii — 0 means no further UTF-8 validation
    needed); with emit_counts=True the per-512-byte-row structural
    popcounts come out of the same pass (feeding the offsets-free
    prefix without re-reading the packed words); with
    count_nonascii=False the fused high-bit reduce is skipped entirely
    and nonascii_count comes back as -1 (meaning "not counted").

    out_mode (round 5): 'narrow' (default) keeps the (rows, 16)
    output; 'wide'/'wide_native' run the block-geometry dual-rail
    kernel with dense (rows/8, 128) stores — the PRODUCTION build
    config (module docstring). Input may be pre-shaped (rows/8, 1024)
    for the wide modes (preferred: no in-jit reshape). 'wide' reshapes
    the result back to (rows, 16); 'wide_native' returns the
    (rows/8, 128) array as-is for reshape-free consumers
    (prefix_for_packed, rank-select, the sharded serve). emit_prefix
    with the wide modes fuses the row popcount prefix in-kernel
    (verified bit-identical; measured-refuted for production — the
    separate prefix pass is faster, PERF_NOTES round-5)."""
    rows, lanes = w2d.shape
    if lanes == 8 * LANES:
        # wide-geometry input (rows/8, 1024): the SAME byte stream,
        # pre-shaped by the caller (host-side np.reshape is free;
        # an in-jit device reshape materializes a full copy at the
        # 1 GiB scale — measured 1.25 ms/pass, tools/widestore_probe)
        assert out_mode in ("wide", "wide_native"), out_mode
        rows = rows * 8
    else:
        assert lanes == LANES, (rows, lanes)
    assert rows % 8 == 0, (rows, lanes)
    tile = min(row_tile, rows)
    assert rows % tile == 0, (rows, tile)
    grid = rows // tile

    scan_np = np.int8 if scan_mm == "i8" else np.float32
    triu = jnp.asarray(np.triu(np.ones((LANES, LANES), scan_np), 1))
    tril = jnp.asarray(np.tril(np.ones((tile, tile), scan_np), -1))
    if scan_mm == "bf16":
        triu = triu.astype(jnp.bfloat16)
        tril = tril.astype(jnp.bfloat16)
    if pack_mode in ("roll", "rollslice", "none"):
        # non-MXU pack: no weights read; keep tiny placeholders so the
        # pallas_call signature stays uniform
        wlo = jnp.zeros((LANES, WORDS), jnp.bfloat16)
        whi = jnp.zeros((LANES, WORDS), jnp.bfloat16)
    elif pack_mode == "mm4i8":
        wlo = jnp.asarray(
            _seq_pack_weights_i8().reshape(4 * LANES, WORDS))
        whi = jnp.zeros((LANES, WORDS), jnp.bfloat16)  # unread
    elif pack_mode == "mm1w":
        wlo = jnp.asarray(_seq_pack_weights128(), jnp.bfloat16)
        whi = jnp.zeros((LANES, WORDS), jnp.bfloat16)  # unread
    elif pack_mode in ("mm1", "mm1r"):
        wlo = jnp.asarray(_seq_pack_weights32(), jnp.bfloat16)
        whi = jnp.zeros((LANES, WORDS), jnp.bfloat16)  # unread
    else:
        wboth = _seq_pack_weights16()
        wlo = jnp.asarray(wboth[0], jnp.bfloat16)
        whi = jnp.asarray(wboth[1], jnp.bfloat16)

    if out_mode in ("wide", "wide_native"):
        # wide-layout stores run the block-geometry kernel: whole
        # (tile/8, 128) out rows, mm4i8-style int8 pack only
        assert tile % 8 == 0, tile
        assert pack_mode == "mm4i8", (out_mode, pack_mode)
        assert scan_mm == "i8" and not emit_counts
    else:
        assert out_mode == "narrow", out_mode
    ones8 = jnp.ones((LANES, 8), jnp.int8)
    kernel = functools.partial(
        _stage1_v4_kernel, dialect=dialect, tile=tile,
        emit_counts=emit_counts, count_nonascii=count_nonascii,
        pack_mode=pack_mode, base_mode=base_mode,
        compress_mode=compress_mode, emit_prefix=emit_prefix,
        scan_mm=scan_mm,
    )
    carry_arr = jnp.asarray(carry_in, jnp.int32).reshape(1)
    if vma:
        # align replicated constants with device-varying data inside
        # shard_map (see stage1_fused)
        def _align(x):
            missing = tuple(a for a in vma if a not in jax.typeof(x).vma)
            return jax.lax.pcast(x, missing, to="varying") if missing else x

        triu, tril, wlo, whi, ones8, carry_arr = (
            _align(triu), _align(tril), _align(wlo), _align(whi),
            _align(ones8), _align(carry_arr),
        )

    if out_mode in ("wide", "wide_native"):
        tile8 = tile // 8
        wlo_w = jnp.asarray(_seq_pack_weights_i8_wide())
        triu_w = jnp.asarray(np.triu(np.ones((LANES, LANES), np.int8), 1))
        tril_w = jnp.asarray(np.tril(np.ones((tile8, tile8), np.int8), -1))
        # bd[l, g] = 1 iff lane l's word belongs to narrow row <= g of
        # its wide row (the standalone prefix kernel's weights)
        bd_np = np.zeros((LANES, 8), np.int8)
        for lane in range(LANES):
            bd_np[lane, lane // 16 :] = 1
        bd = jnp.asarray(bd_np)
        if vma:
            triu_w, tril_w, wlo_w, bd = (
                _align(triu_w), _align(tril_w), _align(wlo_w),
                _align(bd))
        w_wide = (w2d if w2d.shape[1] == 8 * LANES
                  else w2d.reshape(rows // 8, 8 * LANES))
        kernel_w = functools.partial(
            _stage1_v4_kernel_wide, dialect=dialect, tile8=tile8,
            count_nonascii=count_nonascii, base_mode=base_mode,
            compress_mode=compress_mode, emit_prefix=emit_prefix,
        )
        outs_w = pl.pallas_call(
            kernel_w,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((tile8, 8 * LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LANES, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile8, tile8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((32 * LANES, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LANES, 8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile8, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ] + ([pl.BlockSpec((tile8, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
                 if emit_prefix else []),
            out_shape=[
                jax.ShapeDtypeStruct((rows // 8, LANES), jnp.int32,
                                     vma=frozenset(vma)),
                jax.ShapeDtypeStruct((1, 1), jnp.int32,
                                     vma=frozenset(vma)),
                jax.ShapeDtypeStruct((1, 1), jnp.int32,
                                     vma=frozenset(vma)),
            ] + ([jax.ShapeDtypeStruct((rows // 8, 8), jnp.int32,
                                       vma=frozenset(vma))]
                 if emit_prefix else []),
            scratch_shapes=[pltpu.SMEM((3,), jnp.int32)],
            interpret=interpret,
        )(carry_arr, w_wide, triu_w, tril_w, wlo_w, bd)
        packed, parity, nonascii = outs_w[0], outs_w[1], outs_w[2]
        # same bytes, word order preserved under row-major flatten.
        # 'wide_native' hands back the (rows/8, 128) array as-is —
        # the production consumers (the prefix kernel, host
        # unpackers) want exactly that shape, and reshaping here
        # costs a materialized relayout copy inside jitted chains at
        # the 1 GiB scale; 'wide' keeps the (rows,16) contract view.
        if out_mode == "wide_native":
            res_w = [packed, parity[0, 0], nonascii[0, 0]]
            if emit_prefix:
                res_w.append(outs_w[3].reshape(rows))
            return tuple(res_w)
        if emit_prefix:
            return (packed.reshape(rows, WORDS), parity[0, 0],
                    nonascii[0, 0], outs_w[3].reshape(rows))
        return (packed.reshape(rows, WORDS), parity[0, 0],
                nonascii[0, 0])

    pk_spec = pl.BlockSpec((tile, WORDS), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    pk_shape = (rows, WORDS)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, tile), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wlo.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(whi.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pk_spec,
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ] + ([pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)]
             if emit_counts else [])
          + ([pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)]
             if emit_prefix else []),
        out_shape=[
            jax.ShapeDtypeStruct(pk_shape, jnp.int32, vma=frozenset(vma)),
            jax.ShapeDtypeStruct((1, 1), jnp.int32, vma=frozenset(vma)),
            jax.ShapeDtypeStruct((1, 1), jnp.int32, vma=frozenset(vma)),
        ] + ([jax.ShapeDtypeStruct((rows, 1), jnp.int32, vma=frozenset(vma))]
             if emit_counts else [])
          + ([jax.ShapeDtypeStruct((rows, 1), jnp.int32, vma=frozenset(vma))]
             if emit_prefix else []),
        scratch_shapes=[pltpu.SMEM((3,), jnp.int32)],
        interpret=interpret,
    )(carry_arr, w2d, triu, tril, wlo, whi, ones8)
    outs = list(outs)
    packed, parity, nonascii = outs[0], outs[1], outs[2]
    tail = outs[3:]
    res = [packed, parity[0, 0], nonascii[0, 0]]
    if emit_counts:
        res.append(tail.pop(0))
    if emit_prefix:
        res.append(tail.pop(0).reshape(rows))
    return tuple(res)
