"""v3 production kernel tests (interpret mode on CPU; compiled on TPU in
bench/verify): fold-pack layout round-trip, golden bit-identity, twin
word-identity, carry chaining, count-from-packed."""

import numpy as np
import jax.numpy as jnp
import pytest

from csv_simd_tpu import golden
from csv_simd_tpu.ops.stage1_v2 import pad_to_words
from csv_simd_tpu.ops.stage1_v3 import (
    count_packed,
    stage1_fused,
    stage1_swar_xla,
    unpack_packed_host,
)

from corpus import basic_cases, boundary_cases, synthetic_wide_table


def _run(data: bytes, row_tile=64, carry_in=0):
    arr = np.frombuffer(data, dtype=np.uint8)
    w2d = jnp.asarray(pad_to_words(arr, row_align=8))
    tile = min(row_tile, w2d.shape[0])
    packed, parity = stage1_fused(
        w2d, carry_in, row_tile=tile, interpret=True
    )
    return np.asarray(packed), int(parity), arr.size, tile


@pytest.mark.parametrize(
    "case", basic_cases() + boundary_cases()[:6], ids=lambda c: c.name
)
def test_v3_matches_golden(case):
    packed, parity, n, tile = _run(case.data)
    mask = unpack_packed_host(packed, n, tile=tile)
    want = golden.structural_mask(np.frombuffer(case.data, dtype=np.uint8))
    np.testing.assert_array_equal(mask, want)
    assert parity == golden.quote_parity_out(case.data)
    assert int(count_packed(jnp.asarray(packed))) == want.sum()


def test_v3_twin_word_identity():
    data = synthetic_wide_table(120_000)
    arr = np.frombuffer(data, dtype=np.uint8)
    w2d = jnp.asarray(pad_to_words(arr, row_align=8))
    tile = min(64, w2d.shape[0])
    p_k, par_k = stage1_fused(w2d, 0, row_tile=tile, interpret=True)
    p_t, par_t = stage1_swar_xla(w2d, 0, row_tile=tile)
    np.testing.assert_array_equal(np.asarray(p_k), np.asarray(p_t))
    assert int(par_k) == int(par_t)


def test_v3_carry_across_tiles():
    inner = "x," * 40000
    data = f'a,b\n"{inner}end",2\nq,w\n'.encode()
    packed, parity, n, tile = _run(data, row_tile=32)
    mask = unpack_packed_host(packed, n, tile=tile)
    want = golden.structural_mask(np.frombuffer(data, dtype=np.uint8))
    np.testing.assert_array_equal(mask, want)
    assert parity == 0


def test_v3_carry_in():
    data = b'ab",c\nx,y\n'
    packed, parity, n, tile = _run(data, carry_in=1)
    mask = unpack_packed_host(packed, n, tile=tile)
    arr = np.frombuffer(data, dtype=np.uint8)
    np.testing.assert_array_equal(mask, golden.structural_mask(arr, carry_in=1))
    assert parity == golden.quote_parity_out(arr, carry_in=1)


def test_fold_pack_layout_roundtrip():
    """Every bit position must round-trip through the sigma/fold layout:
    use a one-hot sweep over a small tile."""
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 4096 * 3, dtype=np.uint8)
    # force specific structural bytes at chosen positions
    for pos in (0, 1, 511, 512, 513, 4095, 4096, 8191, 12287):
        data[pos] = 0x2C
    data[data == 0x22] = 0x61  # drop quotes to make mask predictable
    arr = data
    w2d = jnp.asarray(pad_to_words(arr, row_align=8))
    tile = min(8, w2d.shape[0])
    packed, _ = stage1_swar_xla(w2d, 0, row_tile=tile)
    mask = unpack_packed_host(np.asarray(packed), arr.size, tile=tile)
    want = golden.structural_mask(arr)
    np.testing.assert_array_equal(mask, want)


def test_v3_base_shift_corpus():
    """Corpus coverage for the round-4 base_mode='shift' mask chain
    (CLAUDE.md rule: mask/carry changes get corpus cases — the
    hi_bit_quote_* adversaries pin the bit-7-only garbage contract)."""
    from corpus import basic_cases

    for case in basic_cases():
        arr = np.frombuffer(case.data, dtype=np.uint8)
        if arr.size == 0:
            continue
        w2d = jnp.asarray(pad_to_words(arr))
        got, _p = stage1_fused(w2d, 0, interpret=True,
                               base_mode="shift")
        mask = unpack_packed_host(np.asarray(got), arr.size, tile=512)
        np.testing.assert_array_equal(
            mask, golden.structural_mask(arr), err_msg=case.name)
