"""Pallas stage-1 kernel tests (interpret mode on CPU; the same kernel
compiles for TPU — bench.py exercises the compiled path on hardware).

The contract: bit-identical packed words / index vs the jnp backend and
the golden oracle, across tile boundaries and carry chains."""

import numpy as np
import jax.numpy as jnp
import pytest

from csv_simd_tpu import golden
from csv_simd_tpu.index import build_index, pad_to_grid, stage1_jnp
from csv_simd_tpu.ops.pack import unpack_words_host
from csv_simd_tpu.ops.stage1_pallas import stage1_pallas

from corpus import basic_cases, synthetic_wide_table


def _run_pallas(data: bytes, row_tile: int = 64, carry_in: int = 0):
    arr = np.frombuffer(data, dtype=np.uint8)
    b2d = jnp.asarray(pad_to_grid(arr))
    words, count, parity = stage1_pallas(
        b2d, carry_in, row_tile=row_tile, interpret=True
    )
    return np.asarray(words), int(count), int(parity), arr.size


@pytest.mark.parametrize("case", basic_cases(), ids=lambda c: c.name)
def test_pallas_matches_golden(case):
    words, count, parity, n = _run_pallas(case.data)
    mask = unpack_words_host(words, n)
    want = golden.structural_mask(np.frombuffer(case.data, dtype=np.uint8))
    np.testing.assert_array_equal(mask, want)
    assert parity == golden.quote_parity_out(case.data)
    assert count == want.sum()


def test_pallas_words_bitidentical_to_jnp():
    """The two backends share the word layout: outputs must be equal as
    raw uint32 tensors, not just after unpacking."""
    data = synthetic_wide_table(50_000)
    b2d = jnp.asarray(pad_to_grid(np.frombuffer(data, dtype=np.uint8)))
    w_jnp, p_jnp = stage1_jnp(b2d, jnp.int32(0))
    w_pal, _, p_pal = stage1_pallas(b2d, 0, row_tile=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(w_jnp), np.asarray(w_pal))
    assert int(p_jnp) == int(p_pal)


def test_carry_across_tiles():
    """A quoted region spanning multiple kernel tiles: the SMEM parity
    carry must propagate across grid steps (row_tile=32 -> 4096-byte
    tiles; quote spans ~3 tiles)."""
    inner = "x," * 6000  # 12000 bytes of quoted commas
    data = f'a,b\n"{inner}end",2\nq,w\n'.encode()
    words, _, parity, n = _run_pallas(data, row_tile=32)
    mask = unpack_words_host(words, n)
    want = golden.structural_mask(np.frombuffer(data, dtype=np.uint8))
    np.testing.assert_array_equal(mask, want)
    assert parity == 0


def test_carry_in_plumbed():
    data = b'ab",c\nx,y\n'  # starts inside a quote if carry_in=1
    words, _, parity, n = _run_pallas(data, carry_in=1)
    mask = unpack_words_host(words, n)
    arr = np.frombuffer(data, dtype=np.uint8)
    want = golden.structural_mask(arr, carry_in=1)
    np.testing.assert_array_equal(mask, want)
    assert parity == golden.quote_parity_out(arr, carry_in=1)


def test_build_index_pallas_backend(sample_rx):
    got = build_index(sample_rx, backend="pallas")
    want = golden.structural_index(sample_rx)
    np.testing.assert_array_equal(got, want)


# ---- v2 SWAR kernel (the production path) ----

from csv_simd_tpu.ops.stage1_v2 import (  # noqa: E402
    pad_to_words,
    stage1_pallas_v2,
    unpack_words_v2_host,
)
from csv_simd_tpu.ops.swar import swar_eq  # noqa: E402


def _run_v2(data: bytes, row_tile: int = 64, carry_in: int = 0, row_scan="roll"):
    arr = np.frombuffer(data, dtype=np.uint8)
    w2d = jnp.asarray(pad_to_words(arr, row_align=8))
    packed, count, parity = stage1_pallas_v2(
        w2d, carry_in, row_tile=min(row_tile, w2d.shape[0]),
        row_scan=row_scan, interpret=True
    )
    return np.asarray(packed), int(count), int(parity), arr.size


def test_swar_eq_exact():
    """The naive SWAR zero-detector has borrow false positives (a 0x01
    byte after a 0x00 byte); ours must be exact on adversarial layouts."""
    import jax

    tricky = np.array(
        [0x00012C00, 0x2C2D0001, 0x012C0100, -0x7FFFFFD4], dtype=np.int32
    ).reshape(1, 4)
    got = np.asarray(jax.jit(lambda x: swar_eq(x, 0x2C))(jnp.asarray(tricky)))
    bytes_le = tricky.view(np.uint8).reshape(-1)
    want_flags = np.zeros(4, dtype=np.int64)
    for w in range(4):
        for b in range(4):
            if bytes_le[w * 4 + b] == 0x2C:
                want_flags[w] |= 0x80 << (8 * b)
    want = want_flags.astype(np.uint32).astype(np.int64)
    got_u = np.asarray(got, dtype=np.int64).reshape(-1) & 0xFFFFFFFF
    np.testing.assert_array_equal(got_u, want)


@pytest.mark.parametrize("case", basic_cases(), ids=lambda c: c.name)
@pytest.mark.parametrize("row_scan", ["roll", "tril"])
def test_v2_matches_golden(case, row_scan):
    packed, count, parity, n = _run_v2(case.data, row_scan=row_scan)
    mask = unpack_words_v2_host(packed, n)
    want = golden.structural_mask(np.frombuffer(case.data, dtype=np.uint8))
    np.testing.assert_array_equal(mask, want)
    assert parity == golden.quote_parity_out(case.data)
    assert count == want.sum()


def test_v2_carry_across_tiles():
    inner = "x," * 40000  # 80 KB of quoted commas spans several 32-row tiles
    data = f'a,b\n"{inner}end",2\nq,w\n'.encode()
    packed, _, parity, n = _run_v2(data, row_tile=32)
    mask = unpack_words_v2_host(packed, n)
    want = golden.structural_mask(np.frombuffer(data, dtype=np.uint8))
    np.testing.assert_array_equal(mask, want)
    assert parity == 0


def test_v2_carry_in():
    data = b'ab",c\nx,y\n'
    packed, _, parity, n = _run_v2(data, carry_in=1)
    mask = unpack_words_v2_host(packed, n)
    arr = np.frombuffer(data, dtype=np.uint8)
    np.testing.assert_array_equal(mask, golden.structural_mask(arr, carry_in=1))
    assert parity == golden.quote_parity_out(arr, carry_in=1)


def test_swar_eq_alt_equivalence():
    """The CSE-proof alternate zero-byte detector must agree with
    swar_eq for every byte value (used for rematerialization studies)."""
    import jax

    from csv_simd_tpu.ops.swar import swar_eq, swar_eq_alt

    rng = np.random.default_rng(0)
    x = rng.integers(-(2**31), 2**31, (64, 128), dtype=np.int64).astype(np.int32)
    x.view(np.uint8).reshape(-1)[:256] = np.arange(256, dtype=np.uint8)
    for byte in (0x2C, 0x22, 0x0A, 0x0D, 0x00, 0xFF, 0x80, 0x01):
        a = np.asarray(jax.jit(lambda v, b=byte: swar_eq(v, b))(jnp.asarray(x)))
        b = np.asarray(jax.jit(lambda v, b=byte: swar_eq_alt(v, b))(jnp.asarray(x)))
        np.testing.assert_array_equal(a, b, err_msg=hex(byte))
