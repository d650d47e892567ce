"""v4 sequential-layout kernel: interpret-mode bit-identity against the
XLA oracle (stage1_seq_xla), carry chaining, the fused non-ASCII
counter, and corpus coverage. Compiled-mode identity runs on hardware
via tools/verify_chip.py and the bench.py gate."""

import numpy as np
import jax.numpy as jnp
import pytest

from csv_simd_tpu import golden
from csv_simd_tpu.ops.stage1_v2 import pad_to_words
from csv_simd_tpu.ops.stage1_v3 import stage1_seq_xla
from csv_simd_tpu.ops.stage1_v4 import stage1_fused_v4

from corpus import basic_cases


def _unpack_seq(packed, n):
    return np.unpackbits(
        np.ascontiguousarray(np.asarray(packed)).view("<u4").view(np.uint8),
        bitorder="little",
    )[:n]


def _rand(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.choice(
        np.frombuffer(b'ab"",\n\rx,z":; \t\xc3\xa9', dtype=np.uint8), size=n
    )


@pytest.mark.parametrize("carry", [0, 1])
def test_v4_matches_seq_oracle(carry):
    data = _rand(300_000)
    w2d = jnp.asarray(pad_to_words(data))
    ref, rpar = stage1_seq_xla(w2d, carry)
    got, gpar, _na = stage1_fused_v4(w2d, carry, interpret=True)
    assert bool(jnp.array_equal(ref, got))
    assert int(rpar) == int(gpar)


def test_v4_multi_tile_carry():
    """Quote parity must chain across grid steps (tiles)."""
    inner = b"x," * 200_000  # quoted span crossing several 256 KiB tiles
    data = b'a,b\n"' + inner + b'end",2\nq,w\n'
    arr = np.frombuffer(data, dtype=np.uint8)
    w2d = jnp.asarray(pad_to_words(arr))
    assert w2d.shape[0] > 512  # really multiple tiles
    got, _p, _na = stage1_fused_v4(w2d, 0, interpret=True)
    mask = _unpack_seq(got, arr.size)
    np.testing.assert_array_equal(mask, golden.structural_mask(arr))


def test_v4_nonascii_count():
    data = _rand(100_000, seed=3)
    w2d = jnp.asarray(pad_to_words(data))
    _g, _p, na = stage1_fused_v4(w2d, 0, interpret=True)
    assert int(na) == int((data >= 0x80).sum())
    ascii_only = np.frombuffer(b"a,b\n1,2\n" * 100, dtype=np.uint8)
    _g, _p, na0 = stage1_fused_v4(
        jnp.asarray(pad_to_words(ascii_only)), 0, interpret=True
    )
    assert int(na0) == 0


def test_v4_count_nonascii_opt_out():
    """count_nonascii=False skips the fused reduce: packed output is
    unchanged and the sentinel -1 ("not counted") comes back."""
    data = _rand(100_000, seed=5)
    w2d = jnp.asarray(pad_to_words(data))
    ref, rpar, _na = stage1_fused_v4(w2d, 0, interpret=True)
    got, gpar, na = stage1_fused_v4(
        w2d, 0, interpret=True, count_nonascii=False
    )
    assert bool(jnp.array_equal(ref, got))
    assert int(rpar) == int(gpar)
    assert int(na) == -1


@pytest.mark.parametrize("case", basic_cases(), ids=lambda c: c.name)
def test_v4_corpus(case):
    arr = np.frombuffer(case.data, dtype=np.uint8)
    if arr.size == 0:
        return
    w2d = jnp.asarray(pad_to_words(arr))
    got, _p, _na = stage1_fused_v4(w2d, 0, interpret=True)
    mask = _unpack_seq(got, arr.size)
    np.testing.assert_array_equal(
        mask, golden.structural_mask(arr), err_msg=case.name
    )


@pytest.mark.parametrize("case", basic_cases(), ids=lambda c: c.name)
def test_v4_variant_mask_chains_corpus(case):
    """CLAUDE.md rule: mask/carry changes get corpus coverage. The
    round-4 base_mode='shift' and compress_mode='m80' chains propagate
    garbage outside bit-7 positions by design — the hi_bit_quote_*
    cases (bytes whose low-7 bits equal structural chars with bit 7
    set) are exactly what pins them."""
    arr = np.frombuffer(case.data, dtype=np.uint8)
    if arr.size == 0:
        return
    w2d = jnp.asarray(pad_to_words(arr))
    want = golden.structural_mask(arr)
    for kw in (dict(base_mode="shift"),
               dict(compress_mode="m80"),
               dict(base_mode="shift", compress_mode="m80")):
        got, _p, _na = stage1_fused_v4(
            w2d, 0, interpret=True, count_nonascii=False, **kw)
        np.testing.assert_array_equal(
            _unpack_seq(got, arr.size), want,
            err_msg=f"{case.name} {kw}")


def test_v4_emit_counts():
    """Fused per-row popcounts match a popcount over the packed words
    and the packed output is unchanged by the extra output."""
    import jax

    data = _rand(200_000, seed=9)
    w2d = jnp.asarray(pad_to_words(data))
    ref, _p = stage1_seq_xla(w2d, 0)
    got, _p2, _na, cnt = stage1_fused_v4(
        w2d, 0, interpret=True, emit_counts=True
    )
    assert bool(jnp.array_equal(ref, got))
    want = np.asarray(jax.lax.population_count(ref)).sum(axis=1)
    np.testing.assert_array_equal(np.asarray(cnt)[:, 0], want)


@pytest.mark.parametrize("pack_mode", ["mm1", "mm1r"])
def test_v4_pack_modes_match_mm2(pack_mode):
    """The single-(128,32)-matmul packs must emit the exact packed
    words of the default two-matmul construction (interpret mode here;
    the COMPILED check is bench/verify_chip territory — the round-2
    Mosaic miscompiled exactly this path while interpret stayed
    bit-exact, so a green interpret run alone never justifies
    adoption)."""
    data = _rand(200_000, seed=3)
    w2d = jnp.asarray(pad_to_words(data))
    for carry in (0, 1):
        ref, rpar, _ = stage1_fused_v4(w2d, carry, interpret=True)
        got, gpar, _ = stage1_fused_v4(w2d, carry, interpret=True,
                                       pack_mode=pack_mode)
        assert bool(jnp.array_equal(ref, got))
        assert int(rpar) == int(gpar)


@pytest.mark.parametrize(
    "kw",
    [
        dict(base_mode="shift"),
        dict(compress_mode="m80"),
        dict(base_mode="shift", compress_mode="m80"),
        dict(pack_mode="roll"),
        dict(pack_mode="roll", base_mode="shift", compress_mode="m80"),
        dict(pack_mode="mm1w"),
    ],
)
def test_v4_variant_modes_match_oracle(kw):
    """Round-4 ablation variants (tools/ablate4.py) stay bit-identical
    in interpret mode: base sign-broadcast via shifts, 0x80-domain
    nibble compress, the non-MXU roll-ladder pack, and the wide
    single-matmul pack. (mm1w MISCOMPILES on the chip — kept here so
    interpret-vs-compiled drift keeps being detectable; production is
    gated by bench.py/tools/ablate4.py on hardware.)"""
    data = _rand(200_000, seed=11)
    w2d = jnp.asarray(pad_to_words(data))
    ref, rpar = stage1_seq_xla(w2d, 0)
    got, gpar, _na = stage1_fused_v4(
        w2d, 0, interpret=True, count_nonascii=False, **kw)
    assert bool(jnp.array_equal(ref, got))
    assert int(rpar) == int(gpar)


def test_v4_m80_emit_counts():
    data = _rand(150_000, seed=12)
    w2d = jnp.asarray(pad_to_words(data))
    got, _p, _na, counts = stage1_fused_v4(
        w2d, 0, interpret=True, count_nonascii=False,
        compress_mode="m80", emit_counts=True)
    mask = _unpack_seq(got, data.size)
    np.testing.assert_array_equal(mask, golden.structural_mask(data))
    assert int(np.asarray(counts).sum()) == int(mask.sum())


def test_v4_bf16_scan_variant():
    """scan_mm='bf16' (homogeneous-MXU variant, measured-refuted for
    production) stays bit-identical."""
    data = _rand(200_000, seed=21)
    w2d = jnp.asarray(pad_to_words(data))
    ref, rpar = stage1_seq_xla(w2d, 0)
    got, gpar, _na = stage1_fused_v4(
        w2d, 0, interpret=True, count_nonascii=False, scan_mm="bf16")
    assert bool(jnp.array_equal(ref, got))
    assert int(rpar) == int(gpar)
