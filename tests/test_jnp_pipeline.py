"""XLA (jnp) pipeline tests: bit-identity with the golden oracle on the
reference fixtures, carry propagation, packing round-trip, and the
device-side fixed-capacity compaction."""

import numpy as np
import jax.numpy as jnp
import pytest

from csv_simd_tpu import golden
from csv_simd_tpu.index import (
    build_index,
    build_index_device,
    pad_to_grid,
    stage1_words,
)
from csv_simd_tpu.ops.pack import pack_words, unpack_words_host, unpack_words_device
from csv_simd_tpu.ops.compact import extract_offsets_device


@pytest.mark.parametrize("fixture", ["reader_test01", "sample_csv", "sample_rx"])
def test_fixture_parity(fixture, request):
    data = request.getfixturevalue(fixture)
    want = golden.structural_index(data)
    got = build_index(data, backend="jnp")
    np.testing.assert_array_equal(got, want)


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    mask = rng.integers(0, 2, size=(64, 128)).astype(np.int32)
    words = np.asarray(pack_words(jnp.asarray(mask)))
    back = unpack_words_host(words, 64 * 128)
    np.testing.assert_array_equal(back, mask.reshape(-1))
    back_dev = np.asarray(unpack_words_device(jnp.asarray(words)))
    np.testing.assert_array_equal(back_dev, mask)


def test_parity_carry_chaining(sample_rx):
    """Processing a buffer in two halves with the carried parity must equal
    one-shot processing — the tile/chunk/shard stitching invariant."""
    data = np.frombuffer(sample_rx, dtype=np.uint8)
    cut = 301  # inside the quoted 'INTERNAL MED, ...' region? any cut works
    left, right = data[:cut], data[cut:]
    w1, n1, p1 = stage1_words(left, backend="jnp")
    w2, n2, p2 = stage1_words(right, backend="jnp", carry_in=p1)
    m1 = unpack_words_host(w1, n1)
    m2 = unpack_words_host(w2, n2)
    combined = np.concatenate([m1, m2])
    full = golden.structural_mask(data)
    np.testing.assert_array_equal(combined, full)
    assert p2 == golden.quote_parity_out(data)


def test_mid_quote_cut_carry():
    data = np.frombuffer(b'a,b\n"x,y,z",2\nq,w\n', dtype=np.uint8)
    # cut inside the quoted region
    cut = 7
    p_left = golden.quote_parity_out(data[:cut])
    assert p_left == 1
    w2, n2, _ = stage1_words(data[cut:], backend="jnp", carry_in=p_left)
    m2 = unpack_words_host(w2, n2)
    np.testing.assert_array_equal(m2, golden.structural_mask(data)[cut:])


def test_device_compaction(sample_csv):
    offsets, count = build_index_device(sample_csv)
    want = golden.structural_index(sample_csv)
    got = np.asarray(offsets)[: count + 1]
    np.testing.assert_array_equal(got, want)


def test_device_compaction_capacity_growth():
    # a buffer that's nearly all structural blows the density heuristic
    data = b"a,b\n" + b",," * 500 + b"\n"
    offsets, count = build_index_device(data, density=0.01)
    want = golden.structural_index(data)
    np.testing.assert_array_equal(np.asarray(offsets)[: count + 1], want)


def test_empty_and_tiny_buffers():
    for data in (b"", b"a", b",", b"\n", b'"'):
        want = golden.structural_index(data)
        got = build_index(data, backend="jnp")
        np.testing.assert_array_equal(got, want)


def test_all_bytes_classified_once():
    """Full 256-byte sweep: device classification == golden LUT classes."""
    from csv_simd_tpu.ops.classify import classify_codes
    from csv_simd_tpu.config import DEFAULT_DIALECT

    data = np.arange(256, dtype=np.uint8)
    got = np.asarray(classify_codes(jnp.asarray(pad_to_grid(data)), DEFAULT_DIALECT))
    want = golden.classify(pad_to_grid(data))
    np.testing.assert_array_equal(got, want)
