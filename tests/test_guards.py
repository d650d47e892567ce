"""Round-2 contract guards: backend validation, artifact fingerprints,
gather truncation signaling, int32 capacity guards."""

import numpy as np
import pytest

from csv_simd_tpu import golden
from csv_simd_tpu.device_tape import DeviceTape
from csv_simd_tpu.errors import InvalidCsvFormat
from csv_simd_tpu.index import build_index
from csv_simd_tpu.offsetfree import PackedDeviceTape
from csv_simd_tpu.streaming import StreamingIndexBuilder

CSV = b'a,b,c\n1,"x,y",3\n4,5,6\n'


def test_unknown_backend_rejected():
    with pytest.raises(ValueError, match="unknown backend"):
        build_index(CSV, backend="goldenn")
    with pytest.raises(ValueError, match="unknown backend"):
        b = StreamingIndexBuilder(backend="gold")
        b.feed(CSV)


def test_streaming_golden_backend_runs_golden(monkeypatch):
    """backend='golden' must actually run the NumPy oracle (round-1 bug:
    it silently fell through to the jnp path)."""
    import csv_simd_tpu.index as index_mod

    def boom(*a, **k):  # any device-path entry would be a lie
        raise AssertionError("golden backend must not touch device paths")

    monkeypatch.setattr(index_mod, "stage1_jnp", boom)
    monkeypatch.setattr(index_mod, "stage1_words", boom)
    b = StreamingIndexBuilder(backend="golden")
    b.feed(CSV[:7])
    b.feed(CSV[7:])
    np.testing.assert_array_equal(b.finish(), golden.structural_index(CSV))


def test_build_index_golden_backend():
    np.testing.assert_array_equal(
        build_index(CSV, backend="golden"), golden.structural_index(CSV)
    )


def test_packed_seq_fingerprint_refuses_stale(tmp_path):
    pt = PackedDeviceTape(CSV)
    p = tmp_path / "idx.npz"
    pt.save(p)
    # same length, different content
    other = CSV.replace(b"4,5,6", b"7,8,9")
    with pytest.raises(InvalidCsvFormat, match="fingerprint"):
        PackedDeviceTape.load(p, other)
    # the genuine bytes still load
    pt2 = PackedDeviceTape.load(p, CSV)
    assert int(pt2.record_cnt) == int(pt.record_cnt)


def test_offsets_fingerprint_catches_mid_file_edit(tmp_path):
    """Full-content hash: an edit in the middle of a large buffer (same
    head/tail) must be refused (round-1 hashed head+tail only)."""
    from csv_simd_tpu.api import create_from_bytes
    from csv_simd_tpu.artifact import load_tape, save_tape
    from csv_simd_tpu.errors import InvalidState

    rows = b"".join(b"%d,zz,3\n" % (i % 10) for i in range(4000))
    data = b"a,b,c\n" + rows
    tape = create_from_bytes(data, backend="golden")
    p = tmp_path / "t.npz"
    save_tape(tape, p)
    mid = len(data) // 2
    edited = data[:mid] + b"#" + data[mid + 1 :]
    assert len(edited) == len(data) and edited[:4096] == data[:4096]
    with pytest.raises(InvalidState):
        load_tape(p, edited)


def test_truncation_raises_and_opt_in():
    tape = PackedDeviceTape(b'a,b\nlongvalue123,2\nxx,4\n')
    out, ln, v = tape.gather_fields(
        np.array([0, 1]), np.array([0, 0]), max_len=4
    )
    with pytest.raises(ValueError, match="truncated"):
        tape.to_host_lists(out, ln, v)
    vals = tape.to_host_lists(out, ln, v, allow_truncated=True)
    assert vals[0] == b"long" and vals[1] == b"xx"


def test_device_tape_int32_guard():
    import jax.numpy as jnp

    data = jnp.zeros(8, jnp.uint8)
    big_index = np.array([0, 2**31 + 5], dtype=np.int64)
    with pytest.raises(ValueError, match="int32 offsets"):
        DeviceTape(data, big_index, 3, 3, 1)


def test_load_tape_accepts_packed_seq(tmp_path):
    """One artifact family: the offsets-free packed_seq artifact also
    reconstructs a host Tape (cross-decoding between serving stacks)."""
    from csv_simd_tpu import create_from_bytes
    from csv_simd_tpu.artifact import load_tape

    pt = PackedDeviceTape(CSV)
    p = tmp_path / "seq.npz"
    pt.save(p)
    tape = load_tape(p, CSV)
    want = create_from_bytes(CSV, backend="golden")
    np.testing.assert_array_equal(tape.index, want.index)
    assert tape.seek_field(0, 1) == b'"x,y"'
