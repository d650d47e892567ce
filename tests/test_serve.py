"""Serving-layer tests: exact parity with the reference's RecordSource
semantics (record_source.rs:68-147) plus the batched/column paths the CPU
reference could not offer."""

import numpy as np

from csv_simd_tpu import create_from_bytes


def test_seek_field_contract(sample_csv):
    """SURVEY.md §8.5: seek keeps leading whitespace and quotes; the +1
    skips the preceding delimiter; header occupies stride slot 0."""
    tape = create_from_bytes(sample_csv, backend="golden")
    assert tape.seek_field(0, 0) == b"Edm nd"
    assert tape.seek_field(0, 1) == b"3"
    assert tape.seek_field(0, 2) == b' "o"'  # whitespace + quotes preserved
    assert tape.seek_field(1, 0) == b"Charlotte"


def test_seek_record(sample_csv):
    tape = create_from_bytes(sample_csv, backend="golden")
    assert tape.seek_record(0) == b'Edm nd,3, "o"'
    assert tape.seek_record(1) == b"Charlotte,     4, Yes"


def test_out_of_range_returns_none(sample_csv):
    tape = create_from_bytes(sample_csv, backend="golden")
    # bounds: record_idx + 1 >= record_cnt -> None (record_source.rs:77-80)
    assert tape.seek_record(tape.record_cnt - 1) is None
    assert tape.seek_record(tape.record_cnt) is None
    assert tape.seek_field(0, tape.field_cnt) is None
    assert tape.seek_field(-1, 0) is None
    # last valid record
    assert tape.seek_record(tape.record_cnt - 2) is not None


def test_crlf_serving(sample_rx):
    tape = create_from_bytes(sample_rx, backend="golden")
    assert tape.seek_field(0, 0) == b"1003002813"
    assert tape.seek_field(0, 2) == b"FAMILY PRACTICE"
    # the quoted field keeps its quotes; its inner comma was masked
    assert tape.seek_field(1, 2) == b'"INTERNAL MED, CARD. ELECTROPHYSIOLOGY"'
    # record excludes the CR (seek_record spans field_cnt slots; slot
    # field_cnt is the \r)
    rec = tape.seek_record(0)
    assert rec is not None and not rec.endswith(b"\r")


def test_column_extraction(sample_csv):
    tape = create_from_bytes(sample_csv, backend="golden")
    col0 = tape.column(0)
    assert len(col0) == tape.num_data_records
    assert col0[0] == b"Edm nd"
    assert col0[1] == b"Charlotte"
    # batched field_slices agree with scalar seeks across all fields
    for f in range(tape.field_cnt):
        starts, ends = tape.column_slices(f)
        for r in range(tape.num_data_records):
            assert tape.data_bytes[int(starts[r]) : int(ends[r])] == tape.seek_field(
                r, f
            )


def test_field_slices_batched(sample_rx):
    tape = create_from_bytes(sample_rx, backend="golden")
    recs = np.array([0, 1, 2, 0])
    fields = np.array([0, 2, 7, 5])
    starts, ends = tape.field_slices(recs, fields)
    for i in range(len(recs)):
        expect = tape.seek_field(int(recs[i]), int(fields[i]))
        assert tape.data_bytes[int(starts[i]) : int(ends[i])] == expect
