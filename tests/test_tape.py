"""Tape layer tests: header sniffing, record geometry, the uniform-stride
invariant, and chunking math — against the reference's verified behavior."""

import numpy as np
import pytest

from csv_simd_tpu import (
    Boundary,
    Header,
    InvalidCsvFormat,
    NewLine,
    boundaries,
    create_from_bytes,
)


def test_header_basic():
    h = Header.parse(b"Name, Number, Done\nrow...")
    assert h.names == ["Name", "Number", "Done"]  # trimmed, tape.rs:261
    assert h.field_cnt == 3
    assert h.new_line is NewLine.LF
    assert h.record_offset == 18


def test_header_crlf():
    h = Header.parse(b"a,b\r\n1,2\r\n")
    assert h.new_line is NewLine.CRLF
    assert h.names == ["a", "b"]


def test_header_bom(sample_rx):
    h = Header.parse(sample_rx)
    assert h.field_cnt == 8
    assert h.new_line is NewLine.CRLF
    assert h.names[0] == "NPI Number"  # BOM stripped


def test_uniform_stride_violation(reader_test01):
    """reader_test01.csv has a ragged last row (trailing comma): the raw
    index is fine but the full tape build must reject it (tape.rs:342-344,
    SURVEY.md §8.4)."""
    with pytest.raises(InvalidCsvFormat):
        create_from_bytes(reader_test01, backend="golden")


def test_sample_tape(sample_csv):
    tape = create_from_bytes(sample_csv, backend="golden")
    assert tape.record_cnt == 15  # includes the header stride
    assert tape.record_jump_size == 3
    assert tape.field_cnt == 3
    assert tape.num_data_records == 14


def test_sample_rx_tape(sample_rx):
    tape = create_from_bytes(sample_rx, backend="golden")
    assert tape.record_jump_size == 9  # CRLF: field_cnt + 1 (tape.rs:318-321)
    assert tape.record_cnt == 8
    assert tape.field_cnt == 8


def test_boundaries_reference_doctest():
    """The reference's only executable spec of chunking (tape.rs:360-384)."""
    r = boundaries(8, 3)
    assert r == [Boundary(0, 3), Boundary(3, 3), Boundary(6, 2)]
    assert sum(b.len for b in r) == 8

    r = boundaries(1000, 12)
    assert r[0] == Boundary(0, 84)
    assert r[1] == Boundary(84, 84)
    assert r[11] == Boundary(917, 83)
    assert sum(b.len for b in r) == 1000

    r = boundaries(8, 12)
    assert r == [Boundary(0, 8)]

    assert boundaries(0, 3) is None
    assert boundaries(5, 0) is None


def test_chunks(sample_csv):
    tape = create_from_bytes(sample_csv, backend="golden")
    chunks = tape.chunks(3)
    assert len(chunks) == 3
    # chunk 0 rebased past the header (tape.rs:117-123)
    assert chunks[0].start == tape.record_jump_size
    assert sum(c.record_cnt for c in chunks) == tape.record_cnt - 1
    # chunk index-slot ranges tile the index contiguously after chunk 0
    for prev, nxt in zip(chunks, chunks[1:]):
        assert prev.end == nxt.start
    # the last chunk ends at the final record boundary
    assert chunks[-1].end == tape.record_cnt * tape.record_jump_size


def test_tape_repr(sample_csv):
    tape = create_from_bytes(sample_csv, backend="golden")
    assert "records=15" in repr(tape)


# ------------------------------------------- quote-aware headers (opt-in)


def test_header_quotes_default_preserves_reference_gap():
    """Default: the raw split (tape.rs:258-262) — a quoted header name
    containing a delimiter inflates field_cnt, and full create() then
    rejects 3-field data with the stride error, exactly like the
    reference would."""
    import pytest

    from csv_simd_tpu import create_from_bytes
    from csv_simd_tpu.errors import InvalidCsvFormat
    from csv_simd_tpu.tape import Header

    data = b'a,"b,c",d\n1,2,3\n'
    h = Header.parse(np.frombuffer(data, np.uint8))
    assert h.names == ["a", '"b', 'c"', "d"]
    assert h.field_cnt == 4
    with pytest.raises(InvalidCsvFormat):
        create_from_bytes(data, backend="golden")


def test_header_quotes_opt_in_end_to_end():
    from csv_simd_tpu import create_from_bytes
    from csv_simd_tpu.config import Dialect

    data = b'a,"b,c",d\n1,2,3\n4,5,6\n'
    tape = create_from_bytes(
        data, backend="golden", dialect=Dialect(header_quotes=True))
    assert tape.header_names() == ["a", "b,c", "d"]
    assert tape.field_cnt == 3
    assert tape.seek_field(0, 1) == b"2"
    assert tape.seek_field(1, 2) == b"6"


def test_header_quotes_newline_and_escapes():
    from csv_simd_tpu.tape import Header, NewLine

    # quoted newline inside a name; escaped "" quotes; CRLF sniff must
    # key off the header-ENDING newline, not the quoted one
    data = b'"x\ny",b\r\n1,2\r\n'
    h = Header.parse(np.frombuffer(data, np.uint8),
                     quote_aware=True)
    assert h.names == ["x\ny", "b"]
    assert h.new_line is NewLine.CRLF
    assert h.record_offset == data.index(b"\r")
    h2 = Header.parse(np.frombuffer(b'"he said ""hi""",v\n1,2\n',
                                    np.uint8), quote_aware=True)
    assert h2.names == ['he said "hi"', "v"]


def test_header_quotes_custom_dialect_and_bom():
    from csv_simd_tpu.tape import Header

    # semicolon dialect with single-quote quoting + BOM skip
    data = "﻿'a;x';b\n1;2\n".encode()
    h = Header.parse(np.frombuffer(data, np.uint8), delimiter=0x3B,
                     quote_aware=True, quote=0x27)
    assert h.names == ["a;x", "b"]


def test_header_quotes_full_pipeline_groupby():
    """Quoted header + the relational layer: columns address by the
    unquoted names across the whole stack."""
    from csv_simd_tpu.config import Dialect
    from csv_simd_tpu.query import groupby_typed

    data = b'"sym,full",qty\nA,1\nB,2\nA,3\n'
    g = groupby_typed(data, "sym,full", "qty",
                      dialect=Dialect(header_quotes=True))
    assert list(g["keys"]) == ["A", "B"]
    assert [int(x) for x in g["sum"]] == [4, 2]
