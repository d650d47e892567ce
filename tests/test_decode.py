"""Decoding-layer tests: RFC-4180 unquote/unescape/trim, the decoded
facade, typed columns, and streaming checkpoint/resume."""

import io

import numpy as np
import pytest

from csv_simd_tpu import Dialect, create_from_bytes, golden
from csv_simd_tpu.decode import DecodedView, decode_field, decode_str
from csv_simd_tpu.streaming import StreamingIndexBuilder

from corpus import basic_cases, synthetic_wide_table


def test_decode_field_basics():
    assert decode_field(b"plain") == b"plain"
    assert decode_field(b'"quoted"') == b"quoted"
    assert decode_field(b'"a,b"') == b"a,b"
    assert decode_field(b'"he said ""hi"""') == b'he said "hi"'
    assert decode_field(b"  padded  ") == b"padded"
    assert decode_field(b"  padded  ", trim=False) == b"  padded  "
    assert decode_field(b' "q" ') == b"q"  # trim outside quotes
    assert decode_field(b'"  inner  "') == b"  inner  "  # inner ws kept
    assert decode_field(None) is None
    assert decode_field(b'"') == b'"'  # lone quote survives
    assert decode_field(b'""') == b""


def test_decode_custom_dialect():
    d = Dialect(delimiter=0x3B, quote=0x27)
    assert decode_field(b"'x;y'", d) == b"x;y"
    assert decode_field(b"'it''s'", d) == b"it's"


def test_decoded_view_matches_python_csv():
    """With decoding, our values equal Python csv's parse exactly."""
    import csv as pycsv

    for case in basic_cases():
        if not case.should_build or case.name in (
            "unterminated_quote_masks_rest",
            "mac_cr_endings",  # python csv's \r-only handling differs
        ):
            continue
        text = case.data.decode("utf-8")
        if text.startswith("﻿"):
            text = text[1:]
        rows = list(pycsv.reader(io.StringIO(text)))
        tape = create_from_bytes(case.data, backend="golden")
        view = DecodedView(tape, trim=False)
        for r in range(tape.num_data_records):
            for f in range(tape.field_cnt):
                got = view.seek_field_str(r, f)
                assert got == rows[r + 1][f], (case.name, r, f)


def test_typed_columns():
    data = b"id,score\n1,2.5\n2,3.5\n3,4.0\n"
    tape = create_from_bytes(data, backend="golden")
    view = DecodedView(tape)
    np.testing.assert_array_equal(view.column_int(0), [1, 2, 3])
    np.testing.assert_allclose(view.column_float(1), [2.5, 3.5, 4.0])


def test_decoded_rows_iter():
    data = b'a,b\n1,"x,y"\n2,z\n'
    view = DecodedView(create_from_bytes(data, backend="golden"))
    rows = list(view.iter_rows())
    assert rows == [[b"1", b"x,y"], [b"2", b"z"]]
    assert view.row(99) is None


def test_streaming_checkpoint_resume(tmp_path):
    data = synthetic_wide_table(120_000)
    cut = 53_211
    b1 = StreamingIndexBuilder(backend="jnp")
    b1.feed(data[:cut])
    p = str(tmp_path / "ckpt.npz")
    b1.save(p)
    b2 = StreamingIndexBuilder.load(p, backend="jnp")
    assert b2.bytes_consumed == cut
    assert b2.quote_parity == b1.quote_parity
    b2.feed(data[cut:])
    np.testing.assert_array_equal(b2.finish(), golden.structural_index(data))
