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


# -- device-side stage-2 decode (round 2): gather-compaction on device
#    must match the host decoder byte-for-byte --

def _device_tape(data):
    from csv_simd_tpu.device_tape import DeviceTape

    tape = create_from_bytes(data, backend="golden")
    return tape, DeviceTape.from_tape(tape)


def test_device_decode_matches_decoded_view():
    data = (
        b"a,b,c\n"
        b'1,"x,y",  pad  \n'
        b'"he said ""hi""",2,3\n'
        b' "q" ,"""",  \n'
        b'"  inner  ",plain,"5"\n'
    )
    tape, dt = _device_tape(data)
    view = DecodedView(tape)
    for f in range(tape.field_cnt):
        got = dt.column_decoded(f, max_len=32)
        assert got == view.column(f), f


def test_device_decode_no_trim():
    data = b"a,b\n  x  ,\"  y  \"\n"
    tape, dt = _device_tape(data)
    view = DecodedView(tape, trim=False)
    for f in range(2):
        assert dt.column_decoded(f, max_len=16, trim=False) == view.column(f)


def test_device_decode_corpus():
    for case in basic_cases():
        if not case.should_build:
            continue
        tape, dt = _device_tape(case.data)
        view = DecodedView(tape)
        for f in range(tape.field_cnt):
            got = dt.column_decoded(f, max_len=96)
            assert got == view.column(f), (case.name, f)


def test_device_decode_custom_dialect():
    d = Dialect(delimiter=0x3B, quote=0x27)
    data = b"a;b\n'x;y';'it''s'\n"
    tape = create_from_bytes(data, dialect=d, backend="golden")
    from csv_simd_tpu.device_tape import DeviceTape

    dt = DeviceTape.from_tape(tape)
    view = DecodedView(tape, dialect=d)
    for f in range(2):
        assert dt.column_decoded(f, max_len=16, dialect=d) == view.column(f)


def test_device_decode_offsetfree():
    from csv_simd_tpu.offsetfree import PackedDeviceTape

    data = b'a,b\n"x,""z""",  2  \nplain,"y"\n'
    pt = PackedDeviceTape(data)
    tape = create_from_bytes(data, backend="golden")
    view = DecodedView(tape)
    recs = np.array([0, 0, 1, 1])
    flds = np.array([0, 1, 0, 1])
    out, ln, v = pt.gather_decoded(recs, flds, max_len=24)
    vals = pt.to_host_lists(out, ln, v)
    want = [view.seek_field(int(r), int(f)) for r, f in zip(recs, flds)]
    assert vals == want


def test_float_exp_parse():
    data = (
        b"a,b\n"
        b"1.5e3,x\n"
        b"-2.25E-2,x\n"
        b"1e0,x\n"
        b"+.5e1,x\n"
        b"3.,x\n"
        b"7,x\n"
        b" 42e1,x\n"
        b"bad e,x\n"
        b"1e,x\n"
        b"1e+,x\n"
        b"2e3q,x\n"
        b"1.2.3e1,x\n"
    )
    tape, dt = _device_tape(data)
    vals, ok = dt.column_float32_exp(0)
    vals, ok = np.asarray(vals), np.asarray(ok)
    want = [1500.0, -0.0225, 1.0, 5.0, 3.0, 7.0, 420.0]
    assert ok[:7].all() and not ok[7:].any(), ok
    np.testing.assert_allclose(vals[:7], np.float32(want), rtol=1e-6)
