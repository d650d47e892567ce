"""Frame persistence (save/load columnar artifact) and the CSV writer
(write_csv round-trip): Frame -> csv -> Frame and Frame -> npz -> Frame
must preserve values, ok masks, schema, and text exactly."""

import io

import numpy as np
import pytest

import csv_simd_tpu as cst
from csv_simd_tpu.frame import Col, write_csv


CSV = (
    b"sym,qty,price,day,ts,note\n"
    b'AAPL,10,1.50,2024-01-02,2024-01-02T10:00:05,"hi, there"\n'
    b"MSFT,-3,0.07,2024-02-28,2024-02-28 23:59:59,plain\n"
    b'"GO,OG",bad!,12.00,2024-12-31,2024-12-31T00:00:00,"say ""hi"""\n'
    b"AMZN,2147483647,-0.25,1969-07-20,1970-01-01T00:00:00, padded \n"
)


def _frame():
    return cst.read_typed(
        CSV,
        {"sym": "str", "qty": "int32", "price": "decimal:2",
         "day": "date", "ts": "datetime:s", "note": Col("str", trim=False)},
    )


def test_roundtrip_csv():
    fr = _frame()
    blob = write_csv(fr)
    fr2 = cst.read_typed(blob, fr.schema)
    assert fr2.num_records == fr.num_records
    for n in fr.names:
        a, b = fr[n], fr2[n]
        oa, ob = fr.ok(n), fr2.ok(n)
        if oa is not None:
            assert oa.tolist() == ob.tolist(), n
            assert a[oa].tolist() == b[ob].tolist(), n
        else:
            assert a.tolist() == b.tolist(), n


def test_writer_quoting_rules():
    fr = _frame()
    blob = write_csv(fr)
    lines = blob.split(b"\n")
    # comma-field and quote-field re-quoted; doubled quotes escaped
    assert b'"GO,OG"' in lines[3]
    assert b'"say ""hi"""' in lines[3]
    assert b'"hi, there"' in lines[1]
    # bad qty -> empty field (missing data), not a bogus zero
    assert lines[3].split(b",")[2] == b""


def test_writer_decimal_and_float_text():
    fr = cst.read_typed(
        b"d0,d3,f\n-5,1.234,1.1\n7,-0.001,2\n",
        {"d0": "decimal:0", "d3": "decimal:3", "f": "float"},
    )
    blob = write_csv(fr)
    body = blob.split(b"\n")[1:3]
    assert body[0] == b"-5,1.234,1.1"  # no float64 repr noise
    assert body[1] == b"7,-0.001,2"


def test_writer_no_header_and_path(tmp_path):
    fr = _frame()
    p = tmp_path / "out.csv"
    assert write_csv(fr, p, header=False) is None
    data = p.read_bytes()
    assert not data.startswith(b"sym")
    assert data.count(b"\n") == fr.num_records


def test_writer_custom_dialect():
    from csv_simd_tpu.config import Dialect

    d = Dialect(delimiter=0x3B, quote=0x27)
    fr = cst.read_typed(b"a,b\nx;y,2\n", {"a": "str", "b": "int32"})
    blob = write_csv(fr, dialect=d)
    # the ; inside the value must now be quoted with '
    assert blob.split(b"\n")[1] == b"'x;y';2"


def test_frame_save_load(tmp_path):
    fr = _frame()
    p = tmp_path / "frame.npz"
    fr.save(p)
    fr2 = cst.Frame.load(p)
    assert fr2.names == fr.names
    assert fr2.num_records == fr.num_records
    assert fr2.schema == fr.schema
    assert fr2.records.tolist() == fr.records.tolist()
    for n in fr.names:
        assert fr2[n].tolist() == fr[n].tolist(), n
        oa, ob = fr.ok(n), fr2.ok(n)
        assert (oa is None) == (ob is None)
        if oa is not None:
            assert oa.tolist() == ob.tolist()


def test_save_load_text_nul_safe(tmp_path):
    fr = cst.read_typed(b"b\nx\n", {"b": "bytes"})
    fr._columns["b"] = np.array([b"a\x00b"], dtype=object)  # embedded NUL
    p = tmp_path / "f.npz"
    fr.save(p)
    assert cst.Frame.load(p)["b"][0] == b"a\x00b"


def test_save_load_empty(tmp_path):
    fr = cst.read_typed(b"a,b\n", {"a": "int32", "b": "str"})
    p = tmp_path / "empty.npz"
    fr.save(p)
    fr2 = cst.Frame.load(p)
    assert fr2.num_records == 0
    assert fr2["a"].shape == (0,)
    assert fr2["b"].shape == (0,)


def test_roundtrip_after_query():
    fr = cst.read_typed(CSV, {"sym": "str", "qty": "int32"},
                        where=("qty", ">", 0), order_by="qty",
                        descending=True)
    blob = write_csv(fr)
    fr2 = cst.read_typed(blob, fr.schema)
    assert fr2["qty"].tolist() == fr["qty"].tolist()
    assert fr2["sym"].tolist() == fr["sym"].tolist()
