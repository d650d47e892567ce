"""read_typed / Frame endpoint tests: schema inference, typed
materialization over both tape engines, strict mode, auto-sized gather
windows, and differential checks vs host Python parsing."""

import numpy as np
import pytest

import csv_simd_tpu as ct
from csv_simd_tpu.frame import (
    Col,
    _classify_values,
    infer_schema,
    parse_spec,
    read_typed,
)


def _csv(tmp_path, text: bytes, name="f.csv"):
    p = tmp_path / name
    p.write_bytes(text)
    return str(p)


MIXED = (
    b"id,price,qty,day,name,note\n"
    + b"\n".join(
        f'{i},{i * 1.5:.2f},{i * 3},2024-0{i % 9 + 1}-1{i % 9},'
        f'"n{i}, x",free text {i}'.encode()
        for i in range(40)
    )
    + b"\n"
)


# -- spec parsing -------------------------------------------------------

def test_parse_spec_forms():
    assert parse_spec("int32") == Col("int32")
    assert parse_spec("decimal") == Col("decimal", scale=2)
    assert parse_spec("decimal:4") == Col("decimal", scale=4)
    assert parse_spec("str:128") == Col("str", max_len=128)
    c = Col("float")
    assert parse_spec(c) is c
    with pytest.raises(ValueError):
        parse_spec("uint8")
    with pytest.raises(TypeError):
        parse_spec(42)


# -- inference ----------------------------------------------------------

def test_classify_values():
    assert _classify_values([b"1", b"-5", b" 42 "]).type == "int32"
    assert _classify_values([b"3000000000"]) == Col("decimal", scale=0)
    assert _classify_values([b"1.50", b"2.25"]) == Col("decimal", scale=2)
    # textual fractional digits drive the scale, not significant ones:
    # the exact parser refuses "1.50" at scale 1
    assert _classify_values([b"1.50"]).scale == 2
    assert _classify_values([b"1e5", b"2.5"]).type == "float"
    assert _classify_values([b"2024-01-02"]).type == "date"
    assert _classify_values([b"abc", b"1"]).type == "str"
    assert _classify_values([b"", None]).type == "str"
    # empty fields are wildcards for the non-empty type
    assert _classify_values([b"7", b""]).type == "int32"


def test_infer_schema_end_to_end(tmp_path):
    f = read_typed(_csv(tmp_path, MIXED))
    types = {n: f.schema[n].type for n in f.names}
    assert types == {
        "id": "int32", "price": "decimal", "qty": "int32",
        "day": "date", "name": "str", "note": "str",
    }
    assert f.schema["price"].scale == 2


# -- typed materialization ----------------------------------------------

@pytest.mark.parametrize("engine", ["offsets", "packed"])
def test_read_typed_values(tmp_path, engine):
    f = read_typed(_csv(tmp_path, MIXED), engine=engine)
    assert len(f) == 40
    np.testing.assert_array_equal(f["id"], np.arange(40))
    np.testing.assert_array_equal(f["qty"], np.arange(40) * 3)
    # exact cents as scaled int64
    np.testing.assert_array_equal(
        f["price"], np.round(np.arange(40) * 1.5 * 100).astype(np.int64)
    )
    assert f["price"].dtype == np.int64
    assert f["day"].dtype == np.dtype("datetime64[D]")
    assert str(f["day"][0]) == "2024-01-10"
    assert f["name"][1] == "n1, x"  # decoded: unquoted, comma kept
    assert f["note"][2] == "free text 2"
    for n in ("id", "price", "qty", "day"):
        assert f.ok(n).all()
    assert f.ok("name") is None


def test_read_typed_explicit_schema_and_indices(tmp_path):
    path = _csv(tmp_path, MIXED)
    f = read_typed(path, {"price": "float", 2: "int32", "note": "bytes"})
    assert f.names == ["price", "qty", "note"]
    np.testing.assert_allclose(f["price"], np.arange(40) * 1.5, rtol=1e-6)
    assert f["note"][0] == b"free text 0"
    with pytest.raises(ValueError, match="twice"):
        read_typed(path, {"price": "float", 1: "int32"})
    with pytest.raises(KeyError, match="nope"):
        read_typed(path, {"nope": "int32"})
    with pytest.raises(KeyError, match="out of range"):
        read_typed(path, {17: "int32"})


def test_read_typed_sources(tmp_path):
    # bytes, Tape, DeviceTape, PackedDeviceTape sources all serve
    f_bytes = read_typed(MIXED, {"qty": "int32"})
    tape = ct.create_from_bytes(MIXED, backend="golden")
    f_tape = read_typed(tape, {"qty": "int32"})
    f_dev = read_typed(ct.DeviceTape.from_tape(tape), {"qty": "int32"})
    f_packed = read_typed(ct.PackedDeviceTape(MIXED), {"qty": "int32"})
    for f in (f_bytes, f_tape, f_dev, f_packed):
        np.testing.assert_array_equal(f["qty"], np.arange(40) * 3)


def test_strict_and_masks(tmp_path):
    path = _csv(tmp_path, b"a,b\n1,xx\n2,3\n")
    f = read_typed(path, {"b": "int32"})
    np.testing.assert_array_equal(f.ok("b"), [False, True])
    np.testing.assert_array_equal(f["b"], [0, 3])
    with pytest.raises(ct.InvalidCsvFormat, match="row 0"):
        read_typed(path, {"b": "int32"}, strict=True)


def test_auto_window_covers_long_fields(tmp_path):
    # a 100-digit-ish field would be silently truncated by a fixed
    # 8-byte window; auto-sizing must cover it
    long = "9" * 60
    path = _csv(tmp_path, f"a,b\nshort,{long}\nx,{long}\n".encode())
    f = read_typed(path, {"b": "bytes", "a": "str"})
    assert f["b"][0] == long.encode()
    assert f["a"][0] == "short"


def test_zero_records(tmp_path):
    f = read_typed(_csv(tmp_path, b"a,b\n"))
    assert len(f) == 0 and f.names == ["a", "b"]
    assert f["a"].shape == (0,)


def test_columns_restrict_inference(tmp_path):
    f = read_typed(_csv(tmp_path, MIXED), columns=["id", "day"])
    assert f.names == ["id", "day"]


def test_infer_schema_direct(tmp_path):
    tape = ct.create_from_bytes(MIXED, backend="golden")
    dt = ct.DeviceTape.from_tape(tape)
    sch = infer_schema(dt, tape.header.names, sample=10)
    assert sch["id"].type == "int32"
    assert sch["day"].type == "date"


def test_read_typed_corpus(tmp_path):
    from csv_simd_tpu.corpus_api import CsvCorpus

    paths = []
    for k in range(3):
        rows = b"".join(
            f"{k * 10 + i},{(k * 10 + i) * 1.5:.2f}\n".encode()
            for i in range(4)
        )
        p = tmp_path / f"part{k}.csv"
        p.write_bytes(b"id,price\n" + rows)
        paths.append(str(p))
    c = CsvCorpus(paths, backend="golden")
    f = read_typed(c)
    assert len(f) == 12
    want_ids = np.concatenate([np.arange(k * 10, k * 10 + 4)
                               for k in range(3)])
    np.testing.assert_array_equal(f["id"], want_ids)
    np.testing.assert_array_equal(
        f["price"], (want_ids * 150).astype(np.int64)
    )
    assert f.ok("id").all() and f.schema["price"].scale == 2


def test_read_typed_corpus_schema_locked(tmp_path):
    # file 1 alone would infer int32 for column v; file 0's inference
    # (decimal) must win so dtypes are stable across the corpus
    from csv_simd_tpu.corpus_api import CsvCorpus

    a = tmp_path / "a.csv"
    a.write_bytes(b"v\n1.25\n2.50\n")
    b = tmp_path / "b.csv"
    b.write_bytes(b"v\n3\n4\n")
    f = read_typed(CsvCorpus([str(a), str(b)], backend="golden"))
    assert f.schema["v"].type == "decimal"
    np.testing.assert_array_equal(f["v"], [125, 250, 300, 400])
    assert f.ok("v").all()


def test_frame_dunder_surface(tmp_path):
    f = read_typed(_csv(tmp_path, MIXED), {"id": "int32"})
    assert "id" in f and "qty" not in f
    assert list(f.keys()) == ["id"]
    assert "records=40" in repr(f)
    assert set(f.to_dict()) == {"id"}
