"""Device set-op executor vs the host row-code oracle (VERDICT r3 #7):
UNION dedupe / EXCEPT / INTERSECT over typed frames, exact equality on
both paths, pandas differential on top."""

import numpy as np
import pandas as pd
import pytest

import csv_simd_tpu.setops as SO
from csv_simd_tpu.sql import sql


def _mk(seed, n=700):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 12, n)
    b = rng.integers(-3, 4, n)
    f = rng.integers(-8, 9, n) / 2.0
    rows = []
    for i in range(n):
        bb = b"oops" if i % 41 == 0 else str(b[i]).encode()
        rows.append(b"%d,%s,%s" % (a[i], bb, repr(f[i]).encode()))
    return b"a,b,f\n" + b"\n".join(rows) + b"\n"


CSV1, CSV2 = _mk(1), _mk(2)
S = {"a": "int32", "b": "int32", "f": "float"}

QUERIES = [
    "SELECT a, b FROM t1 UNION SELECT a, b FROM t2",
    "SELECT a, b, f FROM t1 EXCEPT SELECT a, b, f FROM t2",
    "SELECT a, b FROM t1 INTERSECT SELECT a, b FROM t2",
    "SELECT b FROM t1 UNION SELECT b FROM t2 EXCEPT SELECT b FROM t1"
    " WHERE a > 5",
]


def _rows(fr):
    out = []
    for i in range(len(fr)):
        row = []
        for nm in fr.names:
            v = fr[nm][i]
            okm = fr._ok.get(nm)
            if (okm is not None and not okm[i]) or v is None or (
                    isinstance(v, float) and v != v):
                row.append(None)
            elif isinstance(v, float) or str(
                    getattr(v, "dtype", "")).startswith("float"):
                row.append(round(float(v), 9))
            else:
                row.append(int(v))
        out.append(tuple(row))
    return out


@pytest.mark.parametrize("q", QUERIES)
def test_device_matches_host(q, monkeypatch):
    tables = {"t1": CSV1, "t2": CSV2}
    monkeypatch.setattr(SO, "DEVICE_SETOP_MIN_ROWS", 1)
    dev = sql(q, tables=tables, schema=S)
    monkeypatch.setattr(SO, "DEVICE_SETOP_MIN_ROWS", 10**9)
    host = sql(q, tables=tables, schema=S)
    assert _rows(dev) == _rows(host)


def test_union_pandas_differential(monkeypatch):
    monkeypatch.setattr(SO, "DEVICE_SETOP_MIN_ROWS", 1)
    fr = sql("SELECT a, b FROM t1 UNION SELECT a, b FROM t2",
             tables={"t1": CSV1, "t2": CSV2}, schema=S)
    d1 = pd.read_csv(pd.io.common.BytesIO(CSV1))
    d2 = pd.read_csv(pd.io.common.BytesIO(CSV2))
    for d in (d1, d2):
        d["b"] = pd.to_numeric(d["b"], errors="coerce")
    cat = pd.concat([d1[["a", "b"]], d2[["a", "b"]]])
    want = cat.drop_duplicates(keep="first")
    got = set(_rows(fr))
    wset = {(int(r.a), None if pd.isna(r.b) else int(r.b))
            for r in want.itertuples()}
    assert got == wset
    assert len(fr) == len(wset)


def test_text_columns_fall_back(monkeypatch):
    """A text column keeps the host path (device returns None) and the
    result is still right."""
    calls = {"n": 0}
    real = SO.dedupe_keep

    def spy(fr):
        r = real(fr)
        calls["n"] += 1
        assert r is None
        return r

    monkeypatch.setattr(SO, "DEVICE_SETOP_MIN_ROWS", 1)
    import csv_simd_tpu.sql as Q
    monkeypatch.setattr(SO, "dedupe_keep", spy)
    csv = b"s,v\nx,1\ny,2\nx,1\n"
    fr = sql("SELECT s, v FROM t UNION SELECT s, v FROM t", csv,
             schema={"v": "int32"})
    assert calls["n"] >= 1
    assert len(fr) == 2
