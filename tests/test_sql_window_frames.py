"""Explicit ROWS/RANGE window frames: SQL semantics on both executors,
pandas rolling differential, parse errors."""

import numpy as np
import pandas as pd
import pytest

import csv_simd_tpu.window as W
from csv_simd_tpu.sql import SqlError, sql


def _mk(n=400, seed=8):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 5, n)
    v = rng.integers(-50, 50, n)
    rows = []
    for i in range(n):
        vv = b"bad" if i % 29 == 0 else str(v[i]).encode()
        rows.append(b"%d,%s,%d" % (g[i], vv, i))
    return b"g,v,i\n" + b"\n".join(rows) + b"\n"


CSV = _mk()
S = {"g": "int32", "v": "int32", "i": "int32"}


def _df():
    fr = pd.read_csv(pd.io.common.BytesIO(CSV))
    fr["v"] = pd.to_numeric(fr["v"], errors="coerce")
    return fr


def _vals(fr, name):
    out = []
    okm = fr._ok.get(name)
    for i, v in enumerate(fr[name]):
        if (okm is not None and not okm[i]) or v is None or (
                isinstance(v, float) and v != v):
            out.append(None)
        elif isinstance(v, float) or str(
                getattr(v, "dtype", "")).startswith("float"):
            out.append(round(float(v), 9))
        else:
            out.append(int(v))
    return out


def test_rows_k_preceding_sum_pandas():
    q = ("SELECT SUM(v) OVER (PARTITION BY g ORDER BY i "
         "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS s FROM t")
    fr = sql(q, CSV, schema=S)
    df = _df()
    want = (df.sort_values("i", kind="stable").groupby("g")["v"]
            .rolling(3, min_periods=1).sum()
            .reset_index(level=0, drop=True).sort_index())
    got = _vals(fr, "s")
    for g, w in zip(got, want.tolist()):
        if w != w:  # all-NaN window -> SQL NULL
            assert g is None
        else:
            assert g == int(w)


def test_rows_following_and_unbounded():
    q = ("SELECT SUM(v) OVER (PARTITION BY g ORDER BY i "
         "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS s3, "
         "SUM(v) OVER (PARTITION BY g ORDER BY i "
         "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS tail, "
         "COUNT(v) OVER (PARTITION BY g ORDER BY i "
         "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS c3 FROM t")
    fr = sql(q, CSV, schema=S)
    df = _df()
    df = df.sort_values("i", kind="stable")
    for col, fnc in (("s3", "sum"), ("c3", "count")):
        want = (df.groupby("g")["v"]
                .rolling(3, min_periods=1, center=True)
                .agg(fnc).reset_index(level=0, drop=True).sort_index())
        got = _vals(fr, col)
        for g, w in zip(got, want.tolist()):
            if fnc == "count":
                assert g == int(w)
            elif w != w:
                assert g is None
            else:
                assert g == int(w)
    # tail sums: suffix per group — SQL skips NULL values but the
    # frame is still non-empty, so a NULL row's tail is the sum of the
    # remaining non-NULL values (NULL only when the whole tail is NULL)
    tails, tailc = {}, {}
    for g0, grp in df.groupby("g"):
        s = grp["v"].fillna(0).iloc[::-1].cumsum().iloc[::-1]
        c = grp["v"].notna().iloc[::-1].cumsum().iloc[::-1]
        for idx, val, cnt in zip(grp.index, s, c):
            tails[idx], tailc[idx] = val, cnt
    got = _vals(fr, "tail")
    for i, g in enumerate(got):
        if tailc[i] == 0:
            assert g is None
        else:
            assert g == int(tails[i])


@pytest.mark.parametrize("q", [
    "SELECT SUM(v) OVER (PARTITION BY g ORDER BY i "
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS x FROM t",
    "SELECT COUNT(v) OVER (PARTITION BY g ORDER BY i "
    "ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS x FROM t",
    "SELECT AVG(v) OVER (PARTITION BY g ORDER BY i "
    "ROWS BETWEEN 1 FOLLOWING AND 4 FOLLOWING) AS x FROM t",
    "SELECT MIN(v) OVER (PARTITION BY g ORDER BY i "
    "ROWS UNBOUNDED PRECEDING) AS x FROM t",   # shorthand
    "SELECT MAX(v) OVER (PARTITION BY g ORDER BY i "
    "RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS x"
    " FROM t",
    "SELECT SUM(v) OVER (PARTITION BY g ORDER BY i "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS x"
    " FROM t",
    # bounded min/max: host-only on device path (falls back)
    "SELECT MIN(v) OVER (PARTITION BY g ORDER BY i "
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS x FROM t",
])
def test_device_matches_host_frames(q, monkeypatch):
    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 1)
    dev = sql(q, CSV, schema=S)
    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 10**9)
    host = sql(q, CSV, schema=S)
    assert _vals(dev, "x") == _vals(host, "x"), q


def test_default_range_still_peer_shares():
    # explicit RANGE UNBOUNDED..CURRENT == the default (peer sharing),
    # which DIFFERS from ROWS UNBOUNDED..CURRENT on tied order keys
    csv = b"g,o,v\n1,5,1\n1,5,2\n1,9,4\n"
    sch = {"g": "int32", "o": "int32", "v": "int32"}
    r = sql("SELECT SUM(v) OVER (PARTITION BY g ORDER BY o "
            "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a, "
            "SUM(v) OVER (PARTITION BY g ORDER BY o "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b "
            "FROM t", csv, schema=sch)
    assert _vals(r, "a") == [3, 3, 7]   # peers share
    assert _vals(r, "b") == [1, 3, 7]   # strictly row-positional


def test_frame_parse_errors():
    with pytest.raises(SqlError, match="needs ORDER BY"):
        sql("SELECT SUM(v) OVER (PARTITION BY g ROWS BETWEEN 1 "
            "PRECEDING AND CURRENT ROW) FROM t", CSV, schema=S)
    with pytest.raises(SqlError, match="RANGE frames support"):
        sql("SELECT SUM(v) OVER (PARTITION BY g ORDER BY i RANGE "
            "BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t", CSV,
            schema=S)
    with pytest.raises(SqlError, match="does not take"):
        sql("SELECT ROW_NUMBER() OVER (PARTITION BY g ORDER BY i "
            "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t", CSV,
            schema=S)
    with pytest.raises(SqlError, match="reversed|empty ROWS"):
        sql("SELECT SUM(v) OVER (PARTITION BY g ORDER BY i ROWS "
            "BETWEEN CURRENT ROW AND 2 PRECEDING) FROM t", CSV,
            schema=S)


def test_first_last_nth_value_semantics():
    csv = b"g,o,v\n1,1,10\n1,2,20\n1,2,30\n1,3,bad\n2,1,7\n"
    sch = {"g": "int32", "o": "int32", "v": "int32"}
    r = sql("SELECT FIRST_VALUE(v) OVER (PARTITION BY g ORDER BY o)"
            " AS f, LAST_VALUE(v) OVER (PARTITION BY g ORDER BY o)"
            " AS l, NTH_VALUE(v, 2) OVER (PARTITION BY g ORDER BY o)"
            " AS n2 FROM t", csv, schema=sch)
    # default frame: start = partition start; end = current PEER end
    assert _vals(r, "f") == [10, 10, 10, 10, 7]
    # row 4 (o=3, v NULL): LAST_VALUE returns the NULL itself (no skip)
    assert _vals(r, "l") == [10, 30, 30, None, 7]
    # NTH_VALUE(2): frame must reach position 2
    assert _vals(r, "n2") == [None, 20, 20, 20, None]
    # explicit frame makes LAST_VALUE useful
    r2 = sql("SELECT LAST_VALUE(v) OVER (PARTITION BY g ORDER BY o "
             "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED "
             "FOLLOWING) AS l FROM t", csv, schema=sch)
    assert _vals(r2, "l") == [None, None, None, None, 7]


def test_ntile_distribution():
    csv = b"g,o\n" + b"".join(b"1,%d\n" % i for i in range(7))
    r = sql("SELECT NTILE(3) OVER (ORDER BY o) AS b FROM t", csv,
            schema={"g": "int32", "o": "int32"})
    # 7 rows / 3 buckets -> sizes 3,2,2
    assert _vals(r, "b") == [1, 1, 1, 2, 2, 3, 3]
    r2 = sql("SELECT NTILE(10) OVER (ORDER BY o) AS b FROM t", csv,
             schema={"g": "int32", "o": "int32"})
    assert _vals(r2, "b") == [1, 2, 3, 4, 5, 6, 7]


@pytest.mark.parametrize("q", [
    "SELECT FIRST_VALUE(v) OVER (PARTITION BY g ORDER BY i) AS x FROM t",
    "SELECT LAST_VALUE(v) OVER (PARTITION BY g ORDER BY i) AS x FROM t",
    "SELECT LAST_VALUE(v) OVER (PARTITION BY g ORDER BY i ROWS BETWEEN"
    " CURRENT ROW AND UNBOUNDED FOLLOWING) AS x FROM t",
    "SELECT NTH_VALUE(v, 3) OVER (PARTITION BY g ORDER BY i ROWS "
    "BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS x FROM t",
    "SELECT NTILE(4) OVER (PARTITION BY g ORDER BY i) AS x FROM t",
])
def test_new_winfns_device_matches_host(q, monkeypatch):
    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 1)
    dev = sql(q, CSV, schema=S)
    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 10**9)
    host = sql(q, CSV, schema=S)
    assert _vals(dev, "x") == _vals(host, "x"), q


def test_nulls_modifier():
    # both spellings parse everywhere (NULLS FIRST semantics are
    # pinned by tests/test_sql_nulls_having.py); a typo raises
    r = sql("SELECT v FROM t ORDER BY v DESC NULLS LAST LIMIT 3",
            CSV, schema=S)
    assert len(r) == 3
    r2 = sql("SELECT SUM(v) OVER (PARTITION BY g ORDER BY i ASC "
             "NULLS LAST) AS s FROM t LIMIT 1", CSV, schema=S)
    assert len(r2) == 1
    r3 = sql("SELECT v FROM t ORDER BY v NULLS FIRST LIMIT 3",
             CSV, schema=S)
    assert len(r3) == 3
    r4 = sql("SELECT SUM(v) OVER (ORDER BY i NULLS FIRST) AS s FROM t"
             " LIMIT 1", CSV, schema=S)
    assert len(r4) == 1
    with pytest.raises(SqlError, match="NULLS FIRST or NULLS LAST"):
        sql("SELECT v FROM t ORDER BY v NULLS MAYBE", CSV, schema=S)


def test_bounded_minmax_frame_wider_than_data(monkeypatch):
    """ROWS frames wider than the whole input (found by hypothesis:
    the RMQ level shift passed the array end and crashed the stack)."""
    import csv_simd_tpu.window as W

    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 1)
    csv = b"g,v\n0,3\n0,1\n1,5\n"
    q = ("SELECT MIN(v) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN"
         " 100 PRECEDING AND 200 FOLLOWING) AS lo FROM t")
    dev = sql(q, csv, schema={"g": "int32", "v": "int32"})
    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 10**9)
    host = sql(q, csv, schema={"g": "int32", "v": "int32"})
    assert [int(v) for v in dev["lo"]] == [int(v) for v in host["lo"]] \
        == [1, 1, 5]
