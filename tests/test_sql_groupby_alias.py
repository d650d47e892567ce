"""GROUP BY on computed-item aliases (rewritten to a derived table),
differential against pandas."""

import numpy as np
import pandas as pd
import pytest

from csv_simd_tpu.sql import SqlError, sql

CSV = (b"sym,qty\n"
       b"AA,2\n"
       b"bb,5\n"
       b"AA,7\n"
       b"Bb,1\n"
       b"cc,bad\n"     # qty NULL
       b"CC,4\n")
S = {"qty": "int32"}


def _df():
    df = pd.read_csv(pd.io.common.BytesIO(CSV))
    df["qty"] = pd.to_numeric(df["qty"], errors="coerce")
    return df


def test_fold_alias_groupby_pandas():
    r = sql("SELECT UPPER(sym) AS u, COUNT(*) AS c, SUM(qty) AS s "
            "FROM t GROUP BY u ORDER BY u", CSV, schema=S)
    df = _df()
    df["u"] = df["sym"].str.upper()
    want = df.groupby("u").agg(c=("sym", "size"), s=("qty", "sum"))
    assert list(r["u"]) == list(want.index)
    assert [int(v) for v in r["c"]] == want["c"].tolist()
    assert [int(v) for v in r["s"]] == [int(v) for v in want["s"]]


def test_expr_alias_groupby_with_where_and_having():
    r = sql("SELECT qty * 2 AS d, COUNT(*) AS c FROM t WHERE qty > 1 "
            "GROUP BY d HAVING COUNT(*) >= 1 ORDER BY d", CSV,
            schema=S)
    df = _df()
    sel = df[df.qty > 1].copy()
    sel["d"] = sel.qty * 2
    want = sel.groupby("d").size()
    assert [int(v) for v in r["d"]] == [int(v) for v in want.index]
    assert [int(v) for v in r["c"]] == want.tolist()


def test_case_alias_groupby():
    r = sql("SELECT CASE WHEN qty > 3 THEN 'hi' ELSE 'lo' END AS b, "
            "COUNT(*) AS c FROM t GROUP BY b ORDER BY b", CSV,
            schema=S)
    # NULL qty: CASE WHEN NULL>3 is not-true -> 'lo'
    assert list(r["b"]) == ["hi", "lo"]
    assert [int(v) for v in r["c"]] == [3, 3]


def test_mixed_plain_and_alias_keys():
    r = sql("SELECT sym, qty * 0 AS z, COUNT(*) AS c FROM t "
            "GROUP BY sym, z ORDER BY sym", CSV, schema=S)
    df = _df()
    df["z"] = df.qty * 0
    # NULL group keys drop (the layer's convention AND pandas default)
    want = df.groupby(["sym", "z"]).size()
    assert sorted(str(v) for v in r["sym"]) == sorted(
        k[0] for k in want.index)
    assert sum(int(v) for v in r["c"]) == int(want.sum())


def test_plain_groupby_path_untouched():
    # no alias involved: the direct device pushdown still runs (no
    # derived table in the plan)
    from csv_simd_tpu.sql import explain

    txt = explain("SELECT sym, COUNT(*) FROM t GROUP BY sym")
    assert "subquery" not in txt


def test_alias_groupby_over_join_raises():
    with pytest.raises(SqlError, match="computed alias over a JOIN"):
        sql("SELECT UPPER(a.sym) AS u, COUNT(*) FROM t a JOIN t b "
            "ON a.sym = b.sym GROUP BY u", CSV, schema=S)
