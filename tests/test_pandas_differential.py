"""External-oracle differentials: read_typed / sql vs pandas.

pandas is an independent production CSV parser + relational engine —
agreement on clean data is strong evidence the typed export, group-by
and join semantics are right (the python-csv differentials already
cover the byte-level slicing contract)."""

import io

import numpy as np
import pytest

pd = pytest.importorskip("pandas")

import csv_simd_tpu as cst
from csv_simd_tpu.sql import sql


CSV = (b"sym,qty,ratio\n"
       b"AAPL,10,0.5\n"
       b"MSFT,-20,1.25\n"
       b"AAPL,30,2.0\n"
       b"GOOG,7,9.5\n"
       b"MSFT,40,0.25\n"
       b'"AA,PL",5,3.5\n')


def _pdf():
    return pd.read_csv(io.BytesIO(CSV))


def test_read_typed_matches_pandas():
    fr = cst.read_typed(CSV, {"sym": "str", "qty": "int32",
                              "ratio": "float"})
    df = _pdf()
    assert [str(s) for s in fr["sym"]] == df["sym"].tolist()
    assert fr["qty"].tolist() == df["qty"].tolist()
    assert np.allclose(np.asarray(fr["ratio"], np.float64),
                       df["ratio"].to_numpy(), rtol=1e-6)


def test_sql_groupby_matches_pandas():
    r = sql("SELECT sym, COUNT(*), SUM(qty), MIN(ratio), AVG(qty) "
            "FROM t GROUP BY sym ORDER BY sym", CSV,
            schema={"qty": "int32", "ratio": "float"})
    g = _pdf().groupby("sym").agg(
        count=("qty", "size"), sum_qty=("qty", "sum"),
        min_ratio=("ratio", "min"), mean_qty=("qty", "mean"),
    ).sort_index()
    assert list(r["sym"]) == g.index.tolist()
    assert r["count"].tolist() == g["count"].tolist()
    assert r["sum_qty"].tolist() == g["sum_qty"].tolist()
    assert np.allclose(np.asarray(r["min_ratio"], np.float64),
                       g["min_ratio"].to_numpy(), rtol=1e-6)
    assert np.allclose(np.asarray(r["mean_qty"], np.float64),
                       g["mean_qty"].to_numpy())


def test_sql_where_order_matches_pandas():
    r = sql("SELECT sym, qty FROM t WHERE qty > 5 AND ratio < 3 "
            "ORDER BY qty DESC", CSV,
            schema={"qty": "int32", "ratio": "float"})
    df = _pdf()
    want = df[(df.qty > 5) & (df.ratio < 3)].sort_values(
        "qty", ascending=False, kind="stable")
    assert [str(s) for s in r["sym"]] == want["sym"].tolist()
    assert r["qty"].tolist() == want["qty"].tolist()


def test_sql_like_matches_pandas_str_match():
    df = _pdf()
    cases = [
        ("M_FT", r"^M.FT$"),
        ("A_P%", r"^A.P"),
        ("%_PL", r".PL$"),
        ("%O_G%", r"O.G"),
        ("____", r"^.{4}$"),
    ]
    for pat, rx in cases:
        r = sql(f"SELECT sym FROM t WHERE sym LIKE '{pat}'", CSV)
        want = df[df.sym.str.contains(rx)]["sym"].tolist()
        assert [str(s) for s in r["sym"]] == want, pat


RIGHT = (b"sym,price\n"
         b"MSFT,2.5\n"
         b"AAPL,1.25\n"
         b"XXXX,0.01\n")


@pytest.mark.parametrize("how", ["inner", "left", "right", "outer"])
def test_sql_join_matches_pandas_merge(how):
    kw = {"inner": "JOIN", "left": "LEFT JOIN",
          "right": "RIGHT JOIN", "outer": "FULL OUTER JOIN"}[how]
    fr = sql(f"SELECT l.sym, r.sym AS rsym, qty, price FROM l {kw} r "
             "ON l.sym = r.sym", tables={"l": CSV, "r": RIGHT},
             schema={"qty": "int32"},
             right_schema={"price": "float"})
    m = _pdf().merge(pd.read_csv(io.BytesIO(RIGHT)), on="sym",
                     how=how)
    assert len(fr) == len(m)
    # same multiset of (sym, qty, price) triples; our absent-side
    # values are flagged not-ok / empty (pandas: NaN, and it
    # COALESCES the on= key — emulate with sym or rsym)
    ok_q = fr.ok("qty")
    ok_p = fr.ok("price")

    def _ours(i, s):
        q = int(fr["qty"][i]) if ok_q is None or ok_q[i] else None
        p = (round(float(fr["price"][i]), 4)
             if ok_p is None or ok_p[i] else None)
        return (str(s) or str(fr["rsym"][i]), q, p)

    def _theirs(s, q, p):
        sym = "" if (isinstance(s, float) and np.isnan(s)) else str(s)
        return (sym,
                None if np.isnan(q) else int(q),
                None if np.isnan(p) else round(float(p), 4))

    got = sorted((_ours(i, s) for i, s in enumerate(fr["sym"])),
                 key=repr)
    want = sorted(
        (_theirs(s, q, p) for s, q, p in zip(
            m["sym"], m["qty"].astype("float64"),
            m["price"].astype("float64"))),
        key=repr)
    assert got == want


def test_sql_semi_anti_match_pandas_isin():
    df = _pdf()
    rdf = pd.read_csv(io.BytesIO(RIGHT))
    fr = sql("SELECT sym FROM l SEMI JOIN r ON l.sym = r.sym",
             tables={"l": CSV, "r": RIGHT})
    assert [str(s) for s in fr["sym"]] == \
        df[df.sym.isin(rdf.sym)]["sym"].tolist()
    fr = sql("SELECT sym FROM l ANTI JOIN r ON l.sym = r.sym",
             tables={"l": CSV, "r": RIGHT})
    assert [str(s) for s in fr["sym"]] == \
        df[~df.sym.isin(rdf.sym)]["sym"].tolist()


def test_frame_to_pandas_roundtrip():
    fr = cst.read_typed(CSV, {"sym": "str", "qty": "int32"})
    df = fr.to_pandas()
    assert df["qty"].tolist() == _pdf()["qty"].tolist()
    assert df["sym"].tolist() == _pdf()["sym"].tolist()


def test_sql_count_distinct_matches_pandas_nunique():
    df = _pdf()
    r = sql("SELECT sym, COUNT(DISTINCT qty) AS d FROM t "
            "GROUP BY sym ORDER BY sym", CSV,
            schema={"qty": "int32"})
    want = df.groupby("sym")["qty"].nunique().sort_index()
    assert list(r["sym"]) == list(want.index)
    assert r["d"].tolist() == want.tolist()
    r = sql("SELECT COUNT(DISTINCT sym) FROM t", CSV)
    assert r[r.names[0]][0] == df["sym"].nunique()


def test_sql_derived_table_matches_pandas():
    df = _pdf()
    r = sql("SELECT sym, SUM(v) AS s FROM "
            "(SELECT sym, qty * ratio AS v FROM t WHERE qty > 0) "
            "GROUP BY sym ORDER BY sym", CSV,
            schema={"qty": "int32", "ratio": "float"})
    inner = df[df["qty"] > 0].assign(
        v=(df["qty"].astype("int32")
           * df["ratio"].astype("float32")).astype("float32"))
    want = inner.groupby("sym")["v"].sum().sort_index()
    assert list(r["sym"]) == list(want.index)
    got = np.asarray([float(x) for x in r["s"]])
    assert np.allclose(got, want.to_numpy(), rtol=1e-6)


def test_sql_union_all_matches_pandas_concat():
    df = _pdf()
    r = sql("SELECT sym, qty FROM t WHERE qty > 0 "
            "UNION ALL SELECT sym, qty FROM t WHERE qty < 0", CSV,
            schema={"qty": "int32"})
    want = pd.concat([df[df["qty"] > 0][["sym", "qty"]],
                      df[df["qty"] < 0][["sym", "qty"]]])
    assert [str(v) for v in r["sym"]] == want["sym"].tolist()
    assert r["qty"].tolist() == want["qty"].tolist()


def test_sql_fold_and_length_match_pandas_str_ops():
    df = _pdf()
    r = sql("SELECT sym FROM t WHERE LOWER(sym) LIKE 'a%'", CSV)
    want = df[df["sym"].str.lower().str.startswith("a")]
    assert [str(v) for v in r["sym"]] == want["sym"].tolist()
    r = sql("SELECT LENGTH(sym) FROM t", CSV)
    assert list(r[r.names[0]]) == df["sym"].str.len().tolist()
