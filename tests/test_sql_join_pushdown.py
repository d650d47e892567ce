"""Join-aggregate pushdown (_try_join_groupby_pushdown): GROUP BY over
a join whose keys are the join keys runs as per-side DEVICE group-bys
combined by host multiplicity arithmetic — differentially tested
against the host group-over-joined-frame path on the same statements.

Duplicate keys on BOTH sides matter: each group's joined rows are the
cross product (nl x nr), which is exactly what the combine must scale
sums/counts by."""

import io

import numpy as np
import pytest

import importlib

sqlmod = importlib.import_module("csv_simd_tpu.sql")
SqlError, sql = sqlmod.SqlError, sqlmod.sql


LEFT = (b"sym,qty,day\n"
        b"AAPL,10,2024-01-02\n"
        b"MSFT,20,2024-01-03\n"
        b"AAPL,-5,2024-01-04\n"
        b"GOOG,7,2024-01-05\n"
        b"MSFT,x!,2024-01-06\n"      # qty parse failure (NULL)
        b"AAPL,40,2024-01-07\n"
        b"ONLYL,3,2024-01-08\n")     # no right match
RIGHT = (b"sym,price\n"
         b"MSFT,2.5\n"
         b"AAPL,1.25\n"
         b"AAPL,9.75\n"              # duplicate right key: nr=2
         b"GOOG,zz\n"                # price parse failure (NULL)
         b"MSFT,4.5\n"
         b"ONLYR,0.01\n")            # no left match

T = {"l": LEFT, "r": RIGHT}
S = {"qty": "int32"}
RS = {"price": "float"}


def _both(query, **kw):
    """Run `query` through the pushdown AND the host fallback path."""
    fast = sql(query, tables=T, schema=S, right_schema=RS, **kw)
    real = sqlmod._try_join_groupby_pushdown
    calls = []

    def spy(*a, **k):
        r = real(*a, **k)
        calls.append(r is not None)
        return None  # force the host path

    sqlmod._try_join_groupby_pushdown = spy
    try:
        slow = sql(query, tables=T, schema=S, right_schema=RS, **kw)
    finally:
        sqlmod._try_join_groupby_pushdown = real
    return fast, slow, calls


def _same_val(x, y):
    if x is None or y is None:
        return x is None and y is None
    if isinstance(x, (int, float, np.integer, np.floating)):
        if np.isnan(float(x)) or np.isnan(float(y)):
            return np.isnan(float(x)) and np.isnan(float(y))
        # per-side float32 device reduces vs float64 host reduce
        return np.isclose(float(x), float(y), rtol=1e-6)
    return x == y


def _assert_same(a, b):
    assert a.names == b.names
    assert len(a) == len(b)
    for n in a.names:
        va = np.asarray(a[n]).tolist()
        vb = np.asarray(b[n]).tolist()
        assert all(_same_val(x, y) for x, y in zip(va, vb)), \
            (n, va, vb)


QUERIES = [
    # the canonical shape: both sides' aggregates + COUNT(*)
    "SELECT sym, COUNT(*), SUM(qty), MIN(price), MAX(qty), AVG(price) "
    "FROM l JOIN r ON l.sym = r.sym GROUP BY sym ORDER BY sym",
    # left/right joins keep unmatched groups with multiplier 1
    "SELECT sym, COUNT(*), SUM(qty), COUNT(price) FROM l LEFT JOIN r "
    "ON l.sym = r.sym GROUP BY sym ORDER BY sym",
    "SELECT sym, COUNT(*), COUNT(qty), SUM(price) FROM l RIGHT JOIN r "
    "ON l.sym = r.sym GROUP BY sym ORDER BY sym",
    # qualified group key + aliases + ORDER BY an aggregate
    "SELECT l.sym AS k, SUM(l.qty) AS tot FROM l JOIN r "
    "ON l.sym = r.sym GROUP BY l.sym ORDER BY tot DESC",
    # HAVING over combined aggregates
    "SELECT sym, COUNT(*) FROM l JOIN r ON l.sym = r.sym "
    "GROUP BY sym HAVING COUNT(*) >= 2 ORDER BY sym",
    "SELECT sym, SUM(qty) FROM l LEFT JOIN r ON l.sym = r.sym "
    "GROUP BY sym HAVING SUM(qty) > 0 ORDER BY sym",
    # single-side WHERE conjuncts push to their side
    "SELECT sym, COUNT(*), SUM(price) FROM l JOIN r ON l.sym = r.sym "
    "WHERE qty > 0 AND price < 5 GROUP BY sym ORDER BY sym",
    # OR tree wholly on one side still pushes
    "SELECT sym, COUNT(*) FROM l JOIN r ON l.sym = r.sym "
    "WHERE qty > 30 OR qty < 0 GROUP BY sym ORDER BY sym",
    # LIMIT/OFFSET after the combine
    "SELECT sym, COUNT(*) FROM l JOIN r ON l.sym = r.sym "
    "GROUP BY sym ORDER BY sym LIMIT 2 OFFSET 1",
    # grouping by the RIGHT side's key column
    "SELECT r.sym, SUM(price) FROM l JOIN r ON l.sym = r.sym "
    "GROUP BY r.sym ORDER BY r.sym",
]


@pytest.mark.parametrize("q", QUERIES)
def test_pushdown_matches_host_path(q):
    fast, slow, calls = _both(q)
    assert calls == [True], "statement did not take the pushdown"
    _assert_same(fast, slow)


FALLBACKS = [
    # FULL OUTER: single-side keys can't represent both unmatched sides
    "SELECT sym, COUNT(*) FROM l FULL OUTER JOIN r ON l.sym = r.sym "
    "GROUP BY sym ORDER BY sym",
    # group key is not the join key
    "SELECT day, COUNT(*) FROM l JOIN r ON l.sym = r.sym "
    "GROUP BY day ORDER BY day",
    # WHERE conjunct straddles the join (OR across sides)
    "SELECT sym, COUNT(*) FROM l JOIN r ON l.sym = r.sym "
    "WHERE qty > 0 OR price > 2 GROUP BY sym ORDER BY sym",
    # nullable-side WHERE under a LEFT join (post-join NULL semantics)
    "SELECT sym, COUNT(*) FROM l LEFT JOIN r ON l.sym = r.sym "
    "WHERE price > 1 GROUP BY sym ORDER BY sym",
]


@pytest.mark.parametrize("q", FALLBACKS)
def test_fallback_statements_still_correct(q):
    fast, slow, calls = _both(q)
    assert calls == [False], "statement unexpectedly took the pushdown"
    _assert_same(fast, slow)


def test_pushdown_matches_pandas():
    pd = pytest.importorskip("pandas")
    fr = sql("SELECT sym, COUNT(*), SUM(qty) AS sq, SUM(price) AS sp "
             "FROM l JOIN r ON l.sym = r.sym GROUP BY sym ORDER BY sym",
             tables=T, schema=S, right_schema=RS)
    ldf = pd.read_csv(io.BytesIO(LEFT))
    ldf["qty"] = pd.to_numeric(ldf["qty"], errors="coerce")
    rdf = pd.read_csv(io.BytesIO(RIGHT))
    rdf["price"] = pd.to_numeric(rdf["price"], errors="coerce")
    m = ldf.merge(rdf, on="sym", how="inner")
    g = m.groupby("sym").agg(
        count=("sym", "size"), sq=("qty", "sum"),
        # min_count=1: SUM over an all-NULL group is NULL (SQL), not 0
        sp=("price", lambda s: s.sum(min_count=1)),
    ).sort_index()
    assert list(fr["sym"]) == g.index.tolist()
    assert fr["count"].tolist() == g["count"].tolist()
    assert [int(x) for x in fr["sq"]] == [int(x) for x in g["sq"]]
    ours = np.array([np.nan if v is None else float(v)
                     for v in fr["sp"]])
    np.testing.assert_allclose(ours, g["sp"].to_numpy(), rtol=1e-6)


def test_explain_shows_device_pushdown():
    plan = sql("EXPLAIN SELECT sym, COUNT(*) FROM l JOIN r "
               "ON l.sym = r.sym GROUP BY sym", tables=T)
    assert "device group-by PER SIDE" in plan
    plan = sql("EXPLAIN SELECT day, COUNT(*) FROM l JOIN r "
               "ON l.sym = r.sym GROUP BY day", tables=T)
    assert "host group over the joined frame" in plan


def test_composite_key_pushdown():
    left = (b"a,b,v\n"
            b"x,1,10\nx,1,20\nx,2,30\ny,1,40\ny,3,5\n")
    right = (b"a,b,w\n"
             b"x,1,100\nx,1,200\ny,1,300\nz,9,1\n")
    q = ("SELECT a, b, COUNT(*), SUM(v), SUM(w) FROM l JOIN r "
         "ON l.a = r.a AND l.b = r.b GROUP BY a, b ORDER BY a, b")
    tables = {"l": left, "r": right}
    fast = sql(q, tables=tables, schema={"v": "int32", "b": "int32"},
               right_schema={"w": "int32", "b": "int32"})
    real = sqlmod._try_join_groupby_pushdown
    sqlmod._try_join_groupby_pushdown = lambda *a, **k: None
    try:
        slow = sql(q, tables=tables,
                   schema={"v": "int32", "b": "int32"},
                   right_schema={"w": "int32", "b": "int32"})
    finally:
        sqlmod._try_join_groupby_pushdown = real
    _assert_same(fast, slow)
    # (x,1): nl=2, nr=2 -> 4 joined rows, SUM(v)=(10+20)*2, SUM(w)=600
    assert list(fast["a"]) == ["x", "y"]
    assert fast["count"].tolist() == [4, 1]
    assert [int(x) for x in fast["sum_v"]] == [60, 40]
    assert [int(x) for x in fast["sum_w"]] == [600, 300]


def test_key_type_disagreement_falls_back():
    # left sym typed int via schema, right inferred str -> not eligible
    left = b"k,v\n1,10\n2,20\n"
    right = b"k,w\n1,5\nx,7\n"
    q = ("SELECT k, COUNT(*) FROM l JOIN r ON l.k = r.k "
         "GROUP BY k ORDER BY k")
    with pytest.raises((SqlError, ValueError)):
        # join_typed itself rejects disagreeing key domains — the
        # pushdown must BAIL to that uniform error, not crash combining
        sql(q, tables={"l": left, "r": right}, schema={"k": "int32"},
            right_schema={"k": "str"})
