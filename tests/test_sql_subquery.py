"""Derived tables: FROM (SELECT ...) [AS alias] — the inner select
runs first (device paths and all), its materialized result becomes
the outer query's source frame, and the outer pipeline runs the same
host twins the join path uses (_run_over_frame)."""

import csv as pycsv
import io

import numpy as np
import pytest

from csv_simd_tpu.sql import SqlError, sql, explain, table_refs

CSV = (b"sym,qty,price\n"
       b"AAPL,10,1.25\n"
       b"MSFT,20,2.50\n"
       b"AAPL,-5,0.75\n"
       b"GOOG,7,9.99\n"
       b"MSFT,x!,1.00\n"          # qty parse failure -> NULL
       b"AAPL,40,3.00\n")
S = {"qty": "int32", "price": "float"}
ROWS = list(pycsv.reader(io.StringIO(CSV.decode())))[1:]


def _q(r):
    try:
        return int(r[1])
    except ValueError:
        return None


def test_outer_aggregate_over_derived_plain():
    r = sql("SELECT sym, SUM(v) AS s FROM "
            "(SELECT sym, qty * price AS v FROM t WHERE qty > 0) "
            "GROUP BY sym ORDER BY sym", CSV, schema=S)
    want = {}
    for row in ROWS:
        q = _q(row)
        if q is not None and q > 0:
            want[row[0]] = want.get(row[0], 0) + q * float(row[2])
    assert list(r["sym"]) == sorted(want)
    assert [round(float(x), 4) for x in r["s"]] == \
        [round(want[k], 4) for k in sorted(want)]


def test_outer_filter_over_derived_aggregate():
    r = sql("SELECT sym FROM "
            "(SELECT sym, SUM(qty) AS tot FROM t GROUP BY sym) "
            "WHERE tot > 10 ORDER BY sym", CSV, schema=S)
    want = {}
    for row in ROWS:
        q = _q(row)
        if q is not None:
            want[row[0]] = want.get(row[0], 0) + q
    assert [str(v) for v in r["sym"]] == \
        sorted(k for k, v in want.items() if v > 10)


def test_alias_and_qualified_refs():
    r = sql("SELECT d.sym, d.tot FROM "
            "(SELECT sym, SUM(qty) AS tot FROM t GROUP BY sym) AS d "
            "WHERE d.tot > 10 ORDER BY d.tot DESC", CSV, schema=S)
    assert [str(v) for v in r[r.names[0]]] == ["AAPL", "MSFT"]
    assert list(r[r.names[1]]) == [45, 20]
    # bare alias (no AS)
    r2 = sql("SELECT d.sym FROM "
             "(SELECT sym, SUM(qty) AS tot FROM t GROUP BY sym) d "
             "WHERE d.tot > 10 ORDER BY d.sym", CSV, schema=S)
    assert [str(v) for v in r2[r2.names[0]]] == ["AAPL", "MSFT"]


def test_nested_two_levels_and_inner_limit():
    r = sql("SELECT COUNT(*) FROM (SELECT sym FROM "
            "(SELECT sym, qty FROM t WHERE qty > 0) WHERE qty > 5)",
            CSV, schema=S)
    want = sum(1 for row in ROWS
               if _q(row) is not None and _q(row) > 5)
    assert r[r.names[0]][0] == want
    # inner ORDER BY/LIMIT belong to the subquery
    r = sql("SELECT * FROM (SELECT sym, qty FROM t WHERE qty > 0 "
            "ORDER BY qty DESC LIMIT 2) ORDER BY sym", CSV, schema=S)
    top2 = sorted((row for row in ROWS
                   if _q(row) is not None and _q(row) > 0),
                  key=lambda row: -_q(row))[:2]
    assert sorted(str(v) for v in r["sym"]) == \
        sorted(row[0] for row in top2)


def test_null_semantics_carry_through():
    # the inner SUM over a group whose qty all fail the parse is NULL:
    # outer comparisons must never match it
    csv = b"sym,qty\nAA,1\nBB,oops\nBB,bad\n"
    r = sql("SELECT sym FROM "
            "(SELECT sym, SUM(qty) AS s FROM t GROUP BY sym) "
            "WHERE s >= 0", csv, schema={"qty": "int32"})
    assert [str(v) for v in r["sym"]] == ["AA"]
    r = sql("SELECT sym FROM "
            "(SELECT sym, SUM(qty) AS s FROM t GROUP BY sym) "
            "WHERE s IS NULL", csv, schema={"qty": "int32"})
    assert [str(v) for v in r["sym"]] == ["BB"]


def test_exact_int_sums_survive_conversion():
    # inner exact int sums (object ints) stay exact in the outer frame
    n, big = 40, 10**16 + 1  # n*big rounds in float64, not here
    csv = b"k,v\n" + b"".join(
        b"g," + str(big).encode() + b"\n" for _ in range(n))
    r = sql("SELECT s FROM (SELECT k, SUM(v) AS s FROM t GROUP BY k) "
            "WHERE s > 0", csv, schema={"v": "decimal:0"})
    assert int(r["s"][0]) == n * big


def test_text_fns_and_count_distinct_over_derived():
    r = sql("SELECT UPPER(sym) FROM (SELECT sym FROM t WHERE qty > 10)",
            CSV, schema=S)
    want = [row[0].upper() for row in ROWS
            if _q(row) is not None and _q(row) > 10]
    assert [str(v) for v in r[r.names[0]]] == want
    r = sql("SELECT COUNT(DISTINCT sym) FROM "
            "(SELECT sym, qty FROM t WHERE qty > 0)", CSV, schema=S)
    want = len({row[0] for row in ROWS
                if _q(row) is not None and _q(row) > 0})
    assert r[r.names[0]][0] == want


def test_distinct_and_scalar_aggs_over_derived():
    r = sql("SELECT DISTINCT sym FROM (SELECT sym FROM t "
            "WHERE price > 1)", CSV, schema=S)
    want = sorted({row[0] for row in ROWS if float(row[2]) > 1})
    assert sorted(str(v) for v in r["sym"]) == want
    r = sql("SELECT AVG(qty) FROM (SELECT qty FROM t WHERE qty > 0)",
            CSV, schema=S)
    vals = [_q(row) for row in ROWS
            if _q(row) is not None and _q(row) > 0]
    assert float(r[r.names[0]][0]) == pytest.approx(
        sum(vals) / len(vals))


def test_table_refs_and_explain():
    assert table_refs(
        "SELECT * FROM (SELECT a.x FROM a JOIN b ON a.k = b.k) "
        "WHERE x > 1") == ["a", "b"]
    txt = explain("SELECT sym FROM (SELECT sym, SUM(qty) AS tot "
                  "FROM t GROUP BY sym) WHERE tot > 10")
    assert "inner plan" in txt and "derived frame" in txt
    assert "device group-by" in txt  # the inner plan is shown


def test_subquery_join_side_now_works():
    # round 4: a derived table as a JOIN side materializes through the
    # round-trip CSV writer and joins like a base table (previously a
    # refusal)
    fr = sql("SELECT * FROM (SELECT sym FROM t) AS d JOIN u "
             "ON d.sym = u.k", CSV, tables={"u": b"k\nAAPL\n"})
    assert len(fr) == sum(1 for r in ROWS if r[0] == "AAPL")


def test_subquery_errors():
    with pytest.raises(SqlError, match="derived table"):
        sql("SELECT nope FROM (SELECT sym FROM t)", CSV)


# ---------------------------------------------------------- UNION ALL

A = b"sym,qty\nAAPL,1\nMSFT,2\n"
B = b"tick,n\nGOOG,3\nAAPL,4\n"
T = {"a": A, "b": B}


def test_union_all_basic():
    r = sql("SELECT sym, qty FROM a UNION ALL SELECT tick, n FROM b",
            tables=T)
    assert [str(v) for v in r["sym"]] == ["AAPL", "MSFT", "GOOG",
                                          "AAPL"]
    assert r["qty"].tolist() == [1, 2, 3, 4]
    assert r.names == ["sym", "qty"]  # names from branch 1


def test_union_all_inside_derived_table():
    r = sql("SELECT sym, COUNT(*) AS c FROM "
            "(SELECT sym, qty FROM a UNION ALL SELECT tick, n FROM b) "
            "GROUP BY sym ORDER BY sym", tables=T)
    assert list(r["sym"]) == ["AAPL", "GOOG", "MSFT"]
    assert r["c"].tolist() == [2, 1, 1]
    r = sql("SELECT DISTINCT sym FROM "
            "(SELECT sym FROM a UNION ALL SELECT tick FROM b)",
            tables=T)
    assert sorted(str(v) for v in r["sym"]) == ["AAPL", "GOOG", "MSFT"]


def test_union_all_branch_where_and_null_masks():
    csv = b"sym,qty\nAA,1\nBB,oops\n"
    r = sql("SELECT sym, qty FROM a WHERE qty > 1 "
            "UNION ALL SELECT sym, qty FROM c",
            tables={"a": A, "c": csv}, schema={"qty": "int32"})
    # branch 2's parse-failure row carries its NULL mask through
    assert [str(v) for v in r["sym"]] == ["MSFT", "AA", "BB"]
    ok = r.ok("qty")
    assert ok is not None and ok.tolist() == [True, True, False]


def test_union_all_errors():
    with pytest.raises(SqlError, match="2 vs 1 columns"):
        sql("SELECT sym, qty FROM a UNION ALL SELECT tick FROM b",
            tables=T)
    with pytest.raises(SqlError, match="mixes types"):
        sql("SELECT qty FROM a UNION ALL SELECT tick FROM b", tables=T)


def test_union_all_refs_and_explain():
    assert table_refs(
        "SELECT sym FROM a UNION ALL SELECT tick FROM b") == ["a", "b"]
    txt = explain("SELECT sym FROM a UNION ALL SELECT tick FROM b")
    assert "branch 1" in txt and "branch 2" in txt \
        and "concatenation" in txt


def test_plain_union_dedupes():
    # plain UNION removes duplicate rows (first occurrence kept)
    r = sql("SELECT sym FROM a UNION SELECT tick FROM b", tables=T)
    assert [str(v) for v in r["sym"]] == ["AAPL", "MSFT", "GOOG"]
    # UNION ALL keeps them
    r = sql("SELECT sym FROM a UNION ALL SELECT tick FROM b", tables=T)
    assert [str(v) for v in r["sym"]] == ["AAPL", "MSFT", "GOOG", "AAPL"]
    # left-associative: a UNION b UNION ALL b dedupes a+b, keeps the
    # trailing ALL branch's duplicates
    r = sql("SELECT sym FROM a UNION SELECT sym FROM a "
            "UNION ALL SELECT sym FROM a", tables=T)
    assert [str(v) for v in r["sym"]] == ["AAPL", "MSFT", "AAPL", "MSFT"]


def test_plain_union_null_rows_dedupe():
    # NULLs compare equal in UNION dedupe; multi-column rows
    csv = b"sym,qty\nAA,1\nAA,oops\nAA,oops\nBB,1\n"
    r = sql("SELECT sym, qty FROM t UNION SELECT sym, qty FROM t",
            tables={"t": csv}, schema={"qty": "int32"})
    assert [str(v) for v in r["sym"]] == ["AA", "AA", "BB"]
    ok = r.ok("qty")
    assert ok is not None and ok.tolist() == [True, False, True]


def test_plain_union_explain():
    txt = explain("SELECT sym FROM a UNION SELECT tick FROM b")
    assert "plain UNION dedupe" in txt


def test_except_and_intersect():
    t = {"a": A, "b": B}
    # a.sym = [AAPL, MSFT]; b.tick = [GOOG, AAPL]
    r = sql("SELECT sym FROM a EXCEPT SELECT tick FROM b", tables=t)
    assert [str(v) for v in r["sym"]] == ["MSFT"]
    r = sql("SELECT sym FROM a INTERSECT SELECT tick FROM b", tables=t)
    assert [str(v) for v in r["sym"]] == ["AAPL"]
    # EXCEPT dedupes its left side even with an empty right
    dup = b"sym\nAA\nAA\nBB\n"
    r = sql("SELECT sym FROM d EXCEPT SELECT sym FROM e",
            tables={"d": dup, "e": b"sym\nZZ\n"})
    assert [str(v) for v in r["sym"]] == ["AA", "BB"]
    # left-associative chain: (a UNION ALL a) INTERSECT a dedupes
    r = sql("SELECT sym FROM a UNION ALL SELECT sym FROM a "
            "INTERSECT SELECT sym FROM a", tables=t)
    assert [str(v) for v in r["sym"]] == ["AAPL", "MSFT"]


def test_except_intersect_nulls_and_multicol():
    # NULLs compare equal across the set ops (SQL set-op semantics)
    csv1 = b"sym,qty\nAA,1\nAA,oops\nBB,2\n"
    csv2 = b"sym,qty\nAA,oops\nCC,9\n"
    t = {"x": csv1, "y": csv2}
    s = {"qty": "int32"}
    r = sql("SELECT sym, qty FROM x EXCEPT SELECT sym, qty FROM y",
            tables=t, schema=s)
    assert [str(v) for v in r["sym"]] == ["AA", "BB"]
    assert r.ok("qty") is None or r.ok("qty").tolist() == [True, True]
    r = sql("SELECT sym, qty FROM x INTERSECT SELECT sym, qty FROM y",
            tables=t, schema=s)
    assert [str(v) for v in r["sym"]] == ["AA"]
    ok = r.ok("qty")
    assert ok is not None and ok.tolist() == [False]


def test_setop_explain_and_type_errors():
    txt = explain("SELECT sym FROM a EXCEPT SELECT tick FROM b "
                  "INTERSECT SELECT sym FROM a")
    assert "EXCEPT" in txt and "INTERSECT" in txt
    with pytest.raises(SqlError, match="mixes types"):
        sql("SELECT qty FROM a EXCEPT SELECT tick FROM b", tables=T)


def test_in_subquery_basic():
    csv = b"sym,qty\nBB,1\nAA,2\nCC,3\nAA,9\n"
    s = {"qty": "int32"}
    fr = sql("SELECT sym FROM t WHERE qty IN "
             "(SELECT qty FROM t WHERE qty > 1)", csv, schema=s)
    assert [str(v) for v in fr["sym"]] == ["AA", "CC", "AA"]
    # NOT IN
    fr = sql("SELECT sym FROM t WHERE qty NOT IN "
             "(SELECT qty FROM t WHERE qty > 1)", csv, schema=s)
    assert [str(v) for v in fr["sym"]] == ["BB"]
    # text values, cross-table
    t = {"x": csv, "y": b"k\nAA\nZZ\n"}
    fr = sql("SELECT sym, qty FROM x WHERE sym IN (SELECT k FROM y)",
             tables=t, schema=s)
    assert [str(v) for v in fr["sym"]] == ["AA", "AA"]
    # empty inner result matches nothing
    fr = sql("SELECT sym FROM x WHERE sym IN "
             "(SELECT k FROM y WHERE k = 'QQ')", tables=t)
    assert len(fr) == 0


def test_in_subquery_shape_errors_and_refs():
    csv = b"sym,qty\nAA,1\n"
    with pytest.raises(SqlError, match="one output column"):
        sql("SELECT sym FROM t WHERE sym IN (SELECT sym, qty FROM t)",
            csv, schema={"qty": "int32"})
    assert table_refs(
        "SELECT sym FROM a WHERE sym IN (SELECT k FROM b)"
    ) == ["a", "b"]


def test_in_subquery_with_aggregate_inner():
    # the inner select may itself aggregate / use DISTINCT
    csv = b"sym,qty\nAA,5\nBB,2\nAA,5\nCC,7\n"
    s = {"qty": "int32"}
    fr = sql("SELECT sym FROM t WHERE qty IN "
             "(SELECT MAX(qty) FROM t)", csv, schema=s)
    assert [str(v) for v in fr["sym"]] == ["CC"]
    fr = sql("SELECT sym FROM t WHERE qty IN "
             "(SELECT DISTINCT qty FROM t WHERE sym = 'AA')",
            csv, schema=s)
    assert [str(v) for v in fr["sym"]] == ["AA", "AA"]


def test_scalar_subquery_comparison():
    csv = b"sym,qty\nBB,1\nAA,2\nCC,3\nAA,9\n"
    s = {"qty": "int32"}
    fr = sql("SELECT sym, qty FROM t WHERE qty > "
             "(SELECT AVG(qty) FROM t)", csv, schema=s)
    # avg = 3.75 -> only 9
    assert [str(v) for v in fr["sym"]] == ["AA"]
    fr = sql("SELECT sym FROM t WHERE qty = (SELECT MAX(qty) FROM t)",
             csv, schema=s)
    assert [str(v) for v in fr["sym"]] == ["AA"]
    # text scalar; cross-table
    t = {"x": csv, "y": b"k\nCC\n"}
    fr = sql("SELECT qty FROM x WHERE sym = (SELECT k FROM y)",
             tables=t, schema=s)
    assert fr["qty"].tolist() == [3]
    # empty scalar matches nothing (SQL NULL comparison)
    fr = sql("SELECT sym FROM x WHERE qty < "
             "(SELECT MAX(qty) FROM x WHERE qty > 100)",
             tables=t, schema=s)
    assert len(fr) == 0
    # more than one row raises
    with pytest.raises(SqlError, match="scalar subquery returned"):
        sql("SELECT sym FROM x WHERE qty = (SELECT qty FROM x)",
            tables=t, schema=s)


# --------------------------------------- scalar subqueries as VALUES

def test_scalar_subquery_item():
    r = sql("SELECT sym, (SELECT MAX(qty) FROM t) AS mx FROM t",
            CSV, schema=S)
    mx = max(_q(row) for row in ROWS if _q(row) is not None)
    assert [int(v) for v in r["mx"]] == [mx] * len(ROWS)


def test_scalar_subquery_in_arithmetic_item():
    r = sql("SELECT sym, qty - (SELECT MAX(qty) FROM t) AS d FROM t "
            "WHERE qty IS NOT NULL", CSV, schema=S)
    mx = max(_q(row) for row in ROWS if _q(row) is not None)
    want = [_q(row) - mx for row in ROWS if _q(row) is not None]
    assert [int(v) for v in r["d"]] == want


def test_scalar_subquery_in_where_arithmetic():
    r = sql("SELECT sym FROM t WHERE qty > (SELECT AVG(qty) FROM t)"
            " - 1", CSV, schema=S)
    qs = [_q(row) for row in ROWS if _q(row) is not None]
    thr = sum(qs) / len(qs) - 1
    want = [row[0] for row in ROWS
            if _q(row) is not None and _q(row) > thr]
    assert [str(v) for v in r["sym"]] == want


def test_scalar_subquery_cross_table_item():
    r = sql("SELECT sym, qty * (SELECT MAX(y) FROM u) AS v FROM t "
            "WHERE qty IS NOT NULL",
            tables={"t": CSV, "u": b"k,y\n1,7\n2,3\n"}, schema=S)
    want = [_q(row) * 7 for row in ROWS if _q(row) is not None]
    assert [int(v) for v in r["v"]] == want


def test_scalar_subquery_item_null_raises():
    with pytest.raises(SqlError, match="NULL"):
        sql("SELECT (SELECT qty FROM t WHERE qty > 9999) AS x FROM t",
            CSV, schema=S)


def test_scalar_subquery_item_multirow_raises():
    with pytest.raises(SqlError, match="rows"):
        sql("SELECT (SELECT qty FROM t) AS x FROM t", CSV, schema=S)
