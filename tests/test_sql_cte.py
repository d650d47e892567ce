"""WITH (common table expressions): sugar over derived tables —
references inject as independent subquery executions; earlier CTEs
visible to later bodies; recursion (incl. mutual) raises."""

import numpy as np
import pytest

from csv_simd_tpu.sql import SqlError, explain, sql

CSV = (b"sym,qty\n"
       b"AA,10\n"
       b"BB,-3\n"
       b"AA,7\n"
       b"CC,5\n"
       b"BB,4\n")
S = {"qty": "int32"}


def test_basic_cte():
    fr = sql("WITH pos AS (SELECT sym, qty FROM t WHERE qty > 0) "
             "SELECT sym, qty FROM pos WHERE qty >= 7", CSV, schema=S)
    assert [str(v) for v in fr["sym"]] == ["AA", "AA"]
    assert fr["qty"].tolist() == [10, 7]


def test_cte_with_aggregate_outer():
    r = sql("WITH pos AS (SELECT sym, qty FROM t WHERE qty > 0) "
            "SELECT sym, SUM(qty) AS s FROM pos GROUP BY sym "
            "ORDER BY sym", CSV, schema=S)
    assert list(r["sym"]) == ["AA", "BB", "CC"]
    assert [int(v) for v in r["s"]] == [17, 4, 5]


def test_chained_ctes():
    r = sql("WITH pos AS (SELECT sym, qty FROM t WHERE qty > 0), "
            "big AS (SELECT sym, qty FROM pos WHERE qty > 4) "
            "SELECT COUNT(*) AS c FROM big", CSV, schema=S)
    assert int(r["c"][0]) == 3  # 10, 7, 5


def test_cte_referenced_twice():
    r = sql("WITH pos AS (SELECT sym, qty FROM t WHERE qty > 0) "
            "SELECT sym FROM pos WHERE qty > 6 "
            "UNION ALL SELECT sym FROM pos WHERE qty < 6",
            CSV, schema=S)
    assert sorted(str(v) for v in r["sym"]) == ["AA", "AA", "BB", "CC"]


def test_cte_in_in_subquery():
    fr = sql("WITH big AS (SELECT sym FROM t WHERE qty > 6) "
             "SELECT qty FROM t WHERE sym IN (SELECT sym FROM big)",
             CSV, schema=S)
    assert fr["qty"].tolist() == [10, 7]


def test_cte_window_over_body():
    fr = sql("WITH pos AS (SELECT sym, qty FROM t WHERE qty > 0) "
             "SELECT sym, ROW_NUMBER() OVER (PARTITION BY sym "
             "ORDER BY qty DESC) AS rn FROM pos", CSV, schema=S)
    got = list(zip([str(v) for v in fr["sym"]], fr["rn"].tolist()))
    assert got == [("AA", 1), ("AA", 2), ("CC", 1), ("BB", 1)]


def test_recursion_raises():
    with pytest.raises(SqlError, match="references itself|RECURSIVE"):
        sql("WITH a AS (SELECT sym FROM a) SELECT * FROM a", CSV)
    with pytest.raises(SqlError, match="references itself|RECURSIVE"):
        sql("WITH a AS (SELECT sym FROM b), b AS (SELECT sym FROM a) "
            "SELECT * FROM b", CSV)
    with pytest.raises(SqlError, match="RECURSIVE"):
        sql("WITH RECURSIVE a AS (SELECT sym FROM t) SELECT * FROM a",
            CSV)
    with pytest.raises(SqlError, match="duplicate CTE"):
        sql("WITH a AS (SELECT sym FROM t), a AS (SELECT qty FROM t) "
            "SELECT * FROM a", CSV)


def test_cte_explain_shows_inner_plan():
    txt = explain("WITH pos AS (SELECT sym, qty FROM t WHERE qty > 0) "
                  "SELECT sym FROM pos WHERE qty > 6")
    assert "subquery AS pos" in txt and "inner plan" in txt


def test_cte_as_join_side():
    """A CTE (or inline derived table) as a JOIN side materializes
    through the round-trip CSV writer and joins on device."""
    fr = sql("WITH pos AS (SELECT sym, qty FROM t WHERE qty > 0) "
             "SELECT t.sym, t.qty, p.qty AS pq FROM t "
             "JOIN pos AS p ON t.sym = p.sym ORDER BY t.qty",
             CSV, schema=S)
    # AA rows (10,7) x pos AA (10,7); BB: only qty 4 is pos; CC: 5
    rows = sorted(zip([str(v) for v in fr["sym"]],
                      fr["qty"].tolist(), fr["pq"].tolist()))
    assert rows == [("AA", 7, 7), ("AA", 7, 10), ("AA", 10, 7),
                    ("AA", 10, 10), ("BB", -3, 4), ("BB", 4, 4),
                    ("CC", 5, 5)]


def test_derived_table_join_side_inline():
    fr = sql("SELECT t.sym, d.s FROM t JOIN "
             "(SELECT sym, SUM(qty) AS s FROM t GROUP BY sym) AS d "
             "ON t.sym = d.sym WHERE t.qty > 0 ORDER BY t.qty",
             CSV, schema=S)
    assert list(zip([str(v) for v in fr["sym"]],
                    [int(v) for v in fr["s"]])) == [
        ("BB", 1), ("CC", 5), ("AA", 17), ("AA", 17)]


def test_derived_join_side_int_overflow_raises():
    big = b"sym,qty\nAA,2000000000\nAA,2000000000\n"
    with pytest.raises(SqlError, match="outside int32"):
        sql("SELECT t.sym FROM t JOIN (SELECT sym, SUM(qty) AS s "
            "FROM t GROUP BY sym) AS d ON t.sym = d.sym",
            big, schema=S)


def test_explain_analyze():
    txt = sql("EXPLAIN ANALYZE WITH pos AS (SELECT sym, qty FROM t "
              "WHERE qty > 0) SELECT sym, SUM(qty) OVER "
              "(PARTITION BY sym ORDER BY qty) AS s FROM pos", CSV,
              schema=S)
    assert isinstance(txt, str)
    assert "-- ANALYZE --" in txt and "executed in" in txt
    assert "rows x" in txt
    assert "sql.window" in txt  # the window executor span recorded


def test_cte_and_alias_groupby_over_corpus(tmp_path):
    """The round-4 SQL surface composes with multi-file corpora."""
    from csv_simd_tpu.corpus_api import CsvCorpus

    p1, p2 = tmp_path / "a.csv", tmp_path / "b.csv"
    p1.write_bytes(b"sym,qty\nAA,1\nbb,2\n")
    p2.write_bytes(b"sym,qty\nAA,3\ncc,4\n")
    c = CsvCorpus([str(p1), str(p2)])
    r = sql("SELECT UPPER(sym) AS u, SUM(qty) AS s FROM t GROUP BY u "
            "ORDER BY u", c, schema={"qty": "int32"})
    assert list(r["u"]) == ["AA", "BB", "CC"]
    assert [int(v) for v in r["s"]] == [4, 2, 4]
    r2 = sql("WITH pos AS (SELECT sym, qty FROM t WHERE qty > 1) "
             "SELECT COUNT(*) AS n FROM pos", c, schema={"qty": "int32"})
    assert int(r2["n"][0]) == 3


def test_explain_analyze_table_refs():
    """Regression: table_refs must tolerate the EXPLAIN ANALYZE prefix
    (the CLI calls it before binding file arguments)."""
    from csv_simd_tpu.sql import table_refs

    assert table_refs(
        "EXPLAIN ANALYZE SELECT sym FROM t WHERE qty > 0") == ["t"]
