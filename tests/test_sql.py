"""SQL front-end (sql.py): parse + compile onto the relational layer,
differential against Python oracles."""

import csv as pycsv
import io

import numpy as np
import pytest

from csv_simd_tpu.sql import SqlError, SqlResult, sql, table_refs


CSV = (b"sym,qty,price\n"
       b"AAPL,10,1.25\n"
       b"MSFT,20,2.50\n"
       b"AAPL,-5,0.75\n"
       b"GOOG,7,9.99\n"
       b"MSFT,x!,1.00\n"          # qty parse failure
       b'"AA,PL",40,3.00\n')      # quoted comma key

S = {"qty": "int32"}

ROWS = list(pycsv.reader(io.StringIO(CSV.decode())))[1:]


def _qty(r):
    try:
        return int(r[1])
    except ValueError:
        return None


def test_select_where_order_limit():
    fr = sql("SELECT sym, qty FROM t WHERE qty > 5 "
             "ORDER BY qty DESC LIMIT 3", CSV, schema=S)
    want = sorted([r for r in ROWS if (_qty(r) or -1) > 5],
                  key=lambda r: -_qty(r))[:3]
    assert [str(s) for s in fr["sym"]] == [r[0] for r in want]
    assert fr["qty"].tolist() == [_qty(r) for r in want]


def test_select_star_and_alias():
    fr = sql("SELECT * FROM t LIMIT 2", CSV, schema=S)
    assert fr.names == ["sym", "qty", "price"]
    assert len(fr) == 2
    fr = sql("SELECT sym AS ticker FROM t LIMIT 1", CSV)
    assert fr.names == ["ticker"]


def test_where_like_and_bool_ops():
    fr = sql("SELECT sym FROM t WHERE sym LIKE 'A%' OR "
             "(qty < 0 AND NOT sym = 'GOOG')", CSV, schema=S)
    want = [r[0] for r in ROWS
            if r[0].startswith("A")
            or ((_qty(r) is not None and _qty(r) < 0)
                and r[0] != "GOOG")]
    assert [str(s) for s in fr["sym"]] == want
    # contains / endswith
    fr = sql("SELECT sym FROM t WHERE sym LIKE '%A,P%'", CSV)
    assert [str(s) for s in fr["sym"]] == ["AA,PL"]
    fr = sql("SELECT sym FROM t WHERE sym LIKE '%FT'", CSV)
    assert [str(s) for s in fr["sym"]] == ["MSFT", "MSFT"]


def test_where_like_underscore_wildcards():
    # exact-length with per-position wildcards: _ matches any one byte
    fr = sql("SELECT sym FROM t WHERE sym LIKE '_OOG'", CSV)
    assert [str(s) for s in fr["sym"]] == ["GOOG"]
    fr = sql("SELECT sym FROM t WHERE sym LIKE 'M_FT'", CSV)
    assert [str(s) for s in fr["sym"]] == ["MSFT", "MSFT"]
    # length discrimination: '____' matches only 4-byte fields
    fr = sql("SELECT sym FROM t WHERE sym LIKE '____'", CSV)
    assert [str(s) for s in fr["sym"]] == ["AAPL", "MSFT", "AAPL",
                                           "GOOG", "MSFT"]
    # wildcard + trailing %: startswith with holes
    fr = sql("SELECT sym FROM t WHERE sym LIKE 'A_P%'", CSV)
    assert [str(s) for s in fr["sym"]] == ["AAPL", "AAPL"]
    # wildcard + leading %: endswith with holes
    fr = sql("SELECT sym FROM t WHERE sym LIKE '%_PL'", CSV)
    assert [str(s) for s in fr["sym"]] == ["AAPL", "AAPL", "AA,PL"]
    # contains with holes: G_O somewhere in the field
    fr = sql("SELECT sym FROM t WHERE sym LIKE '%G_O%'", CSV)
    assert [str(s) for s in fr["sym"]] == ["GOOG"]
    # '%_%' degenerates to "at least one byte"
    fr = sql("SELECT sym FROM t WHERE sym LIKE '%_%'", CSV)
    assert len(fr) == len(ROWS)
    # NOT LIKE composes with the wildcard leaf
    fr = sql("SELECT sym FROM t WHERE sym NOT LIKE '____'", CSV)
    assert [str(s) for s in fr["sym"]] == ["AA,PL"]
    # mid-pattern %: anchored head/tail with a gap
    fr = sql("SELECT sym FROM t WHERE sym LIKE 'A%PL'", CSV)
    assert [str(s) for s in fr["sym"]] == ["AAPL", "AAPL", "AA,PL"]
    fr = sql("SELECT sym FROM t WHERE sym LIKE 'M%T'", CSV)
    assert [str(s) for s in fr["sym"]] == ["MSFT", "MSFT"]
    # three segments, middle unanchored
    fr = sql("SELECT sym FROM t WHERE sym LIKE 'A%,%L'", CSV)
    assert [str(s) for s in fr["sym"]] == ["AA,PL"]


def test_like_escape_clause():
    csv = (b"v,x\n"
           b"100%,1\n"
           b"100x,1\n"
           b"a_b,1\n"
           b"axb,1\n"
           b"50%,1\n"
           b"!bang,1\n")
    # escaped % is a literal percent sign
    r = sql("SELECT v FROM t WHERE v LIKE '100!%' ESCAPE '!'", csv)
    assert [str(s) for s in r["v"]] == ["100%"]
    # unescaped % still wildcards in the same pattern
    r = sql("SELECT v FROM t WHERE v LIKE '%!%' ESCAPE '!'", csv)
    assert [str(s) for s in r["v"]] == ["100%", "50%"]
    # escaped _ is a literal underscore
    r = sql("SELECT v FROM t WHERE v LIKE 'a!_b' ESCAPE '!'", csv)
    assert [str(s) for s in r["v"]] == ["a_b"]
    # the escape char escapes itself
    r = sql("SELECT v FROM t WHERE v LIKE '!!%' ESCAPE '!'", csv)
    assert [str(s) for s in r["v"]] == ["!bang"]
    with pytest.raises(SqlError, match="single character"):
        sql("SELECT v FROM t WHERE v LIKE 'a' ESCAPE 'xy'", csv)
    with pytest.raises(ValueError, match="escape character"):
        sql("SELECT v FROM t WHERE v LIKE 'a!' ESCAPE '!'", csv)


def test_like_underscore_differential_python():
    """Differential vs a Python fnmatch-style oracle over every pattern
    shape, incl. `_` before/after the anchors."""
    import re

    pats = ["_A%", "%P_", "%_S%", "A_,__", "__%", "%__", "%", "_", "",
            "A%", "%G", "M_FT", "x_z",
            # mid-pattern % runs: greedy in-order segment matching
            "A%L", "A%A%L", "M%F_", "%S%T%", "A__%", "__%__", "G%%G",
            "A%Z", "%O%O%", "A%%L", "_%_", "%,%"]
    for pat in pats:
        rx = "^" + "".join(
            ".*" if c == "%" else "." if c == "_" else re.escape(c)
            for c in pat
        ) + "$"
        want = [r[0] for r in ROWS if re.match(rx, r[0], re.S)]
        fr = sql(f"SELECT sym FROM t WHERE sym LIKE '{pat}'", CSV)
        assert [str(s) for s in fr["sym"]] == want, pat


def test_where_between_in_not():
    fr = sql("SELECT qty FROM t WHERE qty BETWEEN 5 AND 25", CSV,
             schema=S)
    assert fr["qty"].tolist() == [q for q in map(_qty, ROWS)
                                  if q is not None and 5 <= q <= 25]
    fr = sql("SELECT sym FROM t WHERE sym IN ('GOOG', 'MSFT')", CSV)
    assert [str(s) for s in fr["sym"]] == ["MSFT", "GOOG", "MSFT"]
    # NOT IN: parse-failure rows are NOT excluded by qty-typed leaves
    fr = sql("SELECT sym FROM t WHERE qty NOT IN (10, 20)", CSV,
             schema=S)
    want = [r[0] for r in ROWS if _qty(r) not in (10, 20)]
    assert [str(s) for s in fr["sym"]] == want


def test_group_by_having_order():
    r = sql("SELECT sym, COUNT(*), SUM(qty) AS total, AVG(qty) "
            "FROM t GROUP BY sym HAVING COUNT(*) >= 2 "
            "ORDER BY total DESC", CSV, schema=S)
    assert isinstance(r, SqlResult)
    # oracle
    import collections

    g = collections.defaultdict(list)
    for row in ROWS:
        g[row[0]].append(_qty(row))
    keep = {k: v for k, v in g.items() if len(v) >= 2}
    want = sorted(keep,
                  key=lambda k: -sum(x for x in keep[k] if x is not None))
    assert list(r["sym"]) == want
    assert r["count"].tolist() == [len(keep[k]) for k in want]
    assert r["total"].tolist() == [
        sum(x for x in keep[k] if x is not None) for k in want
    ]
    means = [np.mean([x for x in keep[k] if x is not None])
             for k in want]
    assert r["mean_qty"].tolist() == pytest.approx(means)


def test_group_by_composite_and_min_max():
    r = sql("SELECT sym, price, MIN(qty), MAX(qty) FROM t "
            "GROUP BY sym, price ORDER BY sym, price", CSV, schema=S)
    pairs = sorted({(row[0], round(float(row[2]) * 100))
                    for row in ROWS})
    assert list(zip(r["sym"], r["price"].tolist())) == pairs


def test_scalar_aggregates():
    r = sql("SELECT COUNT(*), COUNT(qty), SUM(qty), MIN(price), "
            "MAX(price) FROM t", CSV, schema=S)
    qs = [q for q in map(_qty, ROWS) if q is not None]
    cents = [round(float(row[2]) * 100) for row in ROWS]
    assert r["count"][0] == len(ROWS)
    assert r["count_qty"][0] == len(qs)
    assert r["sum_qty"][0] == sum(qs)
    assert r["min_price"][0] == min(cents)
    assert r["max_price"][0] == max(cents)
    # with WHERE
    r = sql("SELECT SUM(qty) FROM t WHERE sym = 'AAPL'", CSV, schema=S)
    assert r["sum_qty"][0] == sum(q for row, q in zip(ROWS, map(_qty, ROWS))
                                  if row[0] == "AAPL" and q is not None)


def test_distinct():
    r = sql("SELECT DISTINCT sym FROM t ORDER BY sym", CSV)
    assert list(r["sym"]) == sorted({row[0] for row in ROWS})
    r = sql("SELECT DISTINCT sym, price FROM t ORDER BY sym, price",
            CSV)
    assert len(r) == len({(row[0], row[2]) for row in ROWS})


LEFT = b"sym,qty\nAAPL,10\nMSFT,20\nZZZZ,30\nAAPL,40\n"
RIGHT = b"sym,price\nMSFT,2.50\nAAPL,1.25\nXXXX,0.01\n"


def test_join_basic_and_qualified():
    t = {"l": LEFT, "r": RIGHT}
    fr = sql("SELECT * FROM l JOIN r ON l.sym = r.sym", tables=t)
    assert sorted(map(str, fr["sym"])) == ["AAPL", "AAPL", "MSFT"]
    fr = sql("SELECT l.sym, qty, price FROM l LEFT JOIN r "
             "ON l.sym = r.sym WHERE qty >= 20 ORDER BY qty DESC",
             tables=t)
    assert [str(s) for s in fr["sym"]] == ["AAPL", "ZZZZ", "MSFT"]
    assert list(fr.ok("price")) == [True, False, True]
    fr = sql("SELECT sym FROM l ANTI JOIN r ON l.sym = r.sym", tables=t)
    assert [str(s) for s in fr["sym"]] == ["ZZZZ"]
    fr = sql("SELECT l.sym AS a, r.sym AS b FROM l FULL OUTER JOIN r "
             "ON l.sym = r.sym", tables=t)
    assert "XXXX" in [str(s) for s in fr["b"]]


def test_join_quoted_paths(tmp_path):
    lp, rp = tmp_path / "l.csv", tmp_path / "r.csv"
    lp.write_bytes(LEFT)
    rp.write_bytes(RIGHT)
    fr = sql(f"SELECT qty, price FROM '{lp}' JOIN '{rp}' "
             "ON sym = sym")
    assert len(fr) == 3


def test_join_on_must_cross_sides():
    t = {"l": LEFT, "r": RIGHT}
    with pytest.raises(SqlError, match="compare the two tables"):
        sql("SELECT * FROM l JOIN r ON l.sym = l.sym", tables=t)


def test_errors():
    with pytest.raises(SqlError, match="HAVING needs GROUP BY"):
        sql("SELECT sym FROM t HAVING COUNT(*) > 1", CSV)
    with pytest.raises(SqlError, match="must appear in GROUP BY"):
        sql("SELECT sym, qty FROM t GROUP BY sym", CSV, schema=S)
    with pytest.raises(SqlError, match="must appear in GROUP BY"):
        sql("SELECT qty FROM l JOIN r ON l.sym = r.sym GROUP BY sym",
            tables={"l": LEFT, "r": RIGHT})
    with pytest.raises(SqlError, match="not in `tables`"):
        sql("SELECT * FROM nope JOIN r ON nope.a = r.b",
            tables={"r": RIGHT})
    with pytest.raises(SqlError, match="expected"):
        sql("SELECT FROM t", CSV)
    with pytest.raises(SqlError, match="cannot tokenize"):
        sql("SELECT a FROM t WHERE a ~ 3", CSV)
    # '%' is a token now (modulo); an unquoted LIKE pattern fails at
    # parse (LIKE takes a string literal) instead of tokenize
    with pytest.raises(SqlError, match="expected 'str'"):
        sql("SELECT sym FROM t WHERE sym LIKE a%b", CSV)
    with pytest.raises(SqlError, match="compare aggregates"):
        sql("SELECT sym, SUM(qty) FROM t GROUP BY sym HAVING qty > 1",
            CSV, schema=S)


def test_table_refs_and_quoted_idents():
    assert table_refs("SELECT * FROM a JOIN b ON a.x = b.y") == \
        ["a", "b"]
    assert table_refs("SELECT * FROM 'p.csv'") == []
    # "quoted identifier" syntax reaches columns whose names aren't
    # bare identifiers (header names are the raw field text)
    csv = b"my col,v\n1,2\n"
    fr = sql('SELECT "my col" FROM t', csv)
    assert fr.names == ["my col"]


def test_schema_override_and_auto():
    # without the override the x! row flips qty to str
    fr = sql("SELECT qty FROM t WHERE qty > 0", CSV, schema=S)
    assert fr["qty"].tolist() == [q for q in map(_qty, ROWS)
                                  if q is not None and q > 0]
    # "auto" entries infer
    from csv_simd_tpu import read_typed

    f2 = read_typed(CSV, {"qty": "int32", "sym": "auto"},
                    columns=["sym", "qty"])
    assert f2.names == ["sym", "qty"]
    assert f2.schema["sym"].type == "str"


def test_is_null():
    fr = sql("SELECT sym FROM t WHERE qty IS NULL", CSV, schema=S)
    assert [str(s) for s in fr["sym"]] == [r[0] for r in ROWS
                                           if _qty(r) is None]
    fr = sql("SELECT sym FROM t WHERE qty IS NOT NULL AND qty < 0",
             CSV, schema=S)
    assert [str(s) for s in fr["sym"]] == [
        r[0] for r in ROWS if _qty(r) is not None and _qty(r) < 0
    ]
    # text columns are never null
    fr = sql("SELECT sym FROM t WHERE sym IS NULL", CSV)
    assert len(fr) == 0
    # over a join: the absent side of an unmatched row IS NULL
    fr = sql("SELECT sym FROM l LEFT JOIN r ON sym = sym "
             "WHERE price IS NULL", tables={"l": LEFT, "r": RIGHT})
    assert [str(s) for s in fr["sym"]] == ["ZZZZ"]
    # predicate-layer op directly
    from csv_simd_tpu import select_records
    from csv_simd_tpu.frame import _resolve_tape

    tape, names = _resolve_tape(CSV, None, "auto", "offsets", False)
    got = select_records(tape, ("qty", "isnull", None), names=names,
                         schema={"qty": "int32"})
    assert got.tolist() == [i for i, r in enumerate(ROWS)
                            if _qty(r) is None]


JL = b"sym,qty\nAAPL,10\nMSFT,20\nZZZZ,30\nAAPL,40\nMSFT,x\n"
JR = b"sym,price\nMSFT,2.50\nAAPL,1.25\nXXXX,0.01\n"


def test_join_group_by_and_aggregates():
    t = {"l": JL, "r": JR}
    s = {"qty": "int32"}
    r = sql("SELECT l.sym, COUNT(*), SUM(qty) AS tot, MIN(price) "
            "FROM l JOIN r ON l.sym = r.sym GROUP BY l.sym "
            "ORDER BY tot DESC", tables=t, schema=s)
    assert list(r["sym"]) == ["AAPL", "MSFT"]
    assert r["count"].tolist() == [2, 2]
    assert r["tot"].tolist() == [50, 20]      # MSFT's 'x' row is null
    assert r["min_price"].tolist() == [125, 250]
    # HAVING over the join, per-column COUNT with a left join
    r = sql("SELECT l.sym, COUNT(price) FROM l LEFT JOIN r "
            "ON l.sym = r.sym GROUP BY l.sym "
            "HAVING COUNT(*) >= 1 ORDER BY sym", tables=t, schema=s)
    assert list(r["sym"]) == ["AAPL", "MSFT", "ZZZZ"]
    assert r["count_price"].tolist() == [2, 2, 0]
    # scalar aggregates and DISTINCT over the join
    r = sql("SELECT COUNT(*), SUM(qty), AVG(qty) FROM l JOIN r "
            "ON l.sym = r.sym", tables=t, schema=s)
    assert [r[n][0] for n in r.names][:2] == [4, 70]
    assert r["mean_qty"][0] == pytest.approx(70 / 3)
    r = sql("SELECT DISTINCT l.sym FROM l JOIN r ON l.sym = r.sym "
            "ORDER BY sym", tables=t)
    assert list(r["sym"]) == ["AAPL", "MSFT"]


def test_join_group_by_text_agg_rejected():
    t = {"l": JL, "r": JR}
    with pytest.raises(SqlError, match="needs a numeric column"):
        sql("SELECT l.sym, SUM(r.sym) FROM l JOIN r ON l.sym = r.sym "
            "GROUP BY l.sym", tables=t)


def test_group_sentinel_aggregates_are_none():
    # a group whose values ALL failed the typed parse: min/max/sum are
    # SQL-NULL-ish None, not int32 sentinels (consistent with HAVING)
    csv = b"sym,qty\nAA,1\nBB,oops\nBB,bad\nAA,3\n"
    r = sql("SELECT sym, MIN(qty), MAX(qty), SUM(qty) FROM t "
            "GROUP BY sym ORDER BY sym", csv, schema={"qty": "int32"})
    assert r["min_qty"].tolist() == [1, None]
    assert r["max_qty"].tolist() == [3, None]
    assert r["sum_qty"].tolist() == [4, None]
    assert np.isnan(sql(
        "SELECT sym, AVG(qty) FROM t GROUP BY sym ORDER BY sym",
        csv, schema={"qty": "int32"})["mean_qty"][1])


def test_count_star_with_text_key_schema():
    # COUNT(*)/DISTINCT must not crash when the user typed the key
    # column as str — the probe value spec is forced numeric
    csv = b"sym,qty\nAA,1\nBB,2\nAA,3\n"
    r = sql("SELECT sym, COUNT(*) FROM t GROUP BY sym ORDER BY sym",
            csv, schema={"sym": "str"})
    assert list(r["sym"]) == ["AA", "BB"]
    assert r["count"].tolist() == [2, 1]


def test_like_match_all():
    r = sql("SELECT sym FROM t WHERE sym LIKE '%'", CSV)
    assert len(r) == len(ROWS)
    r = sql("SELECT sym FROM t WHERE sym LIKE '%%'", CSV)
    assert len(r) == len(ROWS)


def test_join_order_by_aggregate_raises():
    with pytest.raises(SqlError, match="ORDER BY aggregates over"):
        sql("SELECT l.sym FROM l JOIN r ON l.sym = r.sym "
            "ORDER BY COUNT(*)", tables={"l": LEFT, "r": RIGHT})


def test_cli_where_or_value_fallback():
    # ' or ' inside a VALUE: falls back to one predicate instead of
    # failing to parse the bogus alternatives
    from csv_simd_tpu.__main__ import _parse_where

    assert _parse_where(["desc contains red or blue"]) == [
        ("desc", "contains", "red or blue")
    ]
    assert _parse_where(["qty > 1 or sym == A"]) == [
        ("or", [("qty", ">", "1"), ("sym", "==", "A")])
    ]


def test_cli_sql_self_join_rejected(tmp_path, capsys):
    from csv_simd_tpu.__main__ import main

    lp, rp = tmp_path / "l.csv", tmp_path / "r.csv"
    lp.write_bytes(LEFT)
    rp.write_bytes(RIGHT)
    with pytest.raises(SystemExit, match="same bare table name"):
        main(["sql", "SELECT * FROM t JOIN t ON sym = sym",
              str(lp), str(rp)])


def test_cli_sql(tmp_path, capsys):
    from csv_simd_tpu.__main__ import main

    p = tmp_path / "t.csv"
    p.write_bytes(b"sym,qty\nAA,5\nBB,50\nAA,500\n")
    assert main(["sql",
                 "SELECT sym, SUM(qty) AS s FROM t GROUP BY sym",
                 str(p)]) == 0
    out = capsys.readouterr().out
    assert "505" in out and "50" in out
    lp, rp = tmp_path / "l.csv", tmp_path / "r.csv"
    lp.write_bytes(LEFT)
    rp.write_bytes(RIGHT)
    assert main(["sql",
                 "SELECT l.sym, price FROM l JOIN r ON l.sym = r.sym",
                 str(lp), str(rp)]) == 0
    out = capsys.readouterr().out
    assert "price" in out


def test_sql_over_corpus(tmp_path):
    from csv_simd_tpu.corpus_api import CsvCorpus

    p1 = tmp_path / "a.csv"
    p2 = tmp_path / "b.csv"
    p1.write_bytes(b"sym,qty\nAA,1\nBB,2\n")
    p2.write_bytes(b"sym,qty\nAA,3\nCC,4\n")
    c = CsvCorpus([str(p1), str(p2)], backend="golden")
    r = sql("SELECT sym, SUM(qty) FROM c GROUP BY sym ORDER BY sym",
            c)
    assert list(r["sym"]) == ["AA", "BB", "CC"]
    assert r["sum_qty"].tolist() == [4, 2, 4]


def test_join_where_on_date_and_min_date():
    # date columns over a JOIN: WHERE compares datetime64 frames
    # against converted literals; MIN/MAX reduce as epoch values
    L = (b"k,day\nA,2024-01-02\nB,2024-03-04\nC,2024-05-06\n")
    R = b"k,v\nA,1\nB,2\nC,3\n"
    t = {"l": L, "r": R}
    fr = sql("SELECT k, day FROM l JOIN r ON l.k = r.k "
             "WHERE day > '2024-02-01'", tables=t)
    assert [str(s) for s in fr["k"]] == ["B", "C"]
    r = sql("SELECT MIN(day), MAX(day) FROM l JOIN r ON l.k = r.k",
            tables=t)
    assert r["min_day"][0] == int(np.datetime64("2024-01-02", "D")
                                  .astype(np.int64))
    r = sql("SELECT k, MIN(day) FROM l JOIN r ON l.k = r.k "
            "GROUP BY k ORDER BY k", tables=t)
    assert len(r) == 3


def test_int32_fractional_literal_rejected():
    with pytest.raises(ValueError, match="not an integer"):
        sql("SELECT sym FROM t WHERE qty >= 5.5", CSV, schema=S)


def test_text_column_numeric_literal():
    # numbers against text columns compare as text, never crash
    csv = b"zip,v\n12345,1\n99,2\n"
    fr = sql("SELECT zip FROM t WHERE zip = 12345", csv)
    assert [str(s) for s in fr["zip"]] == ["12345"]
    fr = sql("SELECT zip FROM t WHERE zip IN (99, 12345)", csv)
    assert len(fr) == 2


def test_order_by_agg_with_null_groups():
    # a group whose values all fail the parse has SUM None: it must
    # sort LAST in both directions, not crash
    csv = b"sym,qty\nAA,1\nBB,oops\nBB,bad\nAA,3\n"
    r = sql("SELECT sym, SUM(qty) AS s FROM t GROUP BY sym "
            "ORDER BY s DESC", csv, schema={"qty": "int32"})
    assert list(r["sym"]) == ["AA", "BB"]
    r = sql("SELECT sym, SUM(qty) AS s FROM t GROUP BY sym "
            "ORDER BY s ASC", csv, schema={"qty": "int32"})
    assert list(r["sym"]) == ["AA", "BB"]


def test_count_star_only_no_materialization():
    r = sql("SELECT COUNT(*) FROM t", CSV)
    assert r["count"][0] == len(ROWS)
    r = sql("SELECT COUNT(*) FROM t WHERE sym = 'MSFT'", CSV)
    assert r["count"][0] == sum(1 for x in ROWS if x[0] == "MSFT")


def test_coalesce_outer_join_key():
    t = {"l": LEFT, "r": RIGHT}
    fr = sql("SELECT COALESCE(l.sym, r.sym) AS key, qty, price "
             "FROM l FULL OUTER JOIN r ON l.sym = r.sym "
             "ORDER BY key", tables=t)
    want = sorted({"AAPL", "MSFT", "ZZZZ", "XXXX"} | set())
    assert sorted(set(map(str, fr["key"]))) == want
    assert fr.ok("key") is None or all(fr.ok("key"))
    # ORDER BY a non-projected column after projection still works
    fr = sql("SELECT l.sym AS a FROM l LEFT JOIN r ON l.sym = r.sym "
             "ORDER BY qty DESC LIMIT 2", tables=t)
    assert [str(s) for s in fr["a"]] == ["AAPL", "ZZZZ"]


def test_coalesce_single_table_and_errors():
    csv = b"a,b\n1,5\nx,7\n3,y\nx,z\n"
    fr = sql("SELECT COALESCE(a, b) AS v, a FROM t", csv,
             schema={"a": "int32", "b": "int32"})
    assert fr["v"].tolist() == [1, 7, 3, 0]
    assert list(fr.ok("v")) == [True, True, True, False]
    with pytest.raises(SqlError, match="at least two"):
        sql("SELECT COALESCE(a) FROM t", csv)
    with pytest.raises(SqlError, match="types disagree"):
        sql("SELECT COALESCE(a, b) FROM t", csv,
            schema={"a": "int32", "b": "str"})


def test_explain():
    from csv_simd_tpu.sql import explain

    plan = explain("SELECT sym, SUM(qty) AS s FROM t WHERE qty > 0 "
                   "GROUP BY sym HAVING COUNT(*) > 2 "
                   "ORDER BY s DESC LIMIT 5")
    assert "pushdown" in plan and "GROUP BY sym" in plan
    assert "HAVING" in plan and "LIMIT 5" in plan
    # EXPLAIN prefix through sql() needs no source and runs nothing
    plan2 = sql("EXPLAIN SELECT * FROM a LEFT JOIN b ON a.k = b.k")
    assert isinstance(plan2, str) and "sort-merge" in plan2


def test_cli_explain(capsys):
    from csv_simd_tpu.__main__ import main

    assert main(["sql", "EXPLAIN SELECT COUNT(*) FROM t"]) == 0
    out = capsys.readouterr().out
    assert "column stats" in out


def test_limit_offset():
    csv = b"v\n" + b"".join(b"%d\n" % i for i in range(20))
    fr = sql("SELECT v FROM t ORDER BY v LIMIT 5 OFFSET 3", csv)
    assert fr["v"].tolist() == [3, 4, 5, 6, 7]
    r = sql("SELECT v, COUNT(*) FROM t GROUP BY v ORDER BY v "
            "LIMIT 4 OFFSET 10", csv)
    assert r["v"].tolist() == [10, 11, 12, 13]
    fr = sql("SELECT l.sym FROM l JOIN r ON l.sym = r.sym "
             "ORDER BY l.sym LIMIT 2 OFFSET 1",
             tables={"l": LEFT, "r": RIGHT})
    assert [str(s) for s in fr["sym"]] == ["AAPL", "MSFT"]
    # offset past the end is empty, not an error
    fr = sql("SELECT v FROM t LIMIT 5 OFFSET 100", csv)
    assert len(fr) == 0
    with pytest.raises(SqlError, match="non-negative"):
        sql("SELECT v FROM t LIMIT -1", csv)


def test_case_when():
    csv = b"sym,qty\nAA,5\nBB,-3\nCC,x\nDD,40\n"
    s = {"qty": "int32"}
    fr = sql("SELECT sym, CASE WHEN qty > 10 THEN 'big' WHEN qty > 0 "
             "THEN 'small' ELSE 'neg' END AS size FROM t", csv,
             schema=s)
    assert [str(v) for v in fr["size"]] == [
        "small", "neg", "neg", "big"   # parse-fail row falls to ELSE
    ]
    # mixed column/literal values convert into the column's domain
    fr = sql("SELECT CASE WHEN qty > 0 THEN qty ELSE 0 END AS c "
             "FROM t", csv, schema=s)
    assert fr["c"].tolist() == [5, 0, 0, 40]
    # no ELSE -> NULL for unmatched rows
    fr = sql("SELECT CASE WHEN qty > 10 THEN 1 END AS f FROM t", csv,
             schema=s)
    assert list(fr.ok("f")) == [False, False, False, True]
    # over a join, incl. IS NULL conditions
    L = b"sym,qty\nAAPL,10\nZZZZ,30\n"
    R = b"sym,price\nAAPL,1.25\n"
    fr = sql("SELECT l.sym, CASE WHEN price IS NULL THEN 'nope' "
             "ELSE 'hit' END AS m FROM l LEFT JOIN r ON l.sym = r.sym",
             tables={"l": L, "r": R})
    assert [str(v) for v in fr["m"]] == ["hit", "nope"]
    # first matching branch wins
    fr = sql("SELECT CASE WHEN qty > 0 THEN 'a' WHEN qty > 10 "
             "THEN 'b' END AS w FROM t", csv, schema=s)
    assert str(fr["w"][3]) == "a"
    with pytest.raises(SqlError, match="at least one WHEN"):
        sql("SELECT CASE END FROM t", csv)
    with pytest.raises(SqlError, match="must be strings"):
        sql("SELECT CASE WHEN qty > 0 THEN sym ELSE 5 END FROM t",
            csv, schema=s)


def test_order_by_aggregate_not_selected():
    csv = b"k,v,b\nAA,1,9\nBB,2,8\nAA,3,7\n"
    s = {"v": "int32", "b": "int32"}
    r = sql("SELECT k, SUM(v) FROM t GROUP BY k ORDER BY MAX(b) DESC",
            csv, schema=s)
    assert list(r["k"]) == ["AA", "BB"]      # max b: AA=9, BB=8
    r = sql("SELECT k FROM t GROUP BY k ORDER BY SUM(v)", csv, schema=s)
    assert list(r["k"]) == ["BB", "AA"]      # sums: BB=2, AA=4
    # over a join too
    t = {"l": JL, "r": JR}
    r = sql("SELECT l.sym FROM l JOIN r ON l.sym = r.sym "
            "GROUP BY l.sym ORDER BY SUM(qty) DESC", tables=t,
            schema={"qty": "int32"})
    assert list(r["sym"]) == ["AAPL", "MSFT"]


def test_select_star_plus_items():
    csv = b"k,v\nAA,1\nBB,2\n"
    fr = sql("SELECT *, v AS w FROM t", csv, schema={"v": "int32"})
    assert fr.names == ["k", "v", "w"]
    assert fr["w"].tolist() == fr["v"].tolist()
    fr = sql("SELECT *, COALESCE(l.sym, r.sym) AS m FROM l "
             "FULL JOIN r ON l.sym = r.sym", tables={"l": LEFT,
                                                     "r": RIGHT})
    assert fr.names[-1] == "m"
    assert "" not in [str(v) for v in fr["m"]]


def test_qualified_single_table_refs():
    csv = b"k,v\nAA,1\nBB,2\n"
    fr = sql("SELECT t.k FROM t WHERE t.v > 1", csv,
             schema={"v": "int32"})
    assert [str(s) for s in fr["k"]] == ["BB"]
    r = sql("SELECT t.k, SUM(t.v) FROM t GROUP BY t.k ORDER BY t.k",
            csv, schema={"v": "int32"})
    assert list(r["k"]) == ["AA", "BB"]


def test_order_by_output_alias_plain():
    csv = b"k,v\nAA,1\nBB,2\nCC,3\n"
    fr = sql("SELECT k AS kk, v FROM t ORDER BY kk DESC", csv,
             schema={"v": "int32"})
    assert [str(s) for s in fr["kk"]] == ["CC", "BB", "AA"]
    # computed alias ordering falls back to host sort
    fr = sql("SELECT CASE WHEN v > 1 THEN 'hi' ELSE 'lo' END AS c, v "
             "FROM t ORDER BY c, v DESC LIMIT 2", csv,
             schema={"v": "int32"})
    assert [str(s) for s in fr["c"]] == ["hi", "hi"]
    assert fr["v"].tolist() == [3, 2]


def test_count_star_large_group_and_scalar_offset():
    big = b"k,v\n" + b"AA,1\n" * (2**20 + 5)
    r = sql("SELECT k, COUNT(*) FROM t GROUP BY k", big)
    assert r["count"].tolist() == [2**20 + 5]
    r = sql("SELECT COUNT(*) FROM t LIMIT 1 OFFSET 1",
            b"k\nAA\n")
    assert len(r) == 0


def test_float_agg_type_with_null_group():
    r = sql("SELECT k, MAX(v) FROM t GROUP BY k ORDER BY k",
            b"k,v\nAA,1.5\nBB,x\n", schema={"v": "float"})
    assert r.schema["max_v"].type == "float"
    assert r["max_v"].tolist() == [1.5, None]


def test_coalesce_keeps_empty_text():
    fr = sql("SELECT COALESCE(a, b) AS c FROM t", b"a,b\n,x\ny,z\n")
    assert [str(v) for v in fr["c"]] == ["", "y"]


def test_limit_non_integer_rejected():
    with pytest.raises(SqlError, match="must be an integer"):
        sql("SELECT k FROM t LIMIT 1.5", b"k\n1\n")


# ------------------------------------------------- COUNT(DISTINCT)

DCSV = (b"sym,qty,tag\n"
        b"AAPL,10,x\nMSFT,20,y\nAAPL,30,x\nGOOG,7,z\n"
        b"MSFT,bad,y\nAAPL,10,w\nGOOG,5,z\n")
DROWS = list(pycsv.reader(io.StringIO(DCSV.decode())))[1:]


def test_count_distinct_scalar():
    r = sql("SELECT COUNT(DISTINCT sym) FROM t", DCSV)
    assert r[r.names[0]][0] == len({row[0] for row in DROWS})
    # a failed typed parse is NULL: never counted
    r = sql("SELECT COUNT(DISTINCT qty) FROM t", DCSV,
            schema={"qty": "int32"})
    want = len({int(row[1]) for row in DROWS if row[1].lstrip("-").isdigit()})
    assert r[r.names[0]][0] == want
    # mixes with other scalar aggregates
    r = sql("SELECT COUNT(DISTINCT sym) AS ds, SUM(qty) AS s, "
            "COUNT(*) AS c FROM t", DCSV, schema={"qty": "int32"})
    assert r["ds"][0] == 3 and r["c"][0] == len(DROWS)


def test_count_distinct_grouped():
    r = sql("SELECT sym, COUNT(DISTINCT tag) AS dt FROM t "
            "GROUP BY sym ORDER BY sym", DCSV)
    want = {}
    for row in DROWS:
        want.setdefault(row[0], set()).add(row[2])
    assert list(r["sym"]) == sorted(want)
    assert r["dt"].tolist() == [len(want[k]) for k in sorted(want)]
    # all-NULL group counts 0 but still appears
    r = sql("SELECT sym, COUNT(DISTINCT qty) AS dq FROM t "
            "GROUP BY sym ORDER BY sym",
            b"sym,qty\nAA,1\nBB,x\nBB,y\nAA,1\n",
            schema={"qty": "int32"})
    assert list(r["sym"]) == ["AA", "BB"]
    assert r["dq"].tolist() == [1, 0]


def test_count_distinct_where_and_order_by():
    r = sql("SELECT sym, COUNT(DISTINCT qty) AS dq FROM t "
            "WHERE qty > 5 GROUP BY sym ORDER BY dq DESC, sym",
            DCSV, schema={"qty": "int32"})
    want = {}
    for row in DROWS:
        if row[1].lstrip("-").isdigit() and int(row[1]) > 5:
            want.setdefault(row[0], set()).add(int(row[1]))
    rows = sorted(want, key=lambda k: (-len(want[k]), k))
    assert list(r["sym"]) == rows
    assert r["dq"].tolist() == [len(want[k]) for k in rows]
    # ORDER BY a COUNT(DISTINCT) not in the SELECT list
    r = sql("SELECT sym FROM t GROUP BY sym "
            "ORDER BY COUNT(DISTINCT qty) DESC, sym", DCSV,
            schema={"qty": "int32"})
    assert list(r["sym"]) == ["AAPL", "GOOG", "MSFT"]


def test_count_distinct_over_join():
    left = b"k,v\na,1\nb,2\na,3\n"
    right = b"k,tag\na,x\na,y\nb,x\n"
    t = {"a": left, "b": right}
    r = sql("SELECT a.k, COUNT(DISTINCT b.tag) AS dt FROM a "
            "JOIN b ON a.k = b.k GROUP BY a.k ORDER BY a.k", tables=t)
    assert list(r[r.names[0]]) == ["a", "b"]
    assert r["dt"].tolist() == [2, 1]
    r = sql("SELECT COUNT(DISTINCT b.tag) FROM a JOIN b ON a.k = b.k",
            tables=t)
    assert r[r.names[0]][0] == 2


def test_count_distinct_on_corpus(tmp_path):
    from csv_simd_tpu.corpus_api import CsvCorpus

    parts = [b"sym,tag\nAA,x\nBB,y\n", b"sym,tag\nAA,y\nAA,x\nCC,z\n"]
    paths = []
    for i, blob in enumerate(parts):
        p = tmp_path / f"p{i}.csv"
        p.write_bytes(blob)
        paths.append(str(p))
    c = CsvCorpus(paths)
    r = sql("SELECT COUNT(DISTINCT sym) FROM t", c)
    assert r[r.names[0]][0] == 3
    r = sql("SELECT sym, COUNT(DISTINCT tag) AS dt FROM t "
            "GROUP BY sym ORDER BY sym", c)
    assert list(r["sym"]) == ["AA", "BB", "CC"]
    assert r["dt"].tolist() == [2, 1, 1]


def test_count_distinct_errors():
    with pytest.raises(SqlError, match="COUNT-only"):
        sql("SELECT SUM(DISTINCT qty) FROM t", DCSV)
    with pytest.raises(SqlError, match="single column"):
        sql("SELECT COUNT(DISTINCT qty + 1) FROM t", DCSV)
    with pytest.raises(SqlError):
        sql("SELECT COUNT(DISTINCT *) FROM t", DCSV)


def test_table_alias_single_table():
    # [AS] alias on the FROM table; qualified refs use the alias
    fr = sql("SELECT a.sym, a.qty FROM t AS a WHERE a.qty > 5 "
             "ORDER BY a.qty", CSV, schema=S)
    want = sorted([r for r in ROWS if (_qty(r) or -1) > 5],
                  key=_qty)
    assert [str(s) for s in fr["sym"]] == [r[0] for r in want]
    # alias without AS
    fr = sql("SELECT a.sym FROM t a LIMIT 1", CSV)
    assert fr.names == ["sym"]
    # once aliased, the bare table name no longer qualifies ('t.sym'
    # stays a literal column ref, same as any unknown name)
    with pytest.raises(KeyError, match="no column 't.sym'"):
        sql("SELECT t.sym FROM t AS a", CSV)


def test_table_alias_path(tmp_path):
    p = tmp_path / "x.csv"
    p.write_bytes(LEFT)
    fr = sql(f"SELECT a.qty FROM '{p}' AS a WHERE a.qty >= 20 "
             "ORDER BY a.qty", schema={"qty": "int32"})
    assert fr["qty"].tolist() == [20, 30, 40]


def test_join_table_aliases():
    t = {"l": LEFT, "r": RIGHT}
    fr = sql("SELECT a.sym, b.price FROM l AS a JOIN r AS b "
             "ON a.sym = b.sym ORDER BY b.price", tables=t)
    assert [str(s) for s in fr["sym"]] == ["AAPL", "AAPL", "MSFT"]
    # the bare names stop qualifying once aliased
    with pytest.raises(SqlError, match="unknown table alias"):
        sql("SELECT l.sym FROM l AS a JOIN r AS b ON a.sym = b.sym",
            tables=t)
    # two sides may not share an alias
    with pytest.raises(SqlError, match="duplicate table alias"):
        sql("SELECT * FROM l AS x JOIN r AS x ON x.sym = x.sym",
            tables=t)
    # an explicit alias colliding with the other side's bare name
    with pytest.raises(SqlError, match="duplicate table alias"):
        sql("SELECT * FROM l JOIN r AS l ON sym = sym", tables=t)


def test_self_join_via_aliases():
    # pairs of rows of the SAME table sharing a key
    t = {"t": LEFT}  # AAPL appears twice (qty 10 and 40)
    fr = sql("SELECT a.sym, a.qty, b.qty AS qty_b FROM t a JOIN t b "
             "ON a.sym = b.sym WHERE a.qty < b.qty", tables=t,
             schema={"qty": "int32"}, right_schema={"qty": "int32"})
    assert [str(s) for s in fr["sym"]] == ["AAPL"]
    assert fr["qty"].tolist() == [10]
    assert fr["qty_b"].tolist() == [40]


def test_text_min_max_scalar():
    c = b"sym,qty\nBB,1\nAA,2\ncc,3\nAA,9\n"
    r = sql("SELECT MIN(sym) AS lo, MAX(sym) AS hi, COUNT(sym) AS n "
            "FROM t", c)
    assert r["lo"][0] == "AA" and r["hi"][0] == "cc"
    assert r["n"][0] == 4
    # WHERE narrows the reduce
    r = sql("SELECT MAX(sym) AS hi FROM t WHERE qty < 3", c,
            schema={"qty": "int32"})
    assert r["hi"][0] == "BB"
    with pytest.raises(SqlError, match="text aggregates"):
        sql("SELECT SUM(sym) FROM t", c)
    with pytest.raises(SqlError, match="text aggregates"):
        sql("SELECT AVG(sym) FROM t", c)


def test_text_min_max_group_by():
    c = (b"grp,name,qty\n"
         b"a,Zoe,1\n"
         b"a,Amy,2\n"
         b"b,Bob,3\n"
         b"b,Cal,4\n"
         b"b,Bob,5\n")
    r = sql("SELECT grp, MIN(name) AS lo, MAX(name) AS hi, "
            "COUNT(name) AS n, COUNT(*) AS rows_ FROM t "
            "GROUP BY grp ORDER BY grp", c, schema={"qty": "int32"})
    assert list(map(str, r["grp"])) == ["a", "b"]
    assert list(r["lo"]) == ["Amy", "Bob"]
    assert list(r["hi"]) == ["Zoe", "Cal"]
    assert r["n"].tolist() == [2, 3]
    assert r["rows_"].tolist() == [2, 3]
    # MIN of the group key itself
    r = sql("SELECT grp, MIN(grp) AS g FROM t GROUP BY grp "
            "ORDER BY grp", c)
    assert list(r["g"]) == ["a", "b"]
    with pytest.raises(SqlError, match="text aggregates"):
        sql("SELECT grp, SUM(name) FROM t GROUP BY grp", c)


def test_text_min_max_order_by_agg():
    c = b"grp,name\nb,Bob\na,Zoe\nb,Cal\na,Amy\n"
    r = sql("SELECT grp, MAX(name) AS hi FROM t GROUP BY grp "
            "ORDER BY MAX(name) DESC", c)
    assert list(r["hi"]) == ["Zoe", "Cal"]
