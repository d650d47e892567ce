"""SQL arithmetic value expressions: computed SELECT items, arithmetic
WHERE comparisons (device-evaluated), and aggregates over expressions —
differential against Python/pandas oracles.

Semantics under test (query.VExpr docstring): int math in int32
(two's-complement wrap), any float operand or division promotes to
float32, x/0 and any not-ok operand make the row NOT-ok, NULL rows
never satisfy a comparison."""

import csv as pycsv
import io

import numpy as np
import pytest

from csv_simd_tpu.sql import SqlError, sql

CSV = (b"sym,qty,price\n"
       b"AAPL,10,1.25\n"
       b"MSFT,20,2.50\n"
       b"AAPL,-5,0.75\n"
       b"GOOG,7,9.99\n"
       b"MSFT,x!,1.00\n"          # qty parse failure -> NULL rows
       b"AAPL,40,3.00\n"
       b"TSLA,3,0\n")             # price 0: divisions go NULL
S = {"qty": "int32", "price": "float"}
ROWS = list(pycsv.reader(io.StringIO(CSV.decode())))[1:]


def _q(r):
    try:
        return int(r[1])
    except ValueError:
        return None


def test_computed_select_item():
    r = sql("SELECT sym, qty * price AS value, qty + 1 FROM t",
            CSV, schema=S)
    assert r.names == ["sym", "value", "(qty + 1)"]
    okm = r.ok("value")
    got = [None if okm is not None and not okm[i]
           else round(float(v), 4) for i, v in enumerate(r["value"])]
    want = [None if _q(x) is None
            else round(_q(x) * float(x[2]), 4) for x in ROWS]
    assert got == want
    oki = r.ok("(qty + 1)")
    goti = [None if oki is not None and not oki[i] else int(v)
            for i, v in enumerate(r["(qty + 1)"])]
    assert goti == [None if _q(x) is None else _q(x) + 1 for x in ROWS]


def test_arithmetic_where_device():
    r = sql("SELECT sym FROM t WHERE qty * price > 10", CSV, schema=S)
    want = [x[0] for x in ROWS
            if _q(x) is not None and _q(x) * float(x[2]) > 10]
    assert [str(s) for s in r["sym"]] == want
    # column vs column, parenthesized arithmetic, unary minus
    r = sql("SELECT sym FROM t WHERE qty > price", CSV, schema=S)
    want = [x[0] for x in ROWS
            if _q(x) is not None and _q(x) > float(x[2])]
    assert [str(s) for s in r["sym"]] == want
    r = sql("SELECT sym FROM t WHERE (qty + 5) * 2 >= -1 AND qty < 8",
            CSV, schema=S)
    want = [x[0] for x in ROWS
            if _q(x) is not None and (_q(x) + 5) * 2 >= -1
            and _q(x) < 8]
    assert [str(s) for s in r["sym"]] == want


def test_division_by_zero_is_null():
    # TSLA has price 0: qty/price is NULL there, never satisfying
    r = sql("SELECT sym FROM t WHERE qty / price >= 0", CSV, schema=S)
    want = [x[0] for x in ROWS
            if _q(x) is not None and float(x[2]) != 0
            and _q(x) / float(x[2]) >= 0]
    assert [str(s) for s in r["sym"]] == want
    # ... and the computed item comes back not-ok
    r = sql("SELECT sym, qty / price AS ratio FROM t", CSV, schema=S)
    okm = np.asarray(r.ok("ratio"))
    assert not okm[ROWS.index(["TSLA", "3", "0"])]


def test_expression_aggregates_scalar_and_grouped():
    pd = pytest.importorskip("pandas")
    df = pd.read_csv(io.BytesIO(CSV))
    df["qty"] = pd.to_numeric(df["qty"], errors="coerce")
    df["rev"] = df["qty"] * df["price"]
    r = sql("SELECT SUM(qty*price) AS s, AVG(qty*price) AS m, "
            "COUNT(qty*price) AS c FROM t", CSV, schema=S)
    assert abs(float(r["s"][0]) - df["rev"].sum()) < 1e-3
    assert abs(float(r["m"][0]) - df["rev"].mean()) < 1e-4
    assert int(r["c"][0]) == int(df["rev"].notna().sum())
    g = df.groupby("sym")["rev"].sum()
    r = sql("SELECT sym, SUM(qty * price) AS rev FROM t GROUP BY sym "
            "ORDER BY sym", CSV, schema=S)
    assert [str(s) for s in r["sym"]] == g.index.tolist()
    np.testing.assert_allclose(
        np.asarray(r["rev"], np.float64), g.to_numpy(), rtol=1e-5)
    # HAVING and ORDER BY over the expression aggregate
    r = sql("SELECT sym FROM t GROUP BY sym "
            "HAVING SUM(qty*price) > 50 ORDER BY SUM(qty*price) DESC",
            CSV, schema=S)
    want = g[g > 50].sort_values(ascending=False).index.tolist()
    assert [str(s) for s in r["sym"]] == want


def test_int32_wrap_semantics_consistent():
    """SELECT and WHERE evaluate int expressions identically (int32
    two's-complement wrap on both paths)."""
    csv = b"a\n2000000000\n3\n"
    r = sql("SELECT a * 2 AS d FROM t", csv, schema={"a": "int32"})
    wrapped = int(np.int32(np.int32(2000000000) * np.int32(2)))
    assert r["d"].tolist() == [wrapped, 6]
    r = sql(f"SELECT a FROM t WHERE a * 2 = {wrapped}", csv,
            schema={"a": "int32"})
    assert r["a"].tolist() == [2000000000]


def test_expression_over_join_projection_and_aggregate():
    left = b"sym,qty\nA,2\nB,3\nA,4\n"
    right = b"sym,price\nA,1.5\nB,2.0\n"
    r = sql("SELECT l.sym, qty * price AS v FROM l JOIN r "
            "ON l.sym = r.sym", tables={"l": left, "r": right},
            schema={"qty": "int32"}, right_schema={"price": "float"})
    got = sorted(zip([str(s) for s in r["sym"]],
                     [float(v) for v in r["v"]]))
    assert got == [("A", 3.0), ("A", 6.0), ("B", 6.0)]
    r = sql("SELECT SUM(qty * price) AS s FROM l JOIN r "
            "ON l.sym = r.sym", tables={"l": left, "r": right},
            schema={"qty": "int32"}, right_schema={"price": "float"})
    assert abs(float(r["s"][0]) - 15.0) < 1e-6
    # arithmetic WHERE over the joined frame (host twin)
    r = sql("SELECT l.sym FROM l JOIN r ON l.sym = r.sym "
            "WHERE qty * price > 4", tables={"l": left, "r": right},
            schema={"qty": "int32"}, right_schema={"price": "float"})
    assert sorted(str(s) for s in r["sym"]) == ["A", "B"]


def test_expression_on_corpus(tmp_path):
    from csv_simd_tpu.corpus_api import CsvCorpus

    rows = CSV.decode().strip().split("\n")
    (tmp_path / "a.csv").write_text("\n".join(rows[:4]) + "\n")
    (tmp_path / "b.csv").write_text("\n".join([rows[0]] + rows[4:]) + "\n")
    c = CsvCorpus([str(tmp_path / "a.csv"), str(tmp_path / "b.csv")],
                  backend="golden")
    whole = sql("SELECT sym, SUM(qty*price) AS rev FROM t GROUP BY sym "
                "ORDER BY sym", CSV, schema=S)
    part = sql("SELECT sym, SUM(qty*price) AS rev FROM t GROUP BY sym "
               "ORDER BY sym", c, schema=S)
    assert [str(s) for s in whole["sym"]] == [str(s) for s in part["sym"]]
    np.testing.assert_allclose(np.asarray(whole["rev"], np.float64),
                               np.asarray(part["rev"], np.float64),
                               rtol=1e-5)


def test_expression_errors():
    with pytest.raises((SqlError, ValueError), match="numeric"):
        sql("SELECT sym * 2 FROM t", CSV, schema=S)
    with pytest.raises(SqlError, match="GROUP BY"):
        sql("SELECT qty * 2 FROM t GROUP BY sym", CSV, schema=S)
    # ORDER BY an arithmetic expression is supported directly (the
    # key computes on host over the materialized referenced columns;
    # rows whose expression is NULL sort last)
    fr = sql("SELECT sym, qty FROM t ORDER BY qty * 2", CSV, schema=S)
    got = [(str(s), q) for s, q in zip(fr["sym"], fr["qty"])]
    valid = sorted(((r[0], _q(r)) for r in ROWS
                    if _q(r) is not None), key=lambda p: p[1])
    nulls = [(r[0], None) for r in ROWS if _q(r) is None]
    assert [g[0] for g in got] == [p[0] for p in valid + nulls]
    with pytest.raises(SqlError, match="numbers"):
        sql("SELECT sym FROM t WHERE qty + 1 > 'x'", CSV, schema=S)


def test_case_with_expression_values():
    # abs() via CASE: expression THEN values, column ELSE
    r = sql("SELECT CASE WHEN qty < 0 THEN -qty ELSE qty END AS a "
            "FROM t", CSV, schema=S)
    okm = r.ok("a")
    got = [None if okm is not None and not okm[i] else int(v)
           for i, v in enumerate(r["a"])]
    assert got == [abs(_q(x)) if _q(x) is not None else None
                   for x in ROWS]
    # mixed expr / column / literal values, int32 result
    r = sql("SELECT CASE WHEN qty > 10 THEN qty * 2 WHEN qty > 0 "
            "THEN qty ELSE 0 END AS v FROM t", CSV, schema=S)
    assert str(r.schema["v"].type) == "int32"

    def _case(x):
        q = _q(x)
        if q is None:
            return 0  # NULL satisfies no WHEN -> ELSE
        return q * 2 if q > 10 else (q if q > 0 else 0)

    assert [int(v) for v in r["v"]] == [_case(x) for x in ROWS]
    # float promotion when an expression value is float
    r = sql("SELECT CASE WHEN qty > 0 THEN qty * price ELSE 0 END "
            "AS w FROM t", CSV, schema=S)
    assert r.schema["w"].type in ("float", "float32")
    with pytest.raises(SqlError, match="string literals"):
        sql("SELECT CASE WHEN qty > 0 THEN qty*2 ELSE 'x' END FROM t",
            CSV, schema=S)


def test_legacy_forms_unchanged():
    # negative literals everywhere they could appear
    r = sql("SELECT sym FROM t WHERE qty > -6 AND qty BETWEEN -5 AND 20 "
            "AND qty IN (-5, 7, 10, 20)", CSV, schema=S)
    assert [str(s) for s in r["sym"]] == ["AAPL", "MSFT", "AAPL", "GOOG"]
    r = sql("SELECT sym, CASE WHEN qty < 0 THEN -1 ELSE 1 END AS sgn "
            "FROM t LIMIT 3", CSV, schema=S)
    assert r["sgn"].tolist() == [1.0, 1.0, -1.0]


def test_scalar_numeric_functions_items():
    # ABS keeps the operand's type; FLOOR/CEIL/ROUND act on floats
    r = sql("SELECT sym, ABS(qty) AS aq, FLOOR(price) AS fp, "
            "CEIL(price) AS cp, ROUND(price, 1) AS rp FROM t",
            CSV, schema=S)
    okm = r.ok("aq")
    got = [None if okm is not None and not okm[i] else int(v)
           for i, v in enumerate(r["aq"])]
    assert got == [None if _q(x) is None else abs(_q(x)) for x in ROWS]
    assert [float(v) for v in r["fp"]] == \
        [float(np.floor(np.float32(x[2]))) for x in ROWS]
    assert [float(v) for v in r["cp"]] == \
        [float(np.ceil(np.float32(x[2]))) for x in ROWS]
    s = np.float32(10.0)
    assert [float(v) for v in r["rp"]] == \
        [float(np.round(np.float32(x[2]) * s) / s) for x in ROWS]
    # FLOOR/CEIL/ROUND(int, d>=0) are the identity (and stay int)
    r = sql("SELECT FLOOR(qty) AS f, CEIL(qty) AS c, ROUND(qty) AS r0 "
            "FROM t WHERE qty IS NOT NULL", CSV, schema=S)
    want = [_q(x) for x in ROWS if _q(x) is not None]
    assert [int(v) for v in r["f"]] == want
    assert [int(v) for v in r["c"]] == want
    assert [int(v) for v in r["r0"]] == want
    # negative d rounds to tens (promotes to float32)
    r = sql("SELECT ROUND(qty, -1) AS rt FROM t "
            "WHERE qty IS NOT NULL", CSV, schema=S)
    si = np.float32(10.0 ** -1)
    assert [float(v) for v in r["rt"]] == \
        [float(np.round(np.float32(q) * si) / si) for q in want]


def test_mod_truncated_semantics():
    # MOD/% follow the DIVIDEND's sign (C semantics), not Python's
    r = sql("SELECT sym, MOD(qty, 3) AS m, qty % 3 AS m2 FROM t "
            "WHERE qty IS NOT NULL", CSV, schema=S)
    want = [float(np.fmod(np.int32(_q(x)), np.int32(3)))
            for x in ROWS if _q(x) is not None]
    assert [float(v) for v in r["m"]] == want
    assert [float(v) for v in r["m2"]] == want
    assert any(v < 0 for v in want)      # -5 % 3 == -2 here
    # b == 0 -> NULL row, like division
    r = sql("SELECT sym, qty % (qty - qty) AS z FROM t", CSV, schema=S)
    okm = np.asarray(r.ok("z"))
    assert not okm.any()
    # float operands promote
    r = sql("SELECT MOD(price, 2) AS fm FROM t", CSV, schema=S)
    assert [round(float(v), 4) for v in r["fm"]] == \
        [round(float(np.fmod(np.float32(x[2]), np.float32(2))), 4)
         for x in ROWS]


def test_scalar_functions_in_where_and_aggregates():
    # device-evaluated predicate: ABS / %
    r = sql("SELECT sym FROM t WHERE ABS(qty) > 6", CSV, schema=S)
    want = [x[0] for x in ROWS if _q(x) is not None and abs(_q(x)) > 6]
    assert [str(s) for s in r["sym"]] == want
    r = sql("SELECT sym FROM t WHERE qty % 2 = 0", CSV, schema=S)
    want = [x[0] for x in ROWS
            if _q(x) is not None and np.fmod(np.int32(_q(x)), 2) == 0]
    assert [str(s) for s in r["sym"]] == want
    # aggregate over a function expression, scalar and grouped
    r = sql("SELECT SUM(ABS(qty)) AS s FROM t", CSV, schema=S)
    assert int(r["s"][0]) == sum(abs(_q(x)) for x in ROWS
                                 if _q(x) is not None)
    r = sql("SELECT sym, SUM(ABS(qty)) AS s FROM t GROUP BY sym "
            "ORDER BY sym", CSV, schema=S)
    import collections
    acc = collections.defaultdict(int)
    for x in ROWS:
        if _q(x) is not None:
            acc[x[0]] += abs(_q(x))
    assert [str(s) for s in r["sym"]] == sorted(acc)
    assert [int(v) for v in r["s"]] == [acc[k] for k in sorted(acc)]


def test_scalar_functions_compose_and_roundtrip():
    # nesting + default names re-parse (the _maybe_expr_ref contract)
    r = sql("SELECT ABS(qty * 2) - 1, ROUND(price / 2, 2) FROM t "
            "WHERE qty IS NOT NULL", CSV, schema=S)
    assert r.names[0] == "(ABS((qty * 2)) - 1)"
    assert r.names[1] == "ROUND((price / 2), 2)"
    want = [abs(_q(x) * 2) - 1 for x in ROWS if _q(x) is not None]
    assert [int(v) for v in r["(ABS((qty * 2)) - 1)"]] == want
    # HAVING against an un-selected function aggregate
    r = sql("SELECT sym, COUNT(*) AS n FROM t GROUP BY sym "
            "HAVING SUM(ABS(qty)) > 10 ORDER BY sym", CSV, schema=S)
    import collections
    acc = collections.defaultdict(int)
    for x in ROWS:
        if _q(x) is not None:
            acc[x[0]] += abs(_q(x))
    assert [str(s) for s in r["sym"]] == \
        sorted(k for k in acc if acc[k] > 10)
    # errors: ROUND with a float place count
    with pytest.raises(SqlError, match="integer number of decimal"):
        sql("SELECT ROUND(price, 1.5) FROM t", CSV, schema=S)


def test_cast_int_and_float():
    csv = b"a,b\n7,2.9\n-3,-2.9\n10,1e9\n"
    s = {"a": "int32", "b": "float"}
    fr = sql("SELECT CAST(b AS INTEGER) AS i, CAST(a AS FLOAT) AS f, "
             "CAST(a / 2 AS INTEGER) AS h FROM t", csv, schema=s)
    # float -> int truncates toward zero
    assert fr["i"].tolist() == [2, -2, 1000000000]
    assert fr["f"].tolist() == pytest.approx([7.0, -3.0, 10.0])
    # division promotes to float; the cast truncates back
    assert fr["h"].tolist() == [3, -1, 5]
    # in WHERE, on device
    fr = sql("SELECT a FROM t WHERE CAST(b AS INTEGER) = 2", csv,
             schema=s)
    assert fr["a"].tolist() == [7]
    # saturation at the int32 limits (XLA convert semantics)
    csv2 = b"x\n4e9\n-4e9\n"
    fr = sql("SELECT CAST(x AS INT) AS i FROM t", csv2,
             schema={"x": "float"})
    assert fr["i"].tolist() == [2147483647, -2147483648]
    # identity casts are no-ops; aggregates accept cast expressions
    r = sql("SELECT SUM(CAST(b AS INTEGER)) AS s FROM t", csv, schema=s)
    assert r["s"][0] == 2 + -2 + 1000000000
    with pytest.raises(SqlError, match="CAST target"):
        sql("SELECT CAST(a AS TEXT) FROM t", csv, schema=s)
