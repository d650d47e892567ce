"""Round-3 SQL surface: EXISTS/NOT EXISTS subqueries (uncorrelated
constants + the correlated-equality IN rewrite), CROSS JOIN, JOIN ...
USING, IFNULL/NULLIF, REPLACE/INSTR text functions — each checked
against Python oracles over the same rows (the reference has no SQL;
bin/main.rs:11-14 is a stub — this layer is the framework's own)."""

import csv as pycsv
import io
import itertools

import numpy as np
import pytest

from csv_simd_tpu.sql import SqlError, explain, sql, table_refs

T_CSV = (b"k,x,s\n"
         b"1,10,hello world\n"
         b"2,20,foo\n"
         b"3,30,world peace\n"
         b"4,bad!,ox\n")          # x parse failure -> NULL
U_CSV = (b"k,y\n"
         b"1,5\n"
         b"3,6\n"
         b"3,7\n"                  # duplicate key: EXISTS is still set-like
         b"9,8\n")
TBL = {"t": T_CSV, "u": U_CSV}
TROWS = list(pycsv.reader(io.StringIO(T_CSV.decode())))[1:]
UROWS = list(pycsv.reader(io.StringIO(U_CSV.decode())))[1:]
UKEYS = {r[0] for r in UROWS}


# ------------------------------------------------------------- EXISTS

def test_exists_uncorrelated_true_is_noop():
    fr = sql("SELECT k FROM t WHERE EXISTS (SELECT k FROM u WHERE "
             "y > 7)", tables=TBL)
    assert [str(v) for v in fr["k"]] == [r[0] for r in TROWS]


def test_exists_uncorrelated_false_matches_nothing():
    fr = sql("SELECT k FROM t WHERE EXISTS (SELECT k FROM u WHERE "
             "y > 99)", tables=TBL)
    assert len(fr) == 0


def test_not_exists_uncorrelated_false_is_noop():
    fr = sql("SELECT k FROM t WHERE NOT EXISTS (SELECT k FROM u "
             "WHERE y > 99)", tables=TBL)
    assert len(fr) == len(TROWS)


def test_exists_aggregate_inner_always_true():
    # SQL: an aggregate subquery returns one row even over zero input
    fr = sql("SELECT k FROM t WHERE EXISTS (SELECT COUNT(*) FROM u "
             "WHERE y > 99)", tables=TBL)
    assert len(fr) == len(TROWS)


def test_exists_false_with_count_star():
    # the match-nothing encoding must work with no column refs at all
    r = sql("SELECT COUNT(*) AS n FROM t WHERE EXISTS "
            "(SELECT k FROM u WHERE y > 99)", tables=TBL)
    assert list(r["n"]) == [0]


def test_exists_correlated_semi():
    fr = sql("SELECT k FROM t WHERE EXISTS (SELECT * FROM u WHERE "
             "u.k = t.k) ORDER BY k", tables=TBL)
    want = sorted(r[0] for r in TROWS if r[0] in UKEYS)
    assert [str(v) for v in fr["k"]] == want


def test_not_exists_correlated_anti():
    fr = sql("SELECT k FROM t WHERE NOT EXISTS (SELECT * FROM u "
             "WHERE u.k = t.k) ORDER BY k", tables=TBL)
    want = sorted(r[0] for r in TROWS if r[0] not in UKEYS)
    assert [str(v) for v in fr["k"]] == want


def test_exists_correlated_with_inner_filter():
    fr = sql("SELECT k FROM t WHERE EXISTS (SELECT * FROM u WHERE "
             "u.k = t.k AND y > 5) ORDER BY k", tables=TBL)
    want = sorted({r[0] for r in UROWS if int(r[1]) > 5}
                  & {r[0] for r in TROWS})
    assert [str(v) for v in fr["k"]] == want


def test_exists_correlated_flipped_sides():
    # t.k = u.k (outer col on the left) rewrites the same way
    fr = sql("SELECT k FROM t WHERE EXISTS (SELECT * FROM u WHERE "
             "t.k = u.k) ORDER BY k", tables=TBL)
    want = sorted(r[0] for r in TROWS if r[0] in UKEYS)
    assert [str(v) for v in fr["k"]] == want


def test_exists_composes_with_other_predicates():
    fr = sql("SELECT k FROM t WHERE x > 10 AND EXISTS (SELECT * "
             "FROM u WHERE u.k = t.k) ORDER BY k", tables=TBL,
             schema={"x": "int32"})
    want = sorted(r[0] for r in TROWS
                  if r[0] in UKEYS and r[1].isdigit()
                  and int(r[1]) > 10)
    assert [str(v) for v in fr["k"]] == want


def test_exists_inside_or():
    fr = sql("SELECT k FROM t WHERE x > 25 OR EXISTS (SELECT * FROM "
             "u WHERE u.k = t.k) ORDER BY k", tables=TBL,
             schema={"x": "int32"})
    want = sorted(r[0] for r in TROWS
                  if r[0] in UKEYS
                  or (r[1].isdigit() and int(r[1]) > 25))
    assert [str(v) for v in fr["k"]] == want


def test_exists_inner_alias_shadows_outer():
    # the inner aliases the same name 't': "t.k" is the INNER table
    # (SQL scoping), so the subquery is uncorrelated and non-empty
    fr = sql("SELECT k FROM t WHERE EXISTS (SELECT k FROM u AS t "
             "WHERE t.k = 1)", tables=TBL)
    assert len(fr) == len(TROWS)


def test_exists_or_nested_now_supported():
    """Round 5: OR-nested correlation runs via the theta semi-join
    (tests/test_sql_exists_theta.py holds the differentials; this
    pins that the shape EXECUTES here too)."""
    fr = sql("SELECT k FROM t WHERE EXISTS (SELECT k FROM u WHERE "
             "u.k = t.k OR u.y > 5)", tables=TBL,
             schema={"k": "int32", "x": "int32"})
    want = [r[0] for r in TROWS
            if r[0] in UKEYS or any(u[1].isdigit() and int(u[1]) > 5
                                    for u in UROWS)]
    assert [str(v) for v in fr["k"]] == want


@pytest.mark.parametrize("q", [
    # correlated + GROUP BY
    "SELECT k FROM t WHERE EXISTS (SELECT k FROM u WHERE u.k = t.k "
    "GROUP BY k)",
])
def test_exists_unsupported_shapes_raise(q):
    with pytest.raises(SqlError, match="correlated EXISTS"):
        sql(q, tables=TBL)


def test_table_refs_sees_exists_inner_tables():
    assert table_refs(
        "SELECT k FROM t WHERE EXISTS (SELECT k FROM u WHERE "
        "u.k = t.k)") == ["t", "u"]


# --------------------------------------------------------- CROSS JOIN

def test_cross_join_product():
    fr = sql("SELECT a.k, b.k, y FROM t a CROSS JOIN u b "
             "ORDER BY a.k, b.k, y", tables=TBL)
    want = sorted((l[0], r[0], int(r[1]))
                  for l, r in itertools.product(TROWS, UROWS))
    got = list(zip((str(v) for v in fr["k"]),
                   (str(v) for v in fr["k_right"]),
                   (int(v) for v in fr["y"])))
    assert got == want


def test_cross_join_count_and_where():
    r = sql("SELECT COUNT(*) AS n FROM t CROSS JOIN u", tables=TBL)
    assert list(r["n"]) == [len(TROWS) * len(UROWS)]
    fr = sql("SELECT a.k, y FROM t a CROSS JOIN u b WHERE y > 6 "
             "ORDER BY a.k, y", tables=TBL)
    want = sorted((l[0], int(r[1]))
                  for l, r in itertools.product(TROWS, UROWS)
                  if int(r[1]) > 6)
    assert list(zip((str(v) for v in fr["k"]),
                    (int(v) for v in fr["y"]))) == want


def test_cross_join_explain():
    txt = explain("SELECT a.k FROM t a CROSS JOIN u b")
    assert "cross" in txt and "Cartesian" in txt


def test_cross_join_pandas_differential():
    pd = pytest.importorskip("pandas")
    fr = sql("SELECT x, y FROM t CROSS JOIN u ORDER BY x, y",
             tables=TBL, schema={"x": "int32"})
    lt = pd.read_csv(io.BytesIO(T_CSV))
    rt = pd.read_csv(io.BytesIO(U_CSV))
    lt["x"] = pd.to_numeric(lt["x"], errors="coerce")
    m = lt.merge(rt, how="cross").sort_values(["x", "y"])
    ours_ok = np.asarray(fr.ok("x"))
    got = [(int(a), int(b))
           for a, b, o in zip(fr["x"], fr["y"], ours_ok) if o]
    want = [(int(a), int(b))
            for a, b in zip(m["x"], m["y"]) if not np.isnan(a)]
    assert sorted(got) == sorted(want)


# -------------------------------------------------------- JOIN USING

def test_join_using_equals_on():
    via_using = sql("SELECT a.k, x, y FROM t a JOIN u b USING (k) "
                    "ORDER BY a.k, y", tables=TBL)
    via_on = sql("SELECT a.k, x, y FROM t a JOIN u b ON a.k = b.k "
                 "ORDER BY a.k, y", tables=TBL)
    assert via_using.names == via_on.names
    for n in via_using.names:
        assert [str(v) for v in via_using[n]] == \
            [str(v) for v in via_on[n]]


def test_left_join_using_composite():
    lcsv = b"k,g,x\n1,a,10\n2,b,20\n"
    rcsv = b"k,g,y\n1,a,5\n2,z,6\n"
    fr = sql("SELECT l.k, y FROM t1 l LEFT JOIN t2 r USING (k, g) "
             "ORDER BY l.k", tables={"t1": lcsv, "t2": rcsv})
    ok = np.asarray(fr.ok("y"))
    assert [str(v) for v in fr["k"]] == ["1", "2"]
    assert bool(ok[0]) and not bool(ok[1])  # (2,b) has no (2,z) match


# ---------------------------------------------------- IFNULL / NULLIF

def test_ifnull_two_columns():
    csv = b"a,b\n1,9\nzz,8\n3,7\n"
    fr = sql("SELECT IFNULL(a, b) AS v FROM t", tables={"t": csv},
             schema={"a": "int32", "b": "int32"})
    assert [int(v) for v in fr["v"]] == [1, 8, 3]


def test_ifnull_arity():
    with pytest.raises(SqlError, match="exactly two"):
        sql("SELECT IFNULL(a) FROM t", tables={"t": b"a\n1\n"})
    with pytest.raises(SqlError, match="exactly two"):
        sql("SELECT IFNULL(a, a, a) FROM t", tables={"t": b"a\n1\n"})


def test_nullif_column_vs_column():
    csv = b"a,b\n1,1\n2,9\n3,3\n"
    fr = sql("SELECT NULLIF(a, b) AS v FROM t", tables={"t": csv})
    ok = np.asarray(fr.ok("v"))
    assert list(map(bool, ok)) == [False, True, False]
    assert int(np.asarray(fr["v"])[1]) == 2


def test_nullif_column_vs_literal():
    csv = b"a,s\n1,x\n2,y\n3,x\n"
    fr = sql("SELECT NULLIF(a, 2) AS i, NULLIF(s, 'x') AS t FROM t",
             tables={"t": csv})
    iok = np.asarray(fr.ok("i"))
    tok = np.asarray(fr.ok("t"))
    assert list(map(bool, iok)) == [True, False, True]
    assert list(map(bool, tok)) == [False, True, False]
    assert str(np.asarray(fr["t"])[1]) == "y"


# ------------------------------------------------------ REPLACE/INSTR

def test_replace_and_empty_from():
    fr = sql("SELECT REPLACE(s, 'world', 'W') AS r, "
             "REPLACE(s, '', 'X') AS e FROM t", tables=TBL)
    texts = [r[2] for r in TROWS]
    assert [str(v) for v in fr["r"]] == \
        [t.replace("world", "W") for t in texts]
    # SQLite: REPLACE(x, '', z) returns x unchanged
    assert [str(v) for v in fr["e"]] == texts


def test_instr_positions():
    fr = sql("SELECT INSTR(s, 'world') AS p, INSTR(s, '') AS e "
             "FROM t", tables=TBL)
    texts = [r[2] for r in TROWS]
    assert [int(v) for v in fr["p"]] == \
        [t.find("world") + 1 for t in texts]
    assert [int(v) for v in fr["e"]] == [1] * len(texts)


def test_order_by_instr():
    fr = sql("SELECT s FROM t ORDER BY INSTR(s, 'o'), s", tables=TBL)
    texts = sorted((r[2] for r in TROWS),
                   key=lambda t: (t.find("o") + 1, t))
    assert [str(v) for v in fr["s"]] == texts


def test_replace_nests_in_concat():
    fr = sql("SELECT CONCAT(REPLACE(s, 'o', '0'), '!') AS c FROM t",
             tables=TBL)
    assert [str(v) for v in fr["c"]] == \
        [r[2].replace("o", "0") + "!" for r in TROWS]


def test_instr_rejected_in_concat():
    with pytest.raises(SqlError, match="INSTR returns an integer"):
        sql("SELECT INSTR(s, 'o') || 'x' FROM t", tables=TBL)
