"""Multi-key correlated EXISTS/NOT EXISTS (VERDICT r3 item 8): the
multi-conjunct equality correlation rewrites to a composite semi-join
(the in_rows leaf), differential against Python/pandas oracles."""

import csv as pycsv
import io

import numpy as np
import pandas as pd
import pytest

from csv_simd_tpu.sql import SqlError, sql

T_CSV = (b"a,b,v\n"
         b"1,x,10\n"
         b"2,y,20\n"
         b"1,y,30\n"
         b"3,z,40\n"
         b"bad!,x,50\n"   # a parse failure -> NULL key: never matches
         b"2,x,60\n")
U_CSV = (b"a,b,w\n"
         b"1,x,5\n"
         b"1,y,6\n"
         b"2,x,7\n"
         b"2,x,8\n"       # duplicate pair: EXISTS stays set-like
         b"9,z,9\n"
         b"oops,y,1\n")   # NULL key row: can never witness
TBL = {"t": T_CSV, "u": U_CSV}
S = {"a": "int32", "v": "int32"}

TROWS = list(pycsv.reader(io.StringIO(T_CSV.decode())))[1:]
UPAIRS = {(r[0], r[1]) for r in
          pycsv.reader(io.StringIO(U_CSV.decode()))
          if r[0].isdigit()} - {("a", "b")}


def _t_ok(r):
    return r[0].lstrip("-").isdigit()


def test_exists_two_keys():
    fr = sql("SELECT v FROM t WHERE EXISTS (SELECT a FROM u WHERE "
             "u.a = t.a AND u.b = t.b)", tables=TBL, schema=S)
    want = [int(r[2]) for r in TROWS
            if _t_ok(r) and (r[0], r[1]) in UPAIRS]
    assert fr["v"].tolist() == want
    assert want  # fixture really matches something


def test_not_exists_two_keys():
    fr = sql("SELECT v FROM t WHERE NOT EXISTS (SELECT a FROM u WHERE "
             "u.a = t.a AND u.b = t.b)", tables=TBL, schema=S)
    # EXISTS is an existence test, never UNKNOWN: a NULL outer key
    # matches no inner row, so EXISTS is FALSE and NOT EXISTS is TRUE —
    # the bad! row IS included (matches the single-key rewrite too)
    want = [int(r[2]) for r in TROWS
            if not _t_ok(r) or (r[0], r[1]) not in UPAIRS]
    assert fr["v"].tolist() == want


def test_exists_two_keys_plus_uncorrelated_rest():
    fr = sql("SELECT v FROM t WHERE EXISTS (SELECT a FROM u WHERE "
             "u.a = t.a AND w >= 7 AND u.b = t.b)", tables=TBL,
             schema=S)
    upairs7 = {(r[0], r[1]) for r in
               pycsv.reader(io.StringIO(U_CSV.decode()))
               if r[2].isdigit() and int(r[2]) >= 7}
    want = [int(r[2]) for r in TROWS
            if _t_ok(r) and (r[0], r[1]) in upairs7]
    assert fr["v"].tolist() == want


def test_exists_multikey_pandas_differential():
    rng = np.random.default_rng(3)
    n, m = 400, 300
    t = pd.DataFrame({"a": rng.integers(0, 8, n),
                      "b": rng.choice(list("pqrs"), n),
                      "v": np.arange(n)})
    u = pd.DataFrame({"a": rng.integers(0, 8, m),
                      "b": rng.choice(list("pqrs"), m),
                      "w": rng.integers(0, 100, m)})
    tcsv = t.to_csv(index=False).encode()
    ucsv = u.to_csv(index=False).encode()
    fr = sql("SELECT v FROM t WHERE EXISTS (SELECT a FROM u WHERE "
             "u.a = t.a AND u.b = t.b AND w > 50)",
             tables={"t": tcsv, "u": ucsv},
             schema={"a": "int32", "v": "int32"})
    pairs = set(map(tuple, u[u.w > 50][["a", "b"]].itertuples(
        index=False, name=None)))
    want = t[[(r.a, r.b) in pairs for r in t.itertuples()]]["v"]
    assert fr["v"].tolist() == want.tolist()


def test_exists_multikey_combined_with_outer_where():
    fr = sql("SELECT v FROM t WHERE v < 60 AND EXISTS (SELECT a FROM "
             "u WHERE u.a = t.a AND u.b = t.b)", tables=TBL, schema=S)
    want = [int(r[2]) for r in TROWS
            if _t_ok(r) and int(r[2]) < 60 and (r[0], r[1]) in UPAIRS]
    assert fr["v"].tolist() == want


def test_inequality_correlation_now_executes():
    """Round 5: equality + inequality correlation runs via the theta
    semi-join (brute-force oracle; deeper differentials live in
    tests/test_sql_exists_theta.py)."""
    fr = sql("SELECT v FROM t WHERE EXISTS (SELECT a FROM u WHERE "
             "u.a = t.a AND u.w > t.v)", tables=TBL, schema=S)
    want = []
    urows = [r for r in pycsv.reader(io.StringIO(U_CSV.decode()))][1:]
    for r in TROWS:
        if not _t_ok(r):
            continue
        if any(u[0].lstrip("-").isdigit()
               and int(u[0]) == int(r[0])
               and u[2].lstrip("-").isdigit()
               and int(u[2]) > int(r[2]) for u in urows):
            want.append(int(r[2]))
    assert [int(v) for v in fr["v"]] == want


def test_multikey_over_derived_frame():
    """The in_rows leaf must also compile on the host frame path
    (derived table outer, aliased — correlation against the alias;
    correlation against a non-aliased derived table was never
    supported, single-key included)."""
    fr = sql("SELECT v FROM (SELECT a, b, v FROM t WHERE v > 5) AS d "
             "WHERE EXISTS (SELECT a FROM u WHERE u.a = d.a AND "
             "u.b = d.b)", tables=TBL, schema=S)
    want = [int(r[2]) for r in TROWS
            if _t_ok(r) and int(r[2]) > 5 and (r[0], r[1]) in UPAIRS]
    assert fr["v"].tolist() == want


def test_rows_in_mask_fast_vs_fallback_property():
    """The vectorized shared-code membership must equal the tuple-set
    scan on randomized inputs (mixed dtypes per column, NULLs,
    duplicate tuples, empty lists)."""
    from csv_simd_tpu.query import _norm_row_key, rows_in_mask

    rng = np.random.default_rng(17)
    for trial in range(20):
        n = int(rng.integers(1, 200))
        k = int(rng.integers(1, 4))
        cols, oks = [], []
        for j in range(k):
            kind = rng.integers(0, 3)
            if kind == 0:
                cols.append(rng.integers(-5, 5, n).astype(np.int32))
            elif kind == 1:
                cols.append((rng.integers(-8, 8, n) / 2.0))
            else:
                cols.append(np.array(
                    [f"s{int(x)}" for x in rng.integers(0, 6, n)],
                    object))
            oks.append(None if rng.random() < 0.5
                       else rng.random(n) > 0.2)
        n_lit = int(rng.integers(0, 10))
        lits = []
        for _ in range(n_lit):
            t = []
            for j in range(k):
                i = int(rng.integers(0, n))
                t.append(_norm_row_key(cols[j][i]))
            lits.append(tuple(t))
        got = rows_in_mask(cols, oks, lits)
        # oracle: plain tuple-set scan
        lset = {tuple(_norm_row_key(x) for x in t) for t in lits}
        ok_all = np.ones(n, bool)
        for o in oks:
            if o is not None:
                ok_all &= o
        want = np.array(
            [ok_all[i] and tuple(
                _norm_row_key(c[i]) for c in cols) in lset
             for i in range(n)], bool)
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_multikey_exists_in_case_condition():
    """Regression (round-4 review finding): the in_rows leaf inside a
    CASE WHEN crashed _item_input_cols (tuple key has no .columns)."""
    fr = sql("SELECT CASE WHEN EXISTS (SELECT a FROM u WHERE "
             "u.a = t.a AND u.b = t.b) THEN v ELSE 0 END AS x FROM t",
             tables=TBL, schema=S)
    want = [int(r[2]) if _t_ok(r) and (r[0], r[1]) in UPAIRS else 0
            for r in TROWS]
    assert [int(v) for v in fr["x"]] == want


def test_multikey_exists_over_corpus(tmp_path):
    """The in_rows leaf compiles per file over a CsvCorpus outer
    (corpus spec-locking handles the composite key tuple)."""
    from csv_simd_tpu.corpus_api import CsvCorpus

    p1, p2 = tmp_path / "a.csv", tmp_path / "b.csv"
    p1.write_bytes(b"a,b,v\n1,x,10\n2,y,20\n")
    p2.write_bytes(b"a,b,v\n1,y,30\n3,z,40\n")
    c = CsvCorpus([str(p1), str(p2)])
    r = sql("SELECT v FROM t WHERE EXISTS (SELECT a FROM u WHERE "
            "u.a = t.a AND u.b = t.b)",
            tables={"t": c, "u": b"a,b\n1,x\n3,z\n"},
            schema={"a": "int32", "v": "int32"})
    assert r["v"].tolist() == [10, 40]
