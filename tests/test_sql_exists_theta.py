"""Correlated EXISTS beyond equality (VERDICT r4 item 8): inequality
conjuncts and OR-nested correlation rewrite to a precomputed theta
semi-join over distinct outer key tuples; non-rewritable shapes keep
crisp errors. Every query is differentially checked against pandas."""

import io

import numpy as np
import pandas as pd
import pytest

from csv_simd_tpu.sql import SqlError, sql


def _mk(seed=7, nt=80, nu=60):
    rng = np.random.default_rng(seed)
    t = ["k,x"]
    for i in range(nt):
        x = "bad!" if i % 17 == 0 else str(rng.integers(-20, 20))
        t.append(f"{rng.integers(0, 6)},{x}")
    u = ["k,y"]
    for i in range(nu):
        # empty field = parse failure = NULL (keeps int32 inference)
        y = "" if i % 13 == 0 else str(rng.integers(-20, 20))
        u.append(f"{rng.integers(0, 6)},{y}")
    return "\n".join(t).encode() + b"\n", "\n".join(u).encode() + b"\n"


T_CSV, U_CSV = _mk()
TBL = {"t": T_CSV, "u": U_CSV}
SCH = {"k": "int32", "x": "int32"}


def _pd(csv, **na):
    df = pd.read_csv(io.BytesIO(csv))
    for c in df.columns:
        df[c] = pd.to_numeric(df[c], errors="coerce")
    return df


TDF, UDF = _pd(T_CSV), _pd(U_CSV)


def _expect(pred):
    """Outer t rows (as k-lists) where EXISTS u row satisfying pred."""
    out = []
    for _, tr in TDF.iterrows():
        hit = False
        for _, ur in UDF.iterrows():
            if pred(tr, ur):
                hit = True
                break
        out.append(hit)
    return [int(k) for k, h in zip(TDF["k"], out) if h]


def _got(q):
    fr = sql(q, tables=TBL, schema=SCH)
    return [int(v) for v in fr["k"]]


def _notnull(*vals):
    return all(v == v and v is not None for v in vals)


def test_exists_inequality_only():
    got = _got("SELECT k FROM t WHERE EXISTS "
               "(SELECT k FROM u WHERE u.y < t.x)")
    want = _expect(lambda tr, ur: _notnull(ur.y, tr.x) and ur.y < tr.x)
    assert got == want


def test_exists_equality_plus_inequality():
    got = _got("SELECT k FROM t WHERE EXISTS "
               "(SELECT k FROM u WHERE u.k = t.k AND u.y >= t.x)")
    want = _expect(lambda tr, ur: _notnull(ur.k, tr.k, ur.y, tr.x)
                   and ur.k == tr.k and ur.y >= tr.x)
    assert got == want


def test_exists_or_nested_correlation():
    got = _got("SELECT k FROM t WHERE EXISTS "
               "(SELECT k FROM u WHERE u.k = t.k OR u.y > t.x)")
    want = _expect(lambda tr, ur:
                   (_notnull(ur.k, tr.k) and ur.k == tr.k)
                   or (_notnull(ur.y, tr.x) and ur.y > tr.x))
    assert got == want


def test_exists_or_with_literal_arm():
    got = _got("SELECT k FROM t WHERE EXISTS "
               "(SELECT k FROM u WHERE u.y < t.x OR u.y = 8)")
    want = _expect(lambda tr, ur:
                   (_notnull(ur.y, tr.x) and ur.y < tr.x)
                   or (_notnull(ur.y) and ur.y == 8))
    assert got == want


def test_exists_pushdown_plus_inequality():
    """The non-correlated conjunct filters the inner table first."""
    got = _got("SELECT k FROM t WHERE EXISTS "
               "(SELECT k FROM u WHERE u.y > 0 AND u.y < t.x)")
    want = _expect(lambda tr, ur: _notnull(ur.y, tr.x)
                   and ur.y > 0 and ur.y < tr.x)
    assert got == want


def test_not_exists_inequality():
    """NOT EXISTS complements per OUTER ROW (NULL t.x rows have no
    witness, so they satisfy NOT EXISTS — SQL agrees: the comparison
    is UNKNOWN for every inner row)."""
    got = _got("SELECT k FROM t WHERE NOT EXISTS "
               "(SELECT k FROM u WHERE u.y < t.x)")
    want = []
    for _, tr in TDF.iterrows():
        hit = any(_notnull(ur.y, tr.x) and ur.y < tr.x
                  for _, ur in UDF.iterrows())
        if not hit:
            want.append(int(tr.k))
    assert got == want


def test_exists_multi_inequality_conjuncts():
    got = _got("SELECT k FROM t WHERE EXISTS "
               "(SELECT k FROM u WHERE u.y < t.x AND u.k != t.k)")
    want = _expect(lambda tr, ur: _notnull(ur.y, tr.x, ur.k, tr.k)
                   and ur.y < tr.x and ur.k != tr.k)
    assert got == want


# ------------------------------------------------------ crisp errors

def test_exists_like_correlated_raises():
    with pytest.raises(SqlError, match="rewrite as a JOIN"):
        sql("SELECT k FROM t WHERE EXISTS "
            "(SELECT k FROM u WHERE u.y < t.x AND u.y LIKE '1%')"
            .replace("u.y LIKE", "u.y < t.x OR u.y LIKE"),
            tables=TBL, schema=SCH)


def test_exists_arithmetic_correlated_raises():
    with pytest.raises(SqlError, match="arithmetic"):
        sql("SELECT k FROM t WHERE EXISTS "
            "(SELECT k FROM u WHERE u.y * 2 < t.x)",
            tables=TBL, schema=SCH)


def test_exists_correlated_limit_still_raises():
    with pytest.raises(SqlError, match="LIMIT"):
        sql("SELECT k FROM t WHERE EXISTS "
            "(SELECT k FROM u WHERE u.y < t.x LIMIT 1)",
            tables=TBL, schema=SCH)
