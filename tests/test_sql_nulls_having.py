"""ORDER BY ... NULLS FIRST and HAVING alias references (VERDICT r4
item 6).

The layer's default stays NULLs LAST in both directions; an explicit
NULLS FIRST flips only the placement of the NULL block (parse-failure
rows), never the key order. Covered on every sort path: the device
int sort (query._order_device), the host value sort
(query._host_order_perm), the window executors (device + host, via
window.factorize_key), and the group-result sort
(sql._order_group_rows). HAVING resolves SELECT aliases of aggregates
the way ORDER BY already resolves aliases.
"""

import numpy as np
import pytest

import csv_simd_tpu.window as W
from csv_simd_tpu.sql import SqlError, sql


def _mk_csv(n=200, seed=11):
    rng = np.random.default_rng(seed)
    grp = rng.choice([b"aa", b"bb", b"cc"], n)
    qty = rng.integers(-50, 50, n)
    rows = []
    for i in range(n):
        q = b"oops" if i % 7 == 0 else str(qty[i]).encode()
        f = b"bad" if i % 11 == 0 else repr(float(qty[i]) / 2).encode()
        rows.append(b"%s,%s,%s,t%03d" % (grp[i], q, f, i))
    return b"grp,qty,fv,tag\n" + b"\n".join(rows) + b"\n"


CSV = _mk_csv()
S = {"qty": "int32", "fv": "float"}
N_NULL = sum(1 for i in range(200) if i % 7 == 0)


def _col(fr, name):
    out = []
    okm = fr._ok.get(name) if hasattr(fr, "_ok") else None
    for i, v in enumerate(fr[name]):
        if okm is not None and not okm[i]:
            out.append(None)
        elif v is None or (isinstance(v, float) and v != v):
            out.append(None)
        else:
            out.append(v.decode() if isinstance(v, bytes) else
                       (float(v) if isinstance(v, float) else int(v))
                       if not isinstance(v, str) else v)
    return out


# ---------------------------------------------------------- ORDER BY

@pytest.mark.parametrize("desc", [False, True])
def test_order_by_nulls_first_int(desc):
    d = "DESC" if desc else "ASC"
    fr = sql(f"SELECT qty FROM t ORDER BY qty {d} NULLS FIRST",
             CSV, schema=S)
    got = _col(fr, "qty")
    # the NULL block leads, then keys in the requested direction
    assert got[:N_NULL] == [None] * N_NULL
    real = got[N_NULL:]
    assert None not in real
    assert real == sorted(real, reverse=desc)


@pytest.mark.parametrize("desc", [False, True])
def test_order_by_nulls_last_unchanged(desc):
    d = "DESC" if desc else "ASC"
    deflt = sql(f"SELECT qty FROM t ORDER BY qty {d}", CSV, schema=S)
    expl = sql(f"SELECT qty FROM t ORDER BY qty {d} NULLS LAST",
               CSV, schema=S)
    assert _col(deflt, "qty") == _col(expl, "qty")
    assert _col(deflt, "qty")[-N_NULL:] == [None] * N_NULL


def test_order_by_nulls_first_float_host_key():
    fr = sql("SELECT fv FROM t ORDER BY fv NULLS FIRST", CSV, schema=S)
    got = _col(fr, "fv")
    k = got.count(None)
    assert k == sum(1 for i in range(200) if i % 11 == 0)
    assert got[:k] == [None] * k
    assert got[k:] == sorted(got[k:])


def test_order_by_mixed_nulls_multi_key():
    """grp ASC (nulls-free), qty DESC NULLS FIRST within each group."""
    fr = sql("SELECT grp, qty FROM t "
             "ORDER BY grp ASC, qty DESC NULLS FIRST", CSV, schema=S)
    grps = _col(fr, "grp")
    qtys = _col(fr, "qty")
    assert grps == sorted(grps)
    import itertools
    pos = 0
    for _g, block in itertools.groupby(qtys_by := list(zip(grps, qtys)),
                                       key=lambda p: p[0]):
        vals = [q for _, q in block]
        k = vals.count(None)
        assert vals[:k] == [None] * k, f"NULLs not first at {pos}"
        real = vals[k:]
        assert real == sorted(real, reverse=True)
        pos += len(vals)


def test_order_by_nulls_first_stability():
    """NULL rows keep input order among themselves (stable sort)."""
    fr = sql("SELECT tag, qty FROM t ORDER BY qty NULLS FIRST",
             CSV, schema=S)
    tags = _col(fr, "tag")[:N_NULL]
    want = [f"t{i:03d}" for i in range(200) if i % 7 == 0]
    assert tags == want


# ----------------------------------------------------------- windows

WINDOW_QUERIES = [
    "SELECT tag, RANK() OVER (ORDER BY qty DESC NULLS FIRST) AS r"
    " FROM t",
    "SELECT tag, ROW_NUMBER() OVER (PARTITION BY grp"
    " ORDER BY qty NULLS FIRST) AS r FROM t",
    "SELECT tag, SUM(qty) OVER (PARTITION BY grp"
    " ORDER BY qty DESC NULLS FIRST) AS s FROM t",
]


@pytest.mark.parametrize("q", WINDOW_QUERIES)
def test_window_nulls_first_device_matches_host(q, monkeypatch):
    calls = {"n": 0}
    real = W.window_column

    def spy(*a, **k):
        r = real(*a, **k)
        if r is not None:
            calls["n"] += 1
        return r

    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 1)
    monkeypatch.setattr(W, "window_column", spy)
    dev = sql(q, CSV, schema=S)
    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 10**9)
    host = sql(q, CSV, schema=S)
    assert calls["n"] >= 1, "device window path never ran"
    for name in dev.names:
        assert _col(dev, name) == _col(host, name), (q, name)


def test_window_rank_nulls_first_semantics(monkeypatch):
    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 1)
    fr = sql("SELECT qty, RANK() OVER (ORDER BY qty NULLS FIRST) AS r"
             " FROM t", CSV, schema=S)
    qty, r = _col(fr, "qty"), _col(fr, "r")
    # every NULL row ranks 1 (they are peers, leading the order)
    assert {rk for q, rk in zip(qty, r) if q is None} == {1}
    assert all(rk == N_NULL + 1 for q, rk in zip(qty, r)
               if q == min(v for v in qty if v is not None))


def test_window_cache_distinguishes_nulls_first(monkeypatch):
    """Two OVER clauses differing only in NULLS FIRST must not share
    the per-clause sort-prep cache."""
    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 1)
    fr = sql("SELECT qty,"
             " RANK() OVER (ORDER BY qty DESC) AS a,"
             " RANK() OVER (ORDER BY qty DESC NULLS FIRST) AS b"
             " FROM t", CSV, schema=S)
    qty, a, b = _col(fr, "qty"), _col(fr, "a"), _col(fr, "b")
    for q, x, y in zip(qty, a, b):
        if q is None:
            assert x == 201 - N_NULL and y == 1
        else:
            assert y == x + N_NULL


# ------------------------------------------------- group-result sort

def test_group_order_by_agg_nulls_first():
    """Groups whose aggregate is NULL (every value failed the parse)
    lead under NULLS FIRST."""
    csv = (b"g,v\n" + b"a,1\na,2\n" + b"b,oops\nb,oops\n" + b"c,5\n")
    fr = sql("SELECT g, SUM(v) AS s FROM t GROUP BY g "
             "ORDER BY s NULLS FIRST", csv, schema={"v": "int32"})
    assert _col(fr, "g") == ["b", "a", "c"]
    assert _col(fr, "s") == [None, 3, 5]
    fr2 = sql("SELECT g, SUM(v) AS s FROM t GROUP BY g "
              "ORDER BY s DESC NULLS FIRST", csv, schema={"v": "int32"})
    assert _col(fr2, "g") == ["b", "c", "a"]


# ------------------------------------------------------ HAVING alias

HCSV = b"sym,qty\nA,1\nA,2\nB,5\nB,6\nB,7\nC,9\n"


def test_having_count_alias():
    fr = sql("SELECT sym, COUNT(*) AS c FROM t GROUP BY sym "
             "HAVING c >= 2 ORDER BY sym", HCSV,
             schema={"qty": "int32"})
    assert _col(fr, "sym") == ["A", "B"]
    assert _col(fr, "c") == [2, 3]


def test_having_sum_alias():
    fr = sql("SELECT sym, SUM(qty) AS s FROM t GROUP BY sym "
             "HAVING s > 5 ORDER BY sym", HCSV, schema={"qty": "int32"})
    assert _col(fr, "sym") == ["B", "C"]
    assert _col(fr, "s") == [18, 9]


def test_having_alias_matches_inline():
    a = sql("SELECT sym, COUNT(*) AS c FROM t GROUP BY sym "
            "HAVING c >= 2 ORDER BY sym", HCSV)
    b = sql("SELECT sym, COUNT(*) AS c FROM t GROUP BY sym "
            "HAVING COUNT(*) >= 2 ORDER BY sym", HCSV)
    assert _col(a, "sym") == _col(b, "sym")
    assert _col(a, "c") == _col(b, "c")


def test_having_expr_agg_alias():
    fr = sql("SELECT sym, SUM(qty * qty) AS ss FROM t GROUP BY sym "
             "HAVING ss > 10 ORDER BY sym", HCSV,
             schema={"qty": "int32"})
    assert _col(fr, "sym") == ["B", "C"]


def test_having_alias_of_non_agg_raises():
    with pytest.raises(SqlError, match="aggregate"):
        sql("SELECT sym AS s2, COUNT(*) AS c FROM t GROUP BY sym "
            "HAVING s2 >= 2", HCSV)


def test_having_unknown_name_raises():
    with pytest.raises(SqlError, match="aggregate"):
        sql("SELECT sym, COUNT(*) AS c FROM t GROUP BY sym "
            "HAVING nosuch >= 2", HCSV)


# ------------------------------------------------- ordinal references

ORD_CSV = b"sym,qty\nB,5\nA,1\nC,9\nA,3\n"


def test_order_by_ordinal():
    r = sql("SELECT sym, qty FROM t ORDER BY 1", ORD_CSV,
            schema={"qty": "int32"})
    assert [str(v) for v in r["sym"]] == ["A", "A", "B", "C"]
    r2 = sql("SELECT sym, qty FROM t ORDER BY 2 DESC, 1", ORD_CSV,
             schema={"qty": "int32"})
    assert [int(v) for v in r2["qty"]] == [9, 5, 3, 1]


def test_group_by_ordinal():
    r = sql("SELECT sym, SUM(qty) AS s FROM t GROUP BY 1 "
            "ORDER BY 2 DESC", ORD_CSV, schema={"qty": "int32"})
    assert [str(v) for v in r["sym"]] == ["C", "B", "A"]
    assert [int(v) for v in r["s"]] == [9, 5, 4]


def test_ordinal_out_of_range_raises():
    with pytest.raises(SqlError, match="out of range"):
        sql("SELECT sym FROM t ORDER BY 5", ORD_CSV)
    with pytest.raises(SqlError, match="refers to"):
        sql("SELECT * FROM t GROUP BY 1", ORD_CSV)
