"""Property test: the SQL where-grammar round-trips onto the predicate
tree grammar — rendering a random tree to SQL text and executing it
selects exactly the rows the tree selects directly."""

import hypothesis.strategies as st
import numpy as np
from hypothesis import HealthCheck, given, settings

from csv_simd_tpu.frame import _resolve_tape
from csv_simd_tpu.query import TextFold, VExpr, select_records
from csv_simd_tpu.sql import sql

CSV = (b"sym,qty\n" + b"".join(
    f"{s},{q}\n".encode()
    for i, (s, q) in enumerate(
        (("AAPL", "MSFT", "GOOG", "AA PL")[i % 4],
         ((-1) ** i) * ((i * 13) % 50)) for i in range(60)
    )
))

SYMS = ("AAPL", "MSFT", "GOOG", "AA PL", "NOPE")

_leaf = st.one_of(
    st.tuples(st.just("qty"),
              st.sampled_from(["==", "!=", "<", "<=", ">", ">="]),
              st.integers(-60, 60)),
    st.tuples(st.just("sym"), st.just("=="), st.sampled_from(SYMS)),
    st.builds(lambda a, b: ("qty", "between", (min(a, b), max(a, b))),
              st.integers(-60, 60), st.integers(-60, 60)),
    st.builds(lambda vs: ("qty", "in", vs),
              st.lists(st.integers(-60, 60), min_size=1, max_size=3)),
    # LIKE patterns: optional %-anchors around a core drawn from the
    # fixture's alphabet plus `_` wildcards and mid-pattern `%` runs
    st.builds(
        lambda lead, core, trail:
            ("sym", "like", ("%" if lead else "") + core
             + ("%" if trail else "")),
        st.booleans(),
        st.text(alphabet="APLMSTGO_% ,", max_size=6),
        st.booleans(),
    ),
    # case-folded text predicates: UPPER/LOWER(sym) vs mixed-case
    # literals and LIKE patterns (mixed-case alphabet exercises the
    # device fold against the host-folded literal)
    st.builds(
        lambda fn, v: (TextFold(fn, "sym"), "==", v),
        st.sampled_from(["upper", "lower"]),
        st.text(alphabet="AaPpLlMmSsTtGgOo ", max_size=5),
    ),
    st.builds(
        lambda fn, lead, core, trail:
            (TextFold(fn, "sym"), "like",
             ("%" if lead else "") + core + ("%" if trail else "")),
        st.sampled_from(["upper", "lower"]),
        st.booleans(),
        st.text(alphabet="AaPpLlGgOo_% ", max_size=5),
        st.booleans(),
    ),
    # LENGTH(sym) arithmetic comparisons (decoded byte length)
    st.builds(
        lambda op, n: (VExpr(("len", "sym")), op, n),
        st.sampled_from(["==", "!=", "<", "<=", ">", ">="]),
        st.integers(0, 8),
    ),
)

_tree = st.recursive(
    _leaf,
    lambda children: st.one_of(
        st.builds(lambda es: ("and", es),
                  st.lists(children, min_size=1, max_size=3)),
        st.builds(lambda es: ("or", es),
                  st.lists(children, min_size=1, max_size=3)),
        st.builds(lambda e: ("not", e), children),
    ),
    max_leaves=6,
)


def _render(expr) -> str:
    if isinstance(expr, tuple) and len(expr) == 3 \
            and isinstance(expr[1], str):
        col, op, v = expr
        if isinstance(col, TextFold):
            key = f"{col.fn.upper()}({col.col})"
            if op == "like":
                return f"{key} LIKE '{v}'"
            sql_op = {"==": "=", "!=": "<>"}[op]
            return f"{key} {sql_op} '{v}'"
        if isinstance(col, VExpr):  # ("len", "sym") leaf
            sql_op = {"==": "=", "!=": "<>"}.get(op, op)
            return f"LENGTH({col.tree[1]}) {sql_op} {v}"
        if op == "between":
            return f"{col} BETWEEN {v[0]} AND {v[1]}"
        if op == "in":
            return f"{col} IN ({', '.join(str(x) for x in v)})"
        if op == "like":
            return f"{col} LIKE '{v}'"
        lit = f"'{v}'" if isinstance(v, str) else str(v)
        sql_op = {"==": "=", "!=": "<>"}.get(op, op)
        return f"{col} {sql_op} {lit}"
    if expr[0] in ("and", "or"):
        glue = f" {expr[0].upper()} "
        return "(" + glue.join(_render(e) for e in expr[1]) + ")"
    return f"NOT ({_render(expr[1])})"


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_tree)
def test_where_tree_roundtrip(tree):
    tape, names = _resolve_tape(CSV, None, "auto", "offsets", False)
    want = select_records(tape, tree, names=names,
                          schema={"qty": "int32"}).tolist()
    fr = sql(f"SELECT sym FROM t WHERE {_render(tree)}", CSV,
             schema={"qty": "int32", "sym": "str"})
    assert fr.records.tolist() == want


# ---------------------------------------------------- window property


_wfn = st.sampled_from(["sum", "count", "min", "max", "avg",
                        "row_number", "rank", "dense_rank"])


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.tuples(st.sampled_from("abc"), st.integers(0, 6)),
             min_size=1, max_size=25),
    _wfn,
    st.booleans(),   # ORDER BY in OVER?
    st.booleans(),   # DESC?
)
def test_window_differential(rows, fn, ordered, desc):
    if fn in ("rank", "dense_rank") and not ordered:
        ordered = True
    csv = b"g,v\n" + b"".join(f"{g},{v}\n".encode() for g, v in rows)
    call = {"sum": "SUM(v)", "count": "COUNT(v)", "min": "MIN(v)",
            "max": "MAX(v)", "avg": "AVG(v)",
            "row_number": "ROW_NUMBER()", "rank": "RANK()",
            "dense_rank": "DENSE_RANK()"}[fn]
    over = "PARTITION BY g"
    if ordered:
        over += " ORDER BY v" + (" DESC" if desc else "")
    fr = sql(f"SELECT {call} OVER ({over}) AS w FROM t", csv,
             schema={"v": "int32"})

    # oracle: stable order by (g asc[, v asc/desc when ordered])
    n = len(rows)
    perm = list(range(n))
    if ordered:
        perm.sort(key=lambda i: rows[i][1] if not desc
                  else -rows[i][1])
    perm.sort(key=lambda i: rows[i][0])
    want = [None] * n
    by_g = {}
    for i in perm:
        by_g.setdefault(rows[i][0], []).append(i)
    for g, idxs in by_g.items():
        # peer groups by order key (whole partition when unordered)
        groups, cur = [], []
        for i in idxs:
            if cur and (not ordered
                        or rows[i][1] == rows[cur[0]][1]):
                cur.append(i)
            else:
                if cur:
                    groups.append(cur)
                cur = [i]
        groups.append(cur)
        if not ordered:
            groups = [idxs]
        if fn == "row_number":
            for k, i in enumerate(idxs):
                want[i] = k + 1
            continue
        if fn in ("rank", "dense_rank"):
            seen = 0
            for gi, grp in enumerate(groups):
                r = gi + 1 if fn == "dense_rank" else seen + 1
                for i in grp:
                    want[i] = r
                seen += len(grp)
            continue
        acc = []
        for grp in groups:
            acc.extend(rows[i][1] for i in grp)
            val = {"sum": sum(acc), "count": len(acc),
                   "min": min(acc), "max": max(acc),
                   "avg": sum(acc) / len(acc)}[fn]
            for i in grp:
                want[i] = val
    got = fr["w"].tolist()
    if fn == "avg":
        assert got == [float(w) for w in want] or \
            np.allclose(got, want)
    else:
        assert [int(v) for v in got] == want


# ------------------------------------------------- set-op property


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.sampled_from(["AA", "BB", "CC", "DD"]),
             min_size=1, max_size=10),
    st.lists(st.sampled_from(["AA", "BB", "CC", "DD"]),
             min_size=1, max_size=10),
    st.sampled_from(["UNION", "UNION ALL", "EXCEPT", "INTERSECT"]),
)
def test_setop_differential(a, b, op):
    ta = b"sym\n" + "".join(f"{v}\n" for v in a).encode()
    tb = b"sym\n" + "".join(f"{v}\n" for v in b).encode()
    fr = sql(f"SELECT sym FROM x {op} SELECT sym FROM y",
             tables={"x": ta, "y": tb})
    got = [str(v) for v in fr["sym"]]
    if op == "UNION ALL":
        want = a + b
    elif op == "UNION":
        want = list(dict.fromkeys(a + b))
    elif op == "EXCEPT":
        want = [v for v in dict.fromkeys(a) if v not in set(b)]
    else:
        want = [v for v in dict.fromkeys(a) if v in set(b)]
    assert got == want


# ------------------------------------------- ROWS-frame property


_bound = st.one_of(st.none(), st.integers(-3, 3))  # None = unbounded


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.tuples(st.sampled_from("ab"),
                       st.one_of(st.none(), st.integers(-9, 9))),
             min_size=1, max_size=18),
    st.sampled_from(["sum", "count", "min", "max", "avg"]),
    _bound,  # lo offset (None = UNBOUNDED PRECEDING)
    _bound,  # hi offset (None = UNBOUNDED FOLLOWING)
    st.booleans(),  # force device path too?
)
def test_rows_frame_differential(rows, fn, lo, hi, force_device):
    import csv_simd_tpu.window as W

    if lo is not None and hi is not None and lo > hi:
        lo, hi = hi, lo
    def b(v, end):
        if v is None:
            return ("UNBOUNDED PRECEDING" if not end
                    else "UNBOUNDED FOLLOWING")
        if v == 0:
            return "CURRENT ROW"
        return (f"{-v} PRECEDING" if v < 0 else f"{v} FOLLOWING")
    frame = f"ROWS BETWEEN {b(lo, False)} AND {b(hi, True)}"
    csv = b"g,o,v\n" + b"".join(
        ("%s,%d,%s\n" % (g, i, "x" if v is None else v)).encode()
        for i, (g, v) in enumerate(rows))
    call = {"sum": "SUM(v)", "count": "COUNT(v)", "min": "MIN(v)",
            "max": "MAX(v)", "avg": "AVG(v)"}[fn]
    q = (f"SELECT {call} OVER (PARTITION BY g ORDER BY o {frame})"
         " AS w FROM t")
    sch = {"o": "int32", "v": "int32"}
    old = W.DEVICE_WINDOW_MIN_ROWS
    try:
        W.DEVICE_WINDOW_MIN_ROWS = 1 if force_device else 10**9
        fr = sql(q, csv, schema=sch)
    finally:
        W.DEVICE_WINDOW_MIN_ROWS = old

    # brute-force oracle (rows are already in (g asc, o asc) window
    # order because o is the input index and the sort is stable)
    n = len(rows)
    want = [None] * n
    parts = {}
    for i, (g, _v) in enumerate(rows):
        parts.setdefault(g, []).append(i)
    for idxs in parts.values():
        L = len(idxs)
        for p, i in enumerate(idxs):
            a = 0 if lo is None else max(0, p + lo)
            z = L - 1 if hi is None else min(L - 1, p + hi)
            sel = [rows[idxs[p2]][1] for p2 in range(a, z + 1)
                   if a <= z and rows[idxs[p2]][1] is not None]
            if fn == "count":
                want[i] = len(sel)
            elif not sel:
                want[i] = None
            else:
                want[i] = {"sum": sum(sel), "min": min(sel),
                           "max": max(sel),
                           "avg": sum(sel) / len(sel)}[fn]
    got = []
    okm = fr._ok.get("w")
    for i, v in enumerate(fr["w"]):
        if (okm is not None and not okm[i]) or v is None or (
                isinstance(v, float) and v != v):
            got.append(None)
        elif fn == "avg":
            got.append(float(v))
        else:
            got.append(int(v))
    if fn == "avg":
        assert all(
            (a is None) == (b_ is None)
            and (a is None or abs(a - b_) < 1e-9)
            for a, b_ in zip(got, want)), (got, want, frame)
    else:
        assert got == want, (got, want, frame)


# --------------------------------------- frame-position fn property


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.tuples(st.sampled_from("ab"),
                       st.one_of(st.none(), st.integers(-9, 9))),
             min_size=1, max_size=15),
    st.sampled_from(["first_value", "last_value", "nth_value",
                     "ntile"]),
    st.integers(1, 4),   # NTH position / NTILE buckets
    st.booleans(),       # force device path?
)
def test_value_fns_differential(rows, fn, arg, force_device):
    import csv_simd_tpu.window as W

    csv = b"g,o,v\n" + b"".join(
        ("%s,%d,%s\n" % (g, i, "x" if v is None else v)).encode()
        for i, (g, v) in enumerate(rows))
    call = {"first_value": "FIRST_VALUE(v)",
            "last_value": "LAST_VALUE(v)",
            "nth_value": f"NTH_VALUE(v, {arg})",
            "ntile": f"NTILE({arg})"}[fn]
    q = f"SELECT {call} OVER (PARTITION BY g ORDER BY o) AS w FROM t"
    sch = {"o": "int32", "v": "int32"}
    old = W.DEVICE_WINDOW_MIN_ROWS
    try:
        W.DEVICE_WINDOW_MIN_ROWS = 1 if force_device else 10**9
        fr = sql(q, csv, schema=sch)
    finally:
        W.DEVICE_WINDOW_MIN_ROWS = old

    n = len(rows)
    want = [None] * n
    parts = {}
    for i, (g, _v) in enumerate(rows):
        parts.setdefault(g, []).append(i)
    for idxs in parts.values():
        L = len(idxs)
        if fn == "ntile":
            small, rem = L // arg, L % arg
            cut = rem * (small + 1)
            for p, i in enumerate(idxs):
                want[i] = (p // (small + 1) + 1 if p < cut
                           else rem + (p - cut) // max(small, 1) + 1)
            continue
        # default frame: partition start .. current PEER end; o is the
        # row index so every peer group is a single row -> end = p
        for p, i in enumerate(idxs):
            if fn == "first_value":
                pos = 0
            elif fn == "last_value":
                pos = p
            else:
                pos = arg - 1
                if pos > p:
                    want[i] = None
                    continue
            want[i] = rows[idxs[pos]][1]  # may be None (no NULL skip)
    got = []
    okm = fr._ok.get("w")
    for i, v in enumerate(fr["w"]):
        if (okm is not None and not okm[i]) or v is None or (
                isinstance(v, float) and v != v):
            got.append(None)
        else:
            got.append(int(v))
    assert got == want, (got, want, q)
