"""SQL text functions: UPPER()/LOWER() case-folded predicates and
LENGTH() expressions — device path, joined-frame host twin, corpus,
differential against Python oracles.

The fold is ASCII-only (A-Z/a-z), matching SQL engines' C collation;
LENGTH() is the DECODED byte length (stage-2 semantics)."""

import csv as pycsv
import io

import numpy as np
import pytest

from csv_simd_tpu.query import TextFold, VExpr, select_records
from csv_simd_tpu.sql import SqlError, sql


CSV = (b"name,city,qty\n"
       b"Alice,NYC,3\n"
       b"bob,paris,12\n"
       b"CAROL,NYC,7\n"
       b"dave,Nyc,1\n"
       b'"e,F",nyc,40\n'           # quoted comma + mixed case
       b"Frank,PARIS,2\n")

ROWS = list(pycsv.reader(io.StringIO(CSV.decode())))[1:]
S = {"qty": "int32"}


# ---------------------------------------------------------------- SQL


def test_upper_eq_and_ne():
    fr = sql("SELECT name FROM t WHERE UPPER(city) = 'NYC'", CSV)
    want = [r[0] for r in ROWS if r[1].upper() == "NYC"]
    assert [str(s) for s in fr["name"]] == want
    fr = sql("SELECT name FROM t WHERE UPPER(city) != 'NYC'", CSV)
    want = [r[0] for r in ROWS if r[1].upper() != "NYC"]
    assert [str(s) for s in fr["name"]] == want


def test_lower_like_and_in():
    fr = sql("SELECT name FROM t WHERE LOWER(name) LIKE 'c%'", CSV)
    want = [r[0] for r in ROWS if r[0].lower().startswith("c")]
    assert [str(s) for s in fr["name"]] == want
    fr = sql("SELECT name FROM t WHERE UPPER(name) IN ('BOB','DAVE')",
             CSV)
    want = [r[0] for r in ROWS if r[0].upper() in ("BOB", "DAVE")]
    assert [str(s) for s in fr["name"]] == want


def test_fold_like_full_wildcards():
    # multi-segment LIKE with _ and % under a fold
    fr = sql("SELECT name FROM t WHERE LOWER(city) LIKE '_y%'", CSV)
    want = [r[0] for r in ROWS
            if len(r[1]) >= 2 and r[1].lower()[1] == "y"]
    assert [str(s) for s in fr["name"]] == want
    fr = sql("SELECT name FROM t WHERE UPPER(city) LIKE '%AR%S'", CSV)
    import re
    rx = re.compile(".*AR.*S")
    want = [r[0] for r in ROWS if rx.fullmatch(r[1].upper())]
    assert [str(s) for s in fr["name"]] == want


def test_not_fold_predicate():
    fr = sql("SELECT name FROM t WHERE NOT UPPER(city) LIKE 'N%'", CSV)
    want = [r[0] for r in ROWS if not r[1].upper().startswith("N")]
    assert [str(s) for s in fr["name"]] == want
    fr = sql("SELECT name FROM t WHERE UPPER(name) NOT IN "
             "('ALICE','BOB')", CSV)
    want = [r[0] for r in ROWS if r[0].upper() not in ("ALICE", "BOB")]
    assert [str(s) for s in fr["name"]] == want


def test_fold_is_ascii_only():
    csv = "name\nétude\nÉTUDE\nplain\n".encode()
    # str.upper would fold é->É; the ASCII fold must NOT
    fr = sql("SELECT name FROM t WHERE UPPER(name) = 'ÉTUDE'", csv)
    assert [str(s) for s in fr["name"]] == ["ÉTUDE"]
    fr = sql("SELECT name FROM t WHERE LOWER(name) = 'étude'", csv)
    assert [str(s) for s in fr["name"]] == ["étude"]


def test_length_select_where_aggregate():
    fr = sql("SELECT name, LENGTH(name) FROM t WHERE LENGTH(name) > 3",
             CSV)
    want = [r for r in ROWS if len(r[0].encode()) > 3]
    assert [str(s) for s in fr["name"]] == [r[0] for r in want]
    assert list(fr[fr.names[1]]) == [len(r[0].encode()) for r in want]
    res = sql("SELECT SUM(LENGTH(name)) FROM t", CSV)
    total = sum(len(r[0].encode()) for r in ROWS)
    assert res[res.names[0]][0] == total


def test_length_decoded_semantics():
    # LENGTH is the decoded (unquoted) byte length: "e,F" has length 3
    fr = sql("SELECT LENGTH(name) FROM t WHERE name = 'e,F'", CSV)
    assert list(fr[fr.names[0]]) == [3]


def test_length_arithmetic_and_char_length_alias():
    fr = sql("SELECT name FROM t WHERE LENGTH(name) + qty > 10", CSV,
             schema=S)
    def _q(r):
        try:
            return int(r[2])
        except ValueError:
            return None
    want = [r[0] for r in ROWS
            if _q(r) is not None and len(r[0].encode()) + _q(r) > 10]
    assert [str(s) for s in fr["name"]] == want
    fr2 = sql("SELECT name FROM t WHERE CHAR_LENGTH(name) + qty > 10",
              CSV, schema=S)
    assert [str(s) for s in fr2["name"]] == want


def test_length_on_numeric_column_rejected():
    with pytest.raises((SqlError, ValueError), match="LENGTH"):
        sql("SELECT LENGTH(qty) FROM t", CSV, schema=S)


def test_fold_bad_ops_rejected():
    with pytest.raises((SqlError, ValueError)):
        sql("SELECT name FROM t WHERE UPPER(name) > 'A'", CSV)
    with pytest.raises((SqlError, ValueError)):
        sql("SELECT name FROM t WHERE UPPER(qty) = '3'", CSV, schema=S)


def test_qualified_fold_and_length_single_table():
    fr = sql("SELECT t.name FROM t WHERE UPPER(t.city) = 'NYC' AND "
             "LENGTH(t.name) >= 5", CSV)
    want = [r[0] for r in ROWS
            if r[1].upper() == "NYC" and len(r[0].encode()) >= 5]
    assert [str(s) for s in fr["name"]] == want


# ------------------------------------------------------------- joins

LEFT = (b"name,city\n"
        b"Alice,NYC\n"
        b"bob,paris\n"
        b"CAROL,NYC\n"
        b"dave,Nyc\n")
RIGHT = b"city,pop\nNYC,8\nparis,2\nNyc,0\n"

LROWS = list(pycsv.reader(io.StringIO(LEFT.decode())))[1:]
RMAP = {r[0]: int(r[1])
        for r in list(pycsv.reader(io.StringIO(RIGHT.decode())))[1:]}


def test_fold_over_join():
    t = {"a": LEFT, "b": RIGHT}
    fr = sql("SELECT a.name FROM a JOIN b ON a.city = b.city "
             "WHERE UPPER(a.name) LIKE '%O%'", tables=t)
    want = [r[0] for r in LROWS
            if r[1] in RMAP and "O" in r[0].upper()]
    assert [str(s) for s in fr[fr.names[0]]] == want
    fr = sql("SELECT a.name FROM a JOIN b ON a.city = b.city "
             "WHERE LOWER(a.city) IN ('nyc')", tables=t)
    want = [r[0] for r in LROWS
            if r[1] in RMAP and r[1].lower() == "nyc"]
    assert [str(s) for s in fr[fr.names[0]]] == want


def test_length_over_join():
    t = {"a": LEFT, "b": RIGHT}
    fr = sql("SELECT a.name FROM a JOIN b ON a.city = b.city "
             "WHERE LENGTH(a.name) + b.pop > 10", tables=t)
    want = [r[0] for r in LROWS
            if r[1] in RMAP and len(r[0].encode()) + RMAP[r[1]] > 10]
    assert [str(s) for s in fr[fr.names[0]]] == want


# ------------------------------------------------------------- corpus


def test_fold_and_length_on_corpus(tmp_path):
    from csv_simd_tpu.corpus_api import CsvCorpus

    parts = [b"name,n\nAl,1\nBOB,2\n", b"name,n\ncarol,3\nDee,4\n"]
    paths = []
    for i, blob in enumerate(parts):
        p = tmp_path / f"p{i}.csv"
        p.write_bytes(blob)
        paths.append(str(p))
    c = CsvCorpus(paths)
    fr = sql("SELECT name FROM t WHERE UPPER(name) LIKE '%O%'", c)
    assert [str(s) for s in fr["name"]] == ["BOB", "carol"]
    fr = sql("SELECT name FROM t WHERE LENGTH(name) = 3", c)
    assert [str(s) for s in fr["name"]] == ["BOB", "Dee"]


# --------------------------------------------------- query-layer API


def test_textfold_query_api():
    from csv_simd_tpu.frame import _resolve_tape

    lib, _names = _resolve_tape(CSV, None, "auto", "offsets", False)
    ids = select_records(lib, (TextFold("upper", "city"), "==", "NYC"))
    want = [i for i, r in enumerate(ROWS) if r[1].upper() == "NYC"]
    assert ids.tolist() == want
    ids = select_records(
        lib, (TextFold("lower", "name"), "startswith", "c"))
    want = [i for i, r in enumerate(ROWS)
            if r[0].lower().startswith("c")]
    assert ids.tolist() == want
    with pytest.raises(ValueError, match="upper/lower"):
        TextFold("title", "name")
    with pytest.raises(ValueError):
        select_records(lib, (TextFold("upper", "name"), ">", 3))


def test_length_vexpr_api():
    from csv_simd_tpu.frame import _resolve_tape

    lib, _names = _resolve_tape(CSV, None, "auto", "offsets", False)
    ids = select_records(lib, (VExpr(("len", "name")), ">", 3))
    want = [i for i, r in enumerate(ROWS) if len(r[0].encode()) > 3]
    assert ids.tolist() == want


# ------------------------------- projection folds + ORDER BY exprs


def test_select_fold_projection():
    fr = sql("SELECT UPPER(name) FROM t", CSV)
    assert fr.names == ["UPPER(name)"]
    assert [str(v) for v in fr[fr.names[0]]] == \
        [r[0].upper() for r in ROWS]
    fr = sql("SELECT LOWER(city) AS c, name FROM t", CSV)
    assert [str(v) for v in fr["c"]] == [r[1].lower() for r in ROWS]


def test_select_fold_is_ascii_only():
    csv = "name\nétude\nPLAIN\n".encode()
    fr = sql("SELECT UPPER(name) FROM t", csv)
    # é must NOT fold (str.upper would make it É)
    assert [str(v) for v in fr[fr.names[0]]] == ["éTUDE", "PLAIN"]


def test_select_fold_errors():
    with pytest.raises(SqlError, match="fold decoded text"):
        sql("SELECT UPPER(qty) FROM t", CSV, schema=S)
    with pytest.raises(SqlError, match="GROUP BY"):
        sql("SELECT name, UPPER(name) FROM t GROUP BY name", CSV)


def test_order_by_expression_direct():
    fr = sql("SELECT name FROM t ORDER BY LENGTH(name) DESC, name",
             CSV)
    want = sorted((r[0] for r in ROWS),
                  key=lambda s: (-len(s.encode()), s))
    assert [str(v) for v in fr["name"]] == want
    fr = sql("SELECT name FROM t ORDER BY qty * 2 DESC", CSV, schema=S)
    want = [r[0] for r in sorted(ROWS, key=lambda r: -int(r[2]))]
    assert [str(v) for v in fr["name"]] == want


def test_order_by_fold_direct():
    fr = sql("SELECT name FROM t ORDER BY UPPER(name)", CSV)
    want = sorted((r[0] for r in ROWS), key=lambda s: _up(s))
    assert [str(v) for v in fr["name"]] == want


def _up(s: str) -> str:
    return "".join(c.upper() if "a" <= c <= "z" else c for c in s)


def test_order_by_fold_mixed_with_device_key():
    # a device-sortable key + a host fold key: the whole sort moves
    # to host and stays lexicographic
    fr = sql("SELECT name, qty FROM t ORDER BY qty, UPPER(name)", CSV,
             schema=S)
    want = [r[0] for r in sorted(ROWS,
                                 key=lambda r: (int(r[2]), _up(r[0])))]
    assert [str(v) for v in fr["name"]] == want


def test_order_by_expr_over_join():
    t = {"a": LEFT, "b": RIGHT}
    fr = sql("SELECT a.name FROM a JOIN b ON a.city = b.city "
             "ORDER BY LENGTH(a.name) + b.pop DESC", tables=t)
    joined = [(r[0], RMAP[r[1]]) for r in LROWS if r[1] in RMAP]
    want = [nm for nm, _ in sorted(
        joined, key=lambda p: -(len(p[0].encode()) + p[1]))]
    assert [str(v) for v in fr[fr.names[0]]] == want
    fr = sql("SELECT UPPER(a.name) FROM a JOIN b ON a.city = b.city "
             "ORDER BY LOWER(a.name)", tables=t)
    low = sorted((r[0] for r in LROWS if r[1] in RMAP),
                 key=lambda s: s.lower())
    assert [str(v) for v in fr[fr.names[0]]] == [_up(s) for s in low]


# ------------------------------------------- SUBSTR/TRIM/CONCAT items


def test_substr_item():
    fr = sql("SELECT SUBSTR(name, 2) AS tail, SUBSTR(name, 1, 3) AS "
             "head FROM t", CSV)
    assert [str(v) for v in fr["tail"]] == [r[0][1:] for r in ROWS]
    assert [str(v) for v in fr["head"]] == [r[0][:3] for r in ROWS]
    # SUBSTRING alias; default output name
    fr = sql("SELECT SUBSTRING(city, 1, 2) FROM t LIMIT 1", CSV)
    assert fr.names == ["SUBSTR(city)"]
    with pytest.raises(SqlError, match="1-based"):
        sql("SELECT SUBSTR(name, 0) FROM t", CSV)
    with pytest.raises(SqlError, match="length"):
        sql("SELECT SUBSTR(name, 1, -2) FROM t", CSV)


def test_trim_items():
    # default str specs pre-trim outer spaces (Col.trim=True) — give
    # a raw spec so the SQL TRIMs have something to strip
    from csv_simd_tpu.frame import Col

    csv = b"v\n  a b  \nxy\n"
    fr = sql("SELECT TRIM(v) AS t, LTRIM(v) AS l, RTRIM(v) AS r "
             "FROM t", csv, schema={"v": Col("str", trim=False)})
    assert [str(x) for x in fr["t"]] == ["a b", "xy"]
    assert [str(x) for x in fr["l"]] == ["a b  ", "xy"]
    assert [str(x) for x in fr["r"]] == ["  a b", "xy"]


def test_concat_and_pipes():
    fr = sql("SELECT CONCAT(name, '@', city) AS addr FROM t", CSV)
    want = [f"{r[0]}@{r[1]}" for r in ROWS]
    assert [str(v) for v in fr["addr"]] == want
    # the || operator, incl. a leading literal and nested functions
    fr = sql("SELECT name || '/' || UPPER(city) AS k FROM t", CSV)
    want = [f"{r[0]}/" + "".join(c.upper() if 'a' <= c <= 'z' else c
                                 for c in r[1]) for r in ROWS]
    assert [str(v) for v in fr["k"]] == want
    fr = sql("SELECT '<' || name AS tag FROM t", CSV)
    assert [str(v) for v in fr["tag"]] == ["<" + r[0] for r in ROWS]
    # nested: SUBSTR of a CONCAT part
    fr = sql("SELECT CONCAT(SUBSTR(name, 1, 1), city) AS k FROM t",
             CSV)
    assert [str(v) for v in fr["k"]] == [r[0][:1] + r[1] for r in ROWS]
    with pytest.raises(SqlError, match="at least one column"):
        sql("SELECT CONCAT('a', 'b') FROM t", CSV)
    with pytest.raises(SqlError, match="concatenates"):
        sql("SELECT (qty + 1) || 'x' FROM t", CSV, schema=S)


def test_concat_null_and_join_qualified():
    # a NULL column part nulls the row
    csv = b"sym,qty\nAA,1\nBB,oops\n"
    fr = sql("SELECT sym || '#' AS k, qty FROM t", csv,
             schema={"qty": "int32"})
    assert [str(v) for v in fr["k"]] == ["AA#", "BB#"]
    # (text parts only — qty is int) concat over a JOIN with
    # qualified refs
    t = {"a": LEFT, "b": RIGHT}
    fr = sql("SELECT a.name || ':' || b.city AS k FROM a JOIN b "
             "ON a.city = b.city ORDER BY a.name", tables=t)
    want = sorted(f"{r[0]}:{r[1]}" for r in LROWS if r[1] in RMAP)
    assert [str(v) for v in fr["k"]] == want


def test_substr_order_by_and_group_reject():
    fr = sql("SELECT name FROM t ORDER BY SUBSTR(name, 2)", CSV)
    want = [r[0] for r in sorted(ROWS, key=lambda r: r[0][1:])]
    assert [str(v) for v in fr["name"]] == want
    with pytest.raises(SqlError, match="GROUP BY"):
        sql("SELECT TRIM(city), COUNT(*) FROM t GROUP BY city", CSV)
    with pytest.raises(SqlError, match="fold decoded text"):
        sql("SELECT TRIM(qty) FROM t", CSV, schema=S)
