"""GROUP_CONCAT / STRING_AGG (round 5): per-group and whole-table
concatenation of non-NULL values in record order, custom separators,
crisp errors for the unsupported shapes."""

import numpy as np
import pytest

from csv_simd_tpu.sql import SqlError, sql

CSV = (b"sym,qty,tag\n"
       b"B,5,x\nA,1,y\nC,9,z\nA,bad,w\nB,2,v\n")
S = {"qty": "int32"}


def test_group_concat_per_group():
    r = sql("SELECT sym, GROUP_CONCAT(tag) AS c FROM t GROUP BY sym "
            "ORDER BY sym", CSV, schema=S)
    assert [str(v) for v in r["sym"]] == ["A", "B", "C"]
    assert list(r["c"]) == ["y,w", "x,v", "z"]


def test_group_concat_skips_nulls():
    r = sql("SELECT sym, GROUP_CONCAT(qty) AS c FROM t GROUP BY sym "
            "ORDER BY sym", CSV, schema=S)
    # A's 'bad' row is a NULL qty: skipped, not an empty element
    assert list(r["c"]) == ["1", "5,2", "9"]


def test_string_agg_custom_separator():
    r = sql("SELECT sym, STRING_AGG(tag, ' | ') AS c FROM t "
            "GROUP BY 1 ORDER BY 1", CSV, schema=S)
    assert list(r["c"]) == ["y | w", "x | v", "z"]


def test_group_concat_whole_table():
    r = sql("SELECT GROUP_CONCAT(sym, '; ') AS s FROM t WHERE qty > 1",
            CSV, schema=S)
    assert list(r["s"]) == ["B; C; B"]


def test_group_concat_all_null_group_is_null():
    csv = b"g,v\na,1\nb,\nb,\n"
    r = sql("SELECT g, GROUP_CONCAT(v) AS c FROM t GROUP BY g "
            "ORDER BY g", csv, schema={"v": "int32"})
    assert list(r["c"]) == ["1", None]


def test_group_concat_empty_result_is_null():
    r = sql("SELECT GROUP_CONCAT(sym) AS s FROM t WHERE qty > 999",
            CSV, schema=S)
    assert list(r["s"]) == [None]


def test_group_concat_having_raises():
    with pytest.raises(SqlError, match="GROUP_CONCAT"):
        sql("SELECT sym, GROUP_CONCAT(tag) AS c FROM t GROUP BY sym "
            "HAVING GROUP_CONCAT(tag) > 1", CSV, schema=S)


def test_group_concat_bad_separator_raises():
    with pytest.raises(SqlError, match="separator"):
        sql("SELECT GROUP_CONCAT(tag, 5) FROM t", CSV, schema=S)
