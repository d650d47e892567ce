"""SQL window functions: agg(col) OVER (PARTITION BY ... ORDER BY
...), ROW_NUMBER/RANK/DENSE_RANK, LAG/LEAD — host passes over the
materialized frame (like the text-function items), differential
against pandas."""

import numpy as np
import pandas as pd
import pytest

from csv_simd_tpu.sql import SqlError, sql


CSV = (b"grp,name,qty\n"
       b"a,w,4\n"
       b"b,x,1\n"
       b"a,y,2\n"
       b"a,z,2\n"
       b"b,q,oops\n"      # qty parse failure -> NULL
       b"b,r,5\n")
S = {"qty": "int32"}


def _df():
    df = pd.DataFrame({
        "grp": ["a", "b", "a", "a", "b", "b"],
        "name": ["w", "x", "y", "z", "q", "r"],
        "qty": [4, 1, 2, 2, None, 5],
    })
    return df


def test_row_number():
    fr = sql("SELECT name, ROW_NUMBER() OVER "
             "(PARTITION BY grp ORDER BY qty) AS rn FROM t",
             CSV, schema=S)
    df = _df()
    # pandas: NULLs sort last within the partition, ties stable
    df["rn"] = (df.sort_values(["qty"], kind="stable", na_position="last")
                .groupby("grp").cumcount() + 1)
    want = df["rn"].tolist()
    assert fr["rn"].tolist() == want
    # original row order is preserved
    assert [str(v) for v in fr["name"]] == df["name"].tolist()


def test_rank_and_dense_rank():
    fr = sql("SELECT name, RANK() OVER (PARTITION BY grp ORDER BY qty)"
             " AS r, DENSE_RANK() OVER (PARTITION BY grp ORDER BY qty)"
             " AS dr FROM t", CSV, schema=S)
    df = _df()
    r = df.groupby("grp")["qty"].rank(method="min", na_option="bottom")
    dr = df.groupby("grp")["qty"].rank(method="dense",
                                       na_option="bottom")
    assert fr["r"].tolist() == r.astype(int).tolist()
    assert fr["dr"].tolist() == dr.astype(int).tolist()
    with pytest.raises(SqlError, match="ORDER BY"):
        sql("SELECT RANK() OVER (PARTITION BY grp) FROM t", CSV)


def test_partition_aggregates_whole():
    # no OVER ORDER BY: whole-partition aggregates, NULLs skipped
    fr = sql("SELECT name, SUM(qty) OVER (PARTITION BY grp) AS s, "
             "COUNT(qty) OVER (PARTITION BY grp) AS c, "
             "COUNT(*) OVER (PARTITION BY grp) AS n, "
             "AVG(qty) OVER (PARTITION BY grp) AS m FROM t",
             CSV, schema=S)
    df = _df()
    g = df.groupby("grp")["qty"]
    assert fr["s"].tolist() == g.transform("sum").astype(int).tolist()
    assert fr["c"].tolist() == g.transform("count").astype(int).tolist()
    assert fr["n"].tolist() == df.groupby("grp")["grp"] \
                                 .transform("size").tolist()
    assert fr["m"].tolist() == pytest.approx(
        g.transform("mean").tolist())


def test_cumulative_with_peers():
    # OVER ORDER BY: RANGE frame — peer rows share the running value
    csv = (b"grp,qty\n"
           b"a,1\n"
           b"a,2\n"
           b"a,2\n"
           b"a,5\n")
    fr = sql("SELECT SUM(qty) OVER (PARTITION BY grp ORDER BY qty) "
             "AS s FROM t", csv, schema={"qty": "int32"})
    # peers (the two 2s) both see 1+2+2=5
    assert fr["s"].tolist() == [1, 5, 5, 10]
    fr = sql("SELECT COUNT(*) OVER (ORDER BY qty) AS c FROM t", csv,
             schema={"qty": "int32"})
    assert fr["c"].tolist() == [1, 3, 3, 4]


def test_lag_lead():
    csv = b"grp,qty\na,1\nb,9\na,2\na,3\nb,8\n"
    fr = sql("SELECT qty, LAG(qty) OVER (PARTITION BY grp ORDER BY "
             "qty) AS prev, LEAD(qty, 2) OVER (PARTITION BY grp "
             "ORDER BY qty) AS nn FROM t", csv, schema={"qty": "int32"})
    ok_prev = fr.ok("prev")
    # a-partition ordered: 1,2,3 (rows 0,2,3); b: 8,9 (rows 4,1) —
    # output keeps ORIGINAL row order
    assert [v for v, o in zip(fr["prev"], ok_prev) if o] == [8, 1, 2]
    assert ok_prev.tolist() == [False, True, True, True, False]
    ok_nn = fr.ok("nn")
    assert [v for v, o in zip(fr["nn"], ok_nn) if o] == [3]
    assert ok_nn.tolist() == [True, False, False, False, False]
    with pytest.raises(SqlError, match="offset"):
        sql("SELECT LAG(qty, 0) OVER (ORDER BY qty) FROM t", csv)


def test_window_order_desc_and_alias_order():
    fr = sql("SELECT name, ROW_NUMBER() OVER (ORDER BY qty DESC) AS rn"
             " FROM t ORDER BY rn", CSV, schema=S)
    df = _df()
    want = (df.sort_values("qty", ascending=False, kind="stable",
                           na_position="last")["name"].tolist())
    assert [str(v) for v in fr["name"]] == want


def test_window_min_max_text_and_errors():
    fr = sql("SELECT grp, MAX(name) OVER (PARTITION BY grp) AS hi "
             "FROM t", CSV)
    df = _df()
    want = df.groupby("grp")["name"].transform("max").tolist()
    assert [str(v) for v in fr["hi"]] == want
    with pytest.raises(SqlError, match="numeric"):
        sql("SELECT SUM(name) OVER (PARTITION BY grp) FROM t", CSV)
    with pytest.raises(SqlError, match="GROUP BY"):
        sql("SELECT grp, SUM(qty) OVER (PARTITION BY grp) FROM t "
            "GROUP BY grp", CSV, schema=S)
    with pytest.raises(SqlError, match="OVER"):
        sql("SELECT ROW_NUMBER() FROM t", CSV)


def test_window_over_join_and_derived():
    left = b"sym,qty\nAAPL,10\nMSFT,20\nAAPL,40\n"
    right = b"sym,price\nMSFT,2.50\nAAPL,1.25\n"
    fr = sql("SELECT l.sym, ROW_NUMBER() OVER (PARTITION BY l.sym "
             "ORDER BY qty) AS rn FROM l JOIN r ON l.sym = r.sym",
             tables={"l": left, "r": right},
             schema={"qty": "int32"})
    got = sorted(zip(map(str, fr["sym"]), fr["rn"].tolist()))
    assert got == [("AAPL", 1), ("AAPL", 2), ("MSFT", 1)]
    # over a derived table
    fr = sql("SELECT sym, SUM(qty) OVER (PARTITION BY sym) AS s FROM "
             "(SELECT sym, qty FROM t WHERE qty > 5)",
             left, schema={"qty": "int32"})
    assert sorted(zip(map(str, fr["sym"]), fr["s"].tolist())) == \
        [("AAPL", 50), ("AAPL", 50), ("MSFT", 20)]


def test_window_sum_pandas_differential():
    rng = np.random.RandomState(7)
    rows = []
    for i in range(60):
        rows.append((rng.choice(["a", "b", "c"]), int(rng.randint(0, 9))))
    csv = b"g,v\n" + b"".join(
        f"{g},{v}\n".encode() for g, v in rows)
    fr = sql("SELECT SUM(v) OVER (PARTITION BY g ORDER BY v) AS s "
             "FROM t", csv, schema={"v": "int32"})
    df = pd.DataFrame(rows, columns=["g", "v"])
    # pandas twin of the RANGE frame: cumsum over the v-sorted frame
    # (index-aligned back), then peers share the last peer's cumsum
    csum = df.sort_values("v", kind="stable").groupby("g")["v"].cumsum()
    peer_last = df.assign(cs=csum).groupby(["g", "v"])["cs"] \
                  .transform("max")
    assert fr["s"].tolist() == peer_last.tolist()
