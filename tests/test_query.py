"""Device query layer (query.py): predicate pushdown, exact device
aggregates, device group-by — all differential against a pure-Python
csv-module oracle."""

import csv as pycsv
import io

import numpy as np
import pytest

import csv_simd_tpu as cst
from csv_simd_tpu.query import (
    Stats,
    column_stats,
    group_aggregate,
    groupby_typed,
    order_records,
    select_records,
    stats_float,
    stats_int,
    value_counts,
)


def _make_csv(n=1000, bad_rows=(), quoted=()):
    """Synthetic table with int/float/str/date/decimal columns. Rows in
    `bad_rows` get a non-numeric qty; rows in `quoted` get a quoted,
    comma-containing sym."""
    out = [b"sym,qty,price,day,ratio"]
    for i in range(n):
        sym = ("AAPL", "MSFT", "GOOG")[i % 3]
        if i in quoted:
            sym = '"AA,PL"'
        qty = "x!" if i in bad_rows else str((-1) ** i * ((i * 7) % 2000))
        price = f"{i % 100}.{i % 97:02d}"
        day = f"2024-{(i % 12) + 1:02d}-{(i % 28) + 1:02d}"
        ratio = f"{(i % 13) * 0.5}"
        out.append(f"{sym},{qty},{price},{day},{ratio}".encode())
    return b"\n".join(out) + b"\n"


def _oracle_rows(data: bytes):
    rd = pycsv.reader(io.StringIO(data.decode()))
    rows = list(rd)[1:]
    return rows


CSV = _make_csv(n=600, bad_rows={5, 77}, quoted={9, 12})
ROWS = _oracle_rows(CSV)


def _oracle_qty():
    vals, ok = [], []
    for r in ROWS:
        try:
            vals.append(int(r[1]))
            ok.append(True)
        except ValueError:
            vals.append(0)
            ok.append(False)
    return np.array(vals), np.array(ok)


@pytest.fixture(scope="module", params=["offsets", "packed"])
def engine(request):
    return request.param


# ------------------------------------------------------------- stats

def test_stats_int_exact(engine):
    st = column_stats(CSV, "qty", engine=engine)
    v, ok = _oracle_qty()
    assert st.count == len(ROWS)
    assert st.ok_count == int(ok.sum())
    assert st.sum == int(v[ok].sum())
    assert st.min == int(v[ok].min())
    assert st.max == int(v[ok].max())
    assert st.mean == pytest.approx(v[ok].mean())


def test_stats_chunk_boundary_extremes():
    # values near int32 extremes across a >1-chunk column: the 16-bit
    # half-split partial sums must recombine exactly
    n = 9000  # > _CHUNK = 8192
    vals = np.where(
        np.arange(n) % 2 == 0, 2**31 - 1 - (np.arange(n) % 7), -(2**31)
    ).astype(np.int64)
    body = b"v\n" + b"\n".join(str(x).encode() for x in vals) + b"\n"
    st = column_stats(body, "v", "int32")
    assert st.sum == int(vals.sum())
    assert st.min == -(2**31) and st.max == 2**31 - 1


def test_stats_float(engine):
    st = column_stats(CSV, "ratio", "float", engine=engine)
    orc = np.array([float(r[4]) for r in ROWS], np.float32)
    assert st.ok_count == len(ROWS)
    assert st.min == float(orc.min()) and st.max == float(orc.max())
    assert st.sum == pytest.approx(float(orc.astype(np.float64).sum()),
                                   rel=1e-6)


def test_stats_decimal_host_path():
    st = column_stats(CSV, "price")  # inferred decimal:2
    cents = [round(float(r[2]) * 100) for r in ROWS]
    assert st.sum == sum(cents)
    assert st.min == min(cents) and st.max == max(cents)


def test_stats_date():
    st = column_stats(CSV, "day")
    days = [int(np.datetime64(r[3], "D").astype(np.int64)) for r in ROWS]
    assert st.sum == sum(days) and st.min == min(days)


def test_stats_str_counts_only():
    st = column_stats(CSV, "sym")
    assert st.sum is None and st.mean is None
    assert st.count == len(ROWS)


def test_stats_where():
    st = column_stats(CSV, "qty", where=("qty", ">", 0))
    v, ok = _oracle_qty()
    pos = v[ok & (v > 0)]
    assert st.ok_count == len(pos)
    assert st.sum == int(pos.sum())


def test_stats_empty_selection():
    st = column_stats(CSV, "qty", where=("qty", ">", 10**6))
    assert st.ok_count == 0 and st.sum is None and st.mean is None


def test_stats_int_direct_all_bad():
    import jax.numpy as jnp

    s = stats_int(jnp.zeros(16, jnp.int32), jnp.zeros(16, bool))
    assert s == Stats(16, 0, None, None, None)
    f = stats_float(jnp.zeros(16, jnp.float32), jnp.zeros(16, bool))
    assert f.sum is None


# --------------------------------------------------------- predicates

def _ids_where(mask_fn):
    v, ok = _oracle_qty()
    return [i for i in range(len(ROWS)) if mask_fn(i, v[i], ok[i])]


def test_select_numeric_ops(engine):
    from csv_simd_tpu.frame import _resolve_tape

    tape, names = _resolve_tape(CSV, None, "auto", engine, False)
    v, ok = _oracle_qty()
    for op, fn in [("==", lambda x: x == 14), ("!=", lambda x: x != 14),
                   ("<", lambda x: x < -100), ("<=", lambda x: x <= 0),
                   (">", lambda x: x > 500), (">=", lambda x: x >= 1992)]:
        got = select_records(tape, ("qty", op, (14 if op in ("==", "!=")
                                                else {"<": -100, "<=": 0,
                                                      ">": 500,
                                                      ">=": 1992}[op])),
                             names=names)
        want = [i for i in range(len(ROWS)) if ok[i] and fn(v[i])]
        assert got.tolist() == want, op


def test_select_between_and_in(engine):
    from csv_simd_tpu.frame import _resolve_tape

    tape, names = _resolve_tape(CSV, None, "auto", engine, False)
    v, ok = _oracle_qty()
    got = select_records(tape, ("qty", "between", (10, 99)), names=names)
    want = [i for i in range(len(ROWS)) if ok[i] and 10 <= v[i] <= 99]
    assert got.tolist() == want
    got = select_records(tape, ("qty", "in", [14, -7, 21]), names=names)
    want = [i for i in range(len(ROWS)) if ok[i] and v[i] in (14, -7, 21)]
    assert got.tolist() == want


def test_select_str_decoded_equality(engine):
    # rows 9/12 hold a QUOTED comma-containing sym: the predicate
    # compares the stage-2 decoded value
    from csv_simd_tpu.frame import _resolve_tape

    tape, names = _resolve_tape(CSV, None, "auto", engine, False)
    got = select_records(tape, ("sym", "==", "AA,PL"), names=names)
    assert got.tolist() == [9, 12]
    got = select_records(tape, ("sym", "in", ["AA,PL", "GOOG"]),
                         names=names)
    want = [i for i in range(len(ROWS)) if ROWS[i][0] in ("AA,PL", "GOOG")]
    assert got.tolist() == want


def test_select_date_and_decimal_predicates():
    from csv_simd_tpu.frame import _resolve_tape

    tape, names = _resolve_tape(CSV, None, "auto", "offsets", False)
    got = select_records(tape, ("day", ">=", "2024-11-01"), names=names)
    want = [i for i in range(len(ROWS)) if ROWS[i][3] >= "2024-11-01"]
    assert got.tolist() == want
    got = select_records(tape, ("price", "<", "1.00"), names=names)
    want = [i for i in range(len(ROWS)) if float(ROWS[i][2]) < 1.0]
    assert got.tolist() == want


def test_select_and_of_predicates():
    from csv_simd_tpu.frame import _resolve_tape

    tape, names = _resolve_tape(CSV, None, "auto", "offsets", False)
    v, ok = _oracle_qty()
    got = select_records(
        tape, [("qty", ">", 0), ("sym", "==", "MSFT")], names=names
    )
    want = [i for i in range(len(ROWS))
            if ok[i] and v[i] > 0 and ROWS[i][0] == "MSFT"]
    assert got.tolist() == want


def test_select_or_not_trees():
    from csv_simd_tpu.frame import _resolve_tape

    tape, names = _resolve_tape(CSV, None, "auto", "offsets", False)
    v, ok = _oracle_qty()
    got = select_records(
        tape, ("or", [("qty", ">", 1500), ("sym", "==", "AA,PL")]),
        names=names,
    )
    want = [i for i in range(len(ROWS))
            if (ok[i] and v[i] > 1500) or ROWS[i][0] == "AA,PL"]
    assert got.tolist() == want
    # not = pure complement: parse-failure rows ARE selected
    got = select_records(tape, ("not", ("qty", ">", 0)), names=names)
    want = [i for i in range(len(ROWS)) if not (ok[i] and v[i] > 0)]
    assert got.tolist() == want
    # nesting: and(or(...), leaf), with a list as implicit AND inside
    got = select_records(
        tape,
        [("or", [("qty", ">", 1500), ("qty", "<", -1500)]),
         ("sym", "!=", "GOOG")],
        names=names,
    )
    want = [i for i in range(len(ROWS))
            if ok[i] and (v[i] > 1500 or v[i] < -1500)
            and ROWS[i][0] != "GOOG"]
    assert got.tolist() == want


def test_select_tree_validation():
    from csv_simd_tpu.frame import _resolve_tape

    tape, names = _resolve_tape(CSV, None, "auto", "offsets", False)
    with pytest.raises(ValueError, match="empty 'or'"):
        select_records(tape, ("or", []), names=names)
    with pytest.raises(ValueError, match="bad where"):
        select_records(tape, ("xor", [("qty", ">", 0)]), names=names)


def test_select_rejects_bad_predicates():
    from csv_simd_tpu.frame import _resolve_tape

    tape, names = _resolve_tape(CSV, None, "auto", "offsets", False)
    with pytest.raises(ValueError, match="unknown predicate op"):
        select_records(tape, ("qty", "~=", 3), names=names)
    with pytest.raises(KeyError, match="no column"):
        select_records(tape, ("nope", "==", 3), names=names)
    with pytest.raises(ValueError, match="typed column"):
        select_records(tape, ("sym", "<", "B"), names=names)


# ----------------------------------------------------- where= pushdown

def test_read_typed_where(engine):
    fr = cst.read_typed(
        CSV, where=[("qty", ">", 100), ("sym", "==", "AAPL")],
        engine=engine,
    )
    v, ok = _oracle_qty()
    want = [i for i in range(len(ROWS))
            if ok[i] and v[i] > 100 and ROWS[i][0] == "AAPL"]
    assert fr.records.tolist() == want
    assert len(fr) == len(want)
    assert fr["qty"].tolist() == [int(ROWS[i][1]) for i in want]
    assert fr["sym"].tolist() == ["AAPL"] * len(want)
    # date column materializes only the selected rows
    assert (fr["day"] == np.array(
        [np.datetime64(ROWS[i][3], "D") for i in want]
    )).all()


def test_read_typed_where_empty():
    fr = cst.read_typed(CSV, where=("qty", ">", 10**6))
    assert len(fr) == 0
    assert fr["qty"].shape == (0,)
    assert fr["sym"].shape == (0,)


def test_read_typed_no_where_records():
    fr = cst.read_typed(CSV, {"qty": "int32"})
    assert fr.records.tolist() == list(range(len(ROWS)))


def test_records_param_direct(engine):
    from csv_simd_tpu.frame import _resolve_tape

    tape, _ = _resolve_tape(CSV, None, "auto", engine, False)
    sel = np.array([3, 0, 77, 599], np.int32)
    vals, ok = tape.column_int32(1, max_len=16, records=sel)
    v, okk = _oracle_qty()
    assert np.asarray(vals)[np.asarray(ok)].tolist() == [
        v[i] for i in [3, 0, 599] if okk[i]
    ]
    assert np.asarray(ok).tolist() == [True, True, False, True]


def test_filter_equals_records_param():
    from csv_simd_tpu.frame import _resolve_tape

    tape, _ = _resolve_tape(CSV, None, "auto", "offsets", False)
    sel = np.arange(0, 30, dtype=np.int32)
    got = tape.filter_equals(0, b"MSFT", records=sel)
    want = [i for i in range(30) if ROWS[i][0] == "MSFT"]
    assert got.tolist() == want


# ------------------------------------------------------------ group-by

def test_groupby_int_key_int_val(engine):
    g = groupby_typed(CSV, "qty", "qty", engine=engine)
    v, ok = _oracle_qty()
    uniq = sorted(set(v[ok].tolist()))
    assert g["keys"].tolist() == uniq
    for k, s, mn, mx, c in zip(g["keys"], g["sum"], g["min"], g["max"],
                               g["count"]):
        sel = v[ok & (v == k)]
        assert s == sel.sum() and mn == k and mx == k
        assert c == len(sel)


def test_groupby_date_key_sum(engine):
    g = groupby_typed(CSV, "day", "qty", engine=engine)
    v, ok = _oracle_qty()
    import collections

    o = collections.defaultdict(lambda: [0, 0, None, None])
    for i in range(len(ROWS)):
        if not ok[i]:
            continue
        k = int(np.datetime64(ROWS[i][3], "D").astype(np.int64))
        e = o[k]
        e[0] += v[i]
        e[1] += 1
        e[2] = v[i] if e[2] is None else min(e[2], v[i])
        e[3] = v[i] if e[3] is None else max(e[3], v[i])
    assert g["keys"].tolist() == sorted(o)
    for k, s, mn, mx, c in zip(g["keys"], g["sum"], g["min"], g["max"],
                               g["count"]):
        assert [s, c, mn, mx] == o[k]


def test_groupby_float_values():
    g = groupby_typed(CSV, "qty", "ratio", value_spec="float")
    v, ok = _oracle_qty()
    r = np.array([float(x[4]) for x in ROWS], np.float64)
    for k, s in zip(g["keys"][:5], g["sum"][:5]):
        assert s == pytest.approx(r[ok & (v == k)].sum(), rel=1e-6)


def test_groupby_where():
    g = groupby_typed(CSV, "day", "qty", where=("qty", ">", 0))
    v, ok = _oracle_qty()
    keep = ok & (v > 0)
    days = np.array(
        [int(np.datetime64(r[3], "D").astype(np.int64)) for r in ROWS]
    )
    assert g["keys"].tolist() == sorted(set(days[keep].tolist()))


def test_groupby_str_key(engine):
    # categorical key: decoded text (incl. the quoted comma-sym rows),
    # device grouping on factorized codes, keys back as str
    g = groupby_typed(CSV, "sym", "qty", engine=engine)
    v, ok = _oracle_qty()
    syms = np.array([r[0] for r in ROWS], dtype=object)
    uniq = sorted(set(syms.tolist()))
    assert g["keys"].tolist() == uniq
    for k, s, c in zip(g["keys"], g["sum"], g["count"]):
        sel = v[ok & (syms == k)]
        assert s == sel.sum() and c == len(sel)
    assert "AA,PL" in g["keys"].tolist()  # quoted sym decoded


def test_groupby_str_key_where():
    g = groupby_typed(CSV, "sym", "qty", where=("qty", "<", 0))
    v, ok = _oracle_qty()
    syms = np.array([r[0] for r in ROWS], dtype=object)
    keep = ok & (v < 0)
    assert g["keys"].tolist() == sorted(set(syms[keep].tolist()))
    for k, s in zip(g["keys"], g["sum"]):
        assert s == v[keep & (syms == k)].sum()


def test_groupby_bytes_key():
    g = groupby_typed(CSV, "sym", "qty", key_spec="bytes")
    assert all(isinstance(k, bytes) for k in g["keys"])
    assert b"AAPL" in g["keys"].tolist()


def test_groupby_composite_keys(engine):
    # (sym, day) pairs: lexicographic group order, exact sums
    g = groupby_typed(CSV, ["sym", "day"], "qty", engine=engine)
    v, ok = _oracle_qty()
    import collections

    o = collections.defaultdict(int)
    cnt = collections.Counter()
    for i in range(len(ROWS)):
        if not ok[i]:
            continue
        k = (ROWS[i][0],
             int(np.datetime64(ROWS[i][3], "D").astype(np.int64)))
        o[k] += v[i]
        cnt[k] += 1
    want = sorted(o)
    ks, kd = g["keys"]
    assert list(zip(ks.tolist(), kd.tolist())) == want
    assert g["sum"].tolist() == [o[k] for k in want]
    assert g["count"].tolist() == [cnt[k] for k in want]


def test_groupby_composite_where_and_specs():
    g = groupby_typed(CSV, ["sym", "qty"], "qty",
                      key_spec=["str", "int32"], value_spec="int32",
                      where=("qty", ">", 1500))
    v, ok = _oracle_qty()
    pairs = sorted({(ROWS[i][0], int(v[i]))
                    for i in range(len(ROWS)) if ok[i] and v[i] > 1500})
    ks, kq = g["keys"]
    assert list(zip(ks.tolist(), kq.tolist())) == pairs
    # key == value: each group's sum is key*count
    assert all(s == q * c for q, s, c in
               zip(kq.tolist(), g["sum"].tolist(), g["count"].tolist()))


def test_groupby_composite_bad_rows_excluded():
    # rows 5/77 have unparseable qty: excluded as group keys too
    g = groupby_typed(CSV, ["qty"], "qty")
    single = groupby_typed(CSV, "qty", "qty")
    assert g["keys"][0].tolist() == single["keys"].tolist()
    assert g["sum"].tolist() == single["sum"].tolist()


def test_groupby_having_single():
    base = groupby_typed(CSV, "sym", "qty")
    g = groupby_typed(CSV, "sym", "qty", having=("count", ">=", 100))
    keep = [i for i, c in enumerate(base["count"]) if c >= 100]
    assert g["keys"].tolist() == [base["keys"][i] for i in keep]
    assert g["sum"].tolist() == [base["sum"][i] for i in keep]
    assert g["count"].tolist() == [base["count"][i] for i in keep]
    # mean target + or tree; string literals coerce (CLI path)
    g = groupby_typed(
        CSV, "sym", "qty",
        having=("or", [("mean", ">", "0"), ("count", "<", "5")]),
    )
    keep = [i for i, (s, c) in
            enumerate(zip(base["sum"], base["count"]))
            if (c and s / c > 0) or c < 5]
    assert g["keys"].tolist() == [base["keys"][i] for i in keep]
    # not = complement
    g = groupby_typed(CSV, "sym", "qty",
                      having=("not", ("count", ">=", 100)))
    keep = [i for i, c in enumerate(base["count"]) if not c >= 100]
    assert g["keys"].tolist() == [base["keys"][i] for i in keep]


def test_groupby_having_multi_value():
    base = groupby_typed(CSV, "sym", ["qty", "ratio"])
    g = groupby_typed(CSV, "sym", ["qty", "ratio"],
                      having=[("qty.sum", ">", 0),
                              ("ratio.count", ">", 0)])
    keep = [i for i in range(len(base["count"]))
            if base["aggs"]["qty"]["sum"][i] > 0
            and base["aggs"]["ratio"]["count"][i] > 0]
    assert g["keys"].tolist() == [base["keys"][i] for i in keep]
    assert g["aggs"]["qty"]["sum"].tolist() == [
        base["aggs"]["qty"]["sum"][i] for i in keep
    ]
    assert g["count"].tolist() == [base["count"][i] for i in keep]


def test_groupby_having_composite_key_and_between():
    base = groupby_typed(CSV, ["sym", "day"], "qty")
    g = groupby_typed(CSV, ["sym", "day"], "qty",
                      having=("count", "between", (2, 3)))
    keep = [i for i, c in enumerate(base["count"]) if 2 <= c <= 3]
    ks, kd = g["keys"]
    assert ks.tolist() == [base["keys"][0][i] for i in keep]
    assert kd.tolist() == [base["keys"][1][i] for i in keep]


def test_groupby_having_validation():
    with pytest.raises(ValueError, match="bad having target"):
        groupby_typed(CSV, "sym", "qty", having=("median", ">", 1))
    with pytest.raises(ValueError, match="needs a column prefix"):
        groupby_typed(CSV, "sym", ["qty", "ratio"],
                      having=("sum", ">", 1))
    with pytest.raises(ValueError, match="not an aggregated"):
        groupby_typed(CSV, "sym", ["qty"], having=("nope.sum", ">", 1))
    with pytest.raises(ValueError, match="unprefixed"):
        groupby_typed(CSV, "sym", "qty", having=("qty.sum", ">", 1))


def test_groupby_composite_spec_len_mismatch():
    with pytest.raises(ValueError, match="key_spec has"):
        groupby_typed(CSV, ["sym", "day"], "qty", key_spec=["str"])


def test_groupby_decimal_key_host_fallback():
    g = groupby_typed(CSV, "price", "qty")
    v, ok = _oracle_qty()
    cents = np.array([round(float(r[2]) * 100) for r in ROWS])
    uniq = sorted(set(cents[ok].tolist()))
    assert g["keys"].tolist() == uniq
    first = uniq[0]
    assert g["sum"][0] == int(v[ok & (cents == first)].sum())


def test_groupby_decimal_value_exact_on_host():
    """decimal values (host int64) now group exactly (object-int host
    combine) instead of being rejected."""
    g = groupby_typed(CSV, "sym", "price")  # price infers decimal:2
    rows = ROWS
    import collections
    from decimal import Decimal

    acc = collections.defaultdict(list)
    for r in rows:
        acc[r[0]].append(int(Decimal(r[2]).scaleb(2)))
    keys = sorted(acc)
    assert list(g["keys"]) == keys
    assert [int(s) for s in g["sum"]] == [sum(acc[k]) for k in keys]
    assert [int(m) for m in g["min"]] == [min(acc[k]) for k in keys]
    assert [int(m) for m in g["max"]] == [max(acc[k]) for k in keys]
    assert [int(c) for c in g["count"]] == [len(acc[k]) for k in keys]


def test_group_aggregate_direct_negative_sums():
    import jax.numpy as jnp

    keys = jnp.asarray(np.repeat(np.arange(5, dtype=np.int32), 50))
    vals = jnp.asarray(
        (np.arange(250) % 7 - 3).astype(np.int32) * 100_000
    )
    g = group_aggregate(keys, vals)
    kh = np.repeat(np.arange(5), 50)
    vh = (np.arange(250) % 7 - 3).astype(np.int64) * 100_000
    for k in range(5):
        assert g["sum"][k] == vh[kh == k].sum()
    assert g["count"].tolist() == [50] * 5


def test_group_aggregate_all_invalid():
    import jax.numpy as jnp

    g = group_aggregate(
        jnp.zeros(8, jnp.int32), jnp.ones(8, jnp.int32),
        key_ok=jnp.zeros(8, bool),
    )
    assert g["keys"].shape == (0,)
    assert g["sum"].shape == (0,)


def test_group_aggregate_empty():
    import jax.numpy as jnp

    g = group_aggregate(jnp.zeros(0, jnp.int32), jnp.zeros(0, jnp.int32))
    assert g["keys"].shape == (0,)


def test_group_key_at_sentinel_value():
    # a legit key equal to INT32_MAX shares the sentinel segment with
    # invalid rows; masked reductions must still be correct
    import jax.numpy as jnp

    keys = jnp.asarray(np.array([2**31 - 1, 5, 2**31 - 1, 5], np.int32))
    vals = jnp.asarray(np.array([10, 1, 20, 2], np.int32))
    ok = jnp.asarray(np.array([True, True, False, True]))
    g = group_aggregate(keys, vals, key_ok=ok)
    assert g["keys"].tolist() == [5, 2**31 - 1]
    assert g["sum"].tolist() == [3, 10]
    assert g["count"].tolist() == [2, 1]


# ------------------------------------------------------------ ordering

def _oracle_order(desc=False, key=lambda i: None, valid=lambda i: True):
    """Expected id order: valid rows stable-sorted by key (descending
    still breaks ties by ascending id), parse failures last."""
    ok_ids = [i for i in range(len(ROWS)) if valid(i)]
    bad_ids = [i for i in range(len(ROWS)) if not valid(i)]
    sign = -1 if desc else 1
    return sorted(ok_ids, key=lambda i: (sign * key(i), i)) + bad_ids


def test_order_records_int(engine):
    from csv_simd_tpu.frame import _resolve_tape

    tape, names = _resolve_tape(CSV, None, "auto", engine, False)
    v, ok = _oracle_qty()
    got = order_records(tape, "qty", names=names)
    want = _oracle_order(key=lambda i: v[i], valid=lambda i: ok[i])
    assert got.tolist() == want
    got = order_records(tape, "qty", names=names, descending=True)
    want = _oracle_order(desc=True, key=lambda i: int(v[i]),
                         valid=lambda i: ok[i])
    assert got.tolist() == want


def test_order_records_limit_and_where():
    from csv_simd_tpu.frame import _resolve_tape

    tape, names = _resolve_tape(CSV, None, "auto", "offsets", False)
    v, ok = _oracle_qty()
    got = order_records(tape, "qty", names=names, where=("qty", ">", 0),
                        descending=True, limit=5)
    pos = sorted((i for i in range(len(ROWS)) if ok[i] and v[i] > 0),
                 key=lambda i: (-v[i], i))
    assert got.tolist() == pos[:5]


def test_order_records_str():
    from csv_simd_tpu.frame import _resolve_tape

    tape, names = _resolve_tape(CSV, None, "auto", "offsets", False)
    got = order_records(tape, "sym", names=names, limit=30)
    want = sorted(range(len(ROWS)), key=lambda i: (ROWS[i][0], i))[:30]
    assert got.tolist() == want


def test_order_records_float_and_decimal():
    from csv_simd_tpu.frame import _resolve_tape

    tape, names = _resolve_tape(CSV, None, "auto", "offsets", False)
    r = [float(x[4]) for x in ROWS]
    got = order_records(tape, "ratio", names=names,
                        schema={"ratio": "float"})
    want = sorted(range(len(ROWS)), key=lambda i: (np.float32(r[i]), i))
    assert got.tolist() == want
    cents = [round(float(x[2]) * 100) for x in ROWS]
    got = order_records(tape, "price", names=names, descending=True,
                        limit=7)
    want = sorted(range(len(ROWS)), key=lambda i: (-cents[i], i))[:7]
    assert got.tolist() == want


def test_order_records_multi_key():
    from csv_simd_tpu.frame import _resolve_tape

    tape, names = _resolve_tape(CSV, None, "auto", "offsets", False)
    v, ok = _oracle_qty()
    # sym ascending then qty descending; qty parse-failures last
    # within a sym tie
    got = order_records(tape, ["sym", "qty"], names=names,
                        descending=[False, True])
    want = sorted(range(len(ROWS)),
                  key=lambda i: (ROWS[i][0], not ok[i],
                                 -v[i] if ok[i] else 0, i))
    assert got.tolist() == want
    # single descending bool broadcasts to every key
    got = order_records(tape, ["sym", "qty"], names=names,
                        descending=True, limit=9)
    want = sorted(range(len(ROWS)),
                  key=lambda i: (_desc_str(ROWS[i][0]), not ok[i],
                                 -v[i] if ok[i] else 0, i))[:9]
    assert got.tolist() == want
    with pytest.raises(ValueError, match="descending has 3"):
        order_records(tape, ["sym", "qty"], names=names,
                      descending=[True, False, True])
    with pytest.raises(ValueError, match="empty order-by"):
        order_records(tape, [], names=names)


def _desc_str(s):
    """Sort key inverting lexicographic order for strings."""
    return tuple(-ord(c) for c in s) + (float("inf"),)


def test_read_typed_order_by_multi(engine):
    fr = cst.read_typed(CSV, order_by=["sym", "qty"],
                        descending=[False, True], limit=12,
                        engine=engine)
    v, ok = _oracle_qty()
    want = sorted(range(len(ROWS)),
                  key=lambda i: (ROWS[i][0], not ok[i],
                                 -v[i] if ok[i] else 0, i))[:12]
    assert list(fr.records) == want
    assert [str(s) for s in fr["sym"]] == [ROWS[i][0] for i in want]


def test_read_typed_order_by(engine):
    fr = cst.read_typed(CSV, where=("sym", "==", "MSFT"),
                        order_by="qty", descending=True, limit=10,
                        engine=engine)
    v, ok = _oracle_qty()
    want = sorted(
        (i for i in range(len(ROWS)) if ok[i] and ROWS[i][0] == "MSFT"),
        key=lambda i: (-v[i], i),
    )[:10]
    assert fr.records.tolist() == want
    assert fr["qty"].tolist() == [int(v[i]) for i in want]
    assert len(fr) == 10


def test_read_typed_limit_only():
    fr = cst.read_typed(CSV, {"qty": "int32"}, limit=25)
    v, _ = _oracle_qty()
    assert fr.records.tolist() == list(range(25))
    assert fr["qty"].tolist() == v[:25].tolist()


def test_read_typed_order_parse_failures_last():
    fr = cst.read_typed(CSV, order_by="qty", limit=len(ROWS))
    v, ok = _oracle_qty()
    tail = fr.records[-int((~ok).sum()):].tolist()
    assert sorted(tail) == np.flatnonzero(~ok).tolist()


# -------------------------------------------------------- value counts

def test_value_counts_int(engine):
    vc = value_counts(CSV, "qty", engine=engine)
    v, ok = _oracle_qty()
    import collections

    c = collections.Counter(v[ok].tolist())
    assert vc["keys"].tolist() == sorted(c)
    assert vc["count"].tolist() == [c[k] for k in sorted(c)]


def test_value_counts_str_where():
    vc = value_counts(CSV, "sym", where=("qty", ">", 0))
    v, ok = _oracle_qty()
    import collections

    c = collections.Counter(
        ROWS[i][0] for i in range(len(ROWS)) if ok[i] and v[i] > 0
    )
    assert vc["keys"].tolist() == sorted(c)
    assert vc["count"].tolist() == [c[k] for k in sorted(c)]


def test_distinct():
    got = cst.distinct(CSV, "sym")
    assert got.tolist() == sorted({r[0] for r in ROWS})


def test_value_counts_decimal_host():
    vc = value_counts(CSV, "price")
    cents = [round(float(r[2]) * 100) for r in ROWS]
    import collections

    c = collections.Counter(cents)
    assert vc["keys"].tolist() == sorted(c)
    assert int(vc["count"].sum()) == len(ROWS)


# ---------------------------------------------------------------- CLI

def test_cli_stats_and_groupby(tmp_path, capsys):
    import json

    from csv_simd_tpu.__main__ import main

    f = tmp_path / "t.csv"
    f.write_bytes(CSV)
    assert main(["stats", str(f), "qty"]) == 0
    rep = json.loads(capsys.readouterr().out)
    v, ok = _oracle_qty()
    assert rep["sum"] == int(v[ok].sum())
    assert rep["ok_count"] == int(ok.sum())

    assert main(["stats", str(f), "qty", "--where", "qty > 0",
                 "--where", "sym == AAPL"]) == 0
    rep = json.loads(capsys.readouterr().out)
    keep = ok & (v > 0) & np.array([r[0] == "AAPL" for r in ROWS])
    assert rep["sum"] == int(v[keep].sum())

    assert main(["groupby", str(f), "day", "qty", "--limit", "2"]) == 0
    out = capsys.readouterr().out
    assert "groups" in out and "sum=" in out

    assert main(["groupby", str(f), "sym,day", "qty", "--limit", "2"]) == 0
    out = capsys.readouterr().out
    assert "AA,PL," in out  # composite key printed col0,col1

    assert main(["values", str(f), "sym", "--by-count"]) == 0
    out = capsys.readouterr().out
    assert "distinct values" in out

    assert main(["frame", str(f), "--where", "qty between 10 99",
                 "--limit", "3"]) == 0
    out = capsys.readouterr().out
    assert "qty" in out


def test_cli_where_parser():
    from csv_simd_tpu.__main__ import _parse_where

    assert _parse_where(None) is None
    assert _parse_where(["qty > 100"]) == [("qty", ">", "100")]
    assert _parse_where(["sym in A|B"]) == [("sym", "in", ["A", "B"])]
    assert _parse_where(["d between 1 2"]) == [("d", "between",
                                                ("1", "2"))]
    assert _parse_where(["0 <= 5"]) == [(0, "<=", "5")]
    # ' or ' chains inside one expression -> an ("or", [...]) node
    assert _parse_where(["qty > 100 or sym == AAPL"]) == [
        ("or", [("qty", ">", "100"), ("sym", "==", "AAPL")])
    ]
    with pytest.raises(SystemExit):
        _parse_where(["qty >"])


def test_cli_where_or_and_multi_order(tmp_path, capsys):
    from csv_simd_tpu.__main__ import main

    f = tmp_path / "t.csv"
    f.write_bytes(b"sym,qty\nAA,5\nBB,50\nAA,500\nCC,2\nBB,7\n")
    assert main(["frame", str(f), "--where", "qty > 40 or sym == CC",
                 "--limit", "9"]) == 0
    out = capsys.readouterr().out
    assert "records=3" in out          # BB/50, AA/500, CC/2
    assert main(["frame", str(f), "--order-by", "sym,-qty",
                 "--limit", "9"]) == 0
    out = capsys.readouterr().out
    assert "500, 5, 50, 7, 2" in out   # AA desc-qty, BB desc-qty, CC


def test_cli_groupby_having(tmp_path, capsys):
    from csv_simd_tpu.__main__ import main

    f = tmp_path / "t.csv"
    f.write_bytes(
        b"sym,qty\nAA,5\nBB,50\nAA,500\nCC,2\nBB,7\nBB,1\n"
    )
    assert main(["groupby", str(f), "sym", "qty",
                 "--having", "count >= 2 or sum > 100"]) == 0
    out = capsys.readouterr().out
    assert "2 groups" in out          # AA (sum 505), BB (3 rows)
    assert "CC" not in out


def test_cli_multi_file_corpus(tmp_path, capsys):
    """Several FILE arguments form one corpus for the analytic cmds.
    Clean table (no bad rows): the point is the corpus plumbing, not
    inference-sample edge cases (those are covered elsewhere)."""
    import json

    from csv_simd_tpu.__main__ import main

    data = _make_csv(n=200)
    rows = data.decode().strip().split("\n")
    head, body = rows[0], rows[1:]
    half = len(body) // 2
    f1 = tmp_path / "p1.csv"
    f2 = tmp_path / "p2.csv"
    f1.write_text("\n".join([head] + body[:half]) + "\n")
    f2.write_text("\n".join([head] + body[half:]) + "\n")
    qty = np.array([int(r[1]) for r in _oracle_rows(data)])

    assert main(["--backend", "golden", "stats", str(f1), str(f2),
                 "qty"]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["sum"] == int(qty.sum())
    assert rep["count"] == 200

    assert main(["--backend", "golden", "groupby", str(f1), str(f2),
                 "sym", "qty"]) == 0
    out = capsys.readouterr().out
    assert "3 groups" in out

    assert main(["--backend", "golden", "frame", str(f1), str(f2),
                 "--order-by", "qty", "--desc", "--head", "3"]) == 0
    out = capsys.readouterr().out
    assert "records=3" in out
    assert str(int(qty.max())) in out


# ------------------------------------------------- multi-value GROUP BY

def test_groupby_multi_values_device():
    """One key sort, several value columns: sums/extrema/counts match
    per-column single groupbys; per-value counts tally parse-ok rows
    only (SQL COUNT(col)) while the top-level count tallies key rows."""
    g = groupby_typed(CSV, "sym", ["qty", "ratio"])
    g_qty = groupby_typed(CSV, "sym", "qty")
    g_ratio = groupby_typed(CSV, "sym", "ratio")
    assert list(g["keys"]) == list(g_qty["keys"])
    # single-value groupby excludes rows whose value failed its parse
    # from the group entirely, so compare against the ok-only entries
    aq = g["aggs"]["qty"]
    assert [int(x) for x in aq["sum"]] == [int(x) for x in g_qty["sum"]]
    assert [int(x) for x in aq["count"]] == [
        int(x) for x in g_qty["count"]
    ]
    ar = g["aggs"]["ratio"]
    # "ratio" infers decimal -> host object-int sums; compare as floats
    np.testing.assert_allclose(
        np.asarray(ar["sum"], np.float64),
        np.asarray(g_ratio["sum"], np.float64), rtol=1e-6,
    )
    # the bad qty rows ("x!") keep their key row in count but are
    # missing from qty's per-value count
    total_rows = sum(int(c) for c in g["count"])
    ok_qty = sum(int(c) for c in aq["count"])
    assert total_rows == len(ROWS)
    assert total_rows - ok_qty == 2  # bad_rows={5, 77}


def test_groupby_multi_composite_and_corpus(tmp_path):
    data = CSV
    g1 = groupby_typed(data, ["sym", "day"], ["qty", "ratio"])
    assert isinstance(g1["keys"], list) and len(g1["keys"]) == 2
    assert set(g1["aggs"]) == {"qty", "ratio"}
    # corpus: same table split in two files must merge identically
    from csv_simd_tpu.corpus_api import CsvCorpus

    rows = data.decode().strip().split("\n")
    head, body = rows[0], rows[1:]
    (tmp_path / "a.csv").write_text("\n".join([head] + body[:301]) + "\n")
    (tmp_path / "b.csv").write_text("\n".join([head] + body[301:]) + "\n")
    c = CsvCorpus([str(tmp_path / "a.csv"), str(tmp_path / "b.csv")],
                  backend="golden")
    g2 = groupby_typed(c, "sym", ["qty", "ratio"])
    g0 = groupby_typed(data, "sym", ["qty", "ratio"])
    assert list(g2["keys"]) == list(g0["keys"])
    assert list(g2["count"]) == list(g0["count"])
    for n in ("qty", "ratio"):
        for f in ("sum", "min", "max", "count"):
            a = np.asarray(g2["aggs"][n][f], np.float64)
            b = np.asarray(g0["aggs"][n][f], np.float64)
            np.testing.assert_allclose(a, b, rtol=1e-6)


def test_string_predicates_device(engine):
    """startswith/endswith/contains match the DECODED text on device,
    differential vs Python string ops over the oracle rows."""
    from csv_simd_tpu.frame import _resolve_tape

    tape, _ = _resolve_tape(CSV, None, "auto", engine, False)
    for op, pyf in [
        ("startswith", lambda s, n: s.startswith(n)),
        ("endswith", lambda s, n: s.endswith(n)),
        ("contains", lambda s, n: n in s),
    ]:
        for needle in ("AA", "PL", "A,P", "OOG", "MSFT", "Z", ""):
            ids = select_records(tape, [("sym", op, needle)])
            expect = [i for i, r in enumerate(ROWS) if pyf(r[0], needle)]
            assert list(ids) == expect, (op, needle)


def test_string_predicate_on_typed_column_raises(engine):
    from csv_simd_tpu.frame import _resolve_tape

    tape, _ = _resolve_tape(CSV, None, "auto", engine, False)
    with pytest.raises(ValueError, match="decoded text"):
        select_records(tape, [("qty", "contains", "1")])


def test_cli_where_contains(tmp_path, capsys):
    from csv_simd_tpu.__main__ import main

    f = tmp_path / "t.csv"
    f.write_bytes(CSV)
    assert main(["frame", str(f), "--where", "sym contains A,P",
                 "--limit", "3"]) == 0
    out = capsys.readouterr().out
    assert "AA,PL" in out


# --------------------------------------------- quantiles / describe

def test_quantiles_match_numpy(engine):
    v, ok = _oracle_qty()
    qs = (0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    got = cst.column_quantiles(CSV, "qty", qs, engine=engine)
    want = np.quantile(v[ok].astype(np.float64), list(qs))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_quantiles_where_and_decimal():
    v, ok = _oracle_qty()
    got = cst.column_quantiles(CSV, "qty", (0.5,),
                               where=[("qty", ">", 0)])
    want = np.quantile(v[ok & (v > 0)].astype(np.float64), [0.5])
    np.testing.assert_allclose(got, want)
    # decimal column: host int64 path, SCALED units
    cents = np.array([int(r[2].replace(".", "")) for r in ROWS],
                     np.int64)
    got_d = cst.column_quantiles(CSV, "price", (0.5,))
    np.testing.assert_allclose(
        got_d, np.quantile(cents.astype(np.float64), [0.5]))


def test_describe_and_corpus_quantiles(tmp_path):
    d = cst.describe(CSV, columns=["qty", "sym"])
    v, ok = _oracle_qty()
    assert d["qty"]["stats"].sum == int(v[ok].sum())
    assert abs(d["qty"]["stats"].std
               - float(np.std(v[ok].astype(np.float64)))) < 1e-3
    assert d["sym"]["distinct"] == len({r[0] for r in ROWS})
    # corpus: same quantiles as the single file
    rows = CSV.decode().strip().split("\n")
    (tmp_path / "a.csv").write_text("\n".join(rows[:250]) + "\n")
    (tmp_path / "b.csv").write_text(
        "\n".join([rows[0]] + rows[250:]) + "\n")
    from csv_simd_tpu.corpus_api import CsvCorpus

    c = CsvCorpus([str(tmp_path / "a.csv"), str(tmp_path / "b.csv")],
                  backend="golden")
    # explicit spec: the corpus' denser inference sample sees the bad
    # "x!" rows and would (correctly) classify qty as str
    np.testing.assert_allclose(
        cst.column_quantiles(c, "qty", (0.25, 0.5, 0.75), "int32"),
        cst.column_quantiles(CSV, "qty", (0.25, 0.5, 0.75), "int32"),
    )


def test_corpus_quantiles_stay_on_device(tmp_path):
    """Corpus quantiles select exact ranks on device (rank-count
    bisect) — bit-equal to np.quantile over the pooled values, without
    pooling them (VERDICT r2 #7). Negatives, ties, floats with
    non-dyadic fractions, where-filters and all-invalid columns."""
    from csv_simd_tpu import query as q
    from csv_simd_tpu.corpus_api import CsvCorpus

    rng = np.random.default_rng(5)
    n = 997  # odd, prime: exercises every interpolation fraction
    ints = rng.integers(-5000, 5000, n)
    ints[rng.integers(0, n, 40)] = ints[0]  # ties
    flts = np.round(rng.normal(0, 3, n), 3).astype(np.float32)
    files = []
    cuts = [0, 311, 640, n]
    for i in range(3):
        rows = ["i,f"] + [
            f"{ints[j]},{float(flts[j])!r}"
            for j in range(cuts[i], cuts[i + 1])
        ]
        p = tmp_path / f"p{i}.csv"
        p.write_text("\n".join(rows) + "\n")
        files.append(str(p))
    c = CsvCorpus(files, backend="golden")

    calls = []
    real = q._quantiles_multi_device

    def spy(parts, qs_, is_float):
        calls.append(len(parts))
        return real(parts, qs_, is_float)

    q._quantiles_multi_device = spy
    try:
        qs = (0.0, 0.1, 0.25, 0.5, 0.61803, 0.75, 0.9, 1.0)
        got_i = cst.column_quantiles(c, "i", qs, "int32")
        got_f = cst.column_quantiles(c, "f", qs, "float")
        got_w = cst.column_quantiles(c, "i", (0.5,), "int32",
                                     where=[("i", ">", 0)])
    finally:
        q._quantiles_multi_device = real
    assert calls == [3, 3, 3], "corpus quantiles did not take the \
device rank-selection path"
    np.testing.assert_array_equal(
        got_i, np.quantile(ints.astype(np.float64), list(qs)))
    # the float oracle pools the PARSED float32s (the decoder, not the
    # generator, defines the values the quantiles are over)
    whole = "\n".join(
        ["i,f"] + [f"{ints[j]},{float(flts[j])!r}" for j in range(n)]
    ) + "\n"
    parsed = np.asarray(
        cst.read_typed(whole.encode(), {"f": "float"})["f"])
    np.testing.assert_array_equal(
        got_f, np.quantile(parsed.astype(np.float64), list(qs)))
    np.testing.assert_array_equal(
        got_w,
        np.quantile(ints[ints > 0].astype(np.float64), [0.5]))
    # describe over the corpus rides the same device selection
    d = cst.describe(c, columns=["i"], qs=(0.5,))
    np.testing.assert_array_equal(
        d["i"]["quantiles"],
        np.quantile(ints.astype(np.float64), [0.5]))


def test_quantiles_device_selection_edge_cases():
    """_quantiles_multi_device edges: single value, all-invalid,
    extreme int32 values, +-0.0 and infinities in float32."""
    import jax.numpy as jnp

    from csv_simd_tpu.query import _quantiles_multi_device

    one = [(jnp.asarray([7], jnp.int32), jnp.asarray([True]))]
    np.testing.assert_array_equal(
        _quantiles_multi_device(one, (0.0, 0.5, 1.0), False),
        [7.0, 7.0, 7.0])
    none = [(jnp.asarray([7], jnp.int32), jnp.asarray([False]))]
    assert np.isnan(_quantiles_multi_device(none, (0.5,), False)).all()
    ext = np.array([-2**31, 2**31 - 1, 0, -1], np.int64)
    parts = [(jnp.asarray(ext[:2], jnp.int32),
              jnp.asarray([True, True])),
             (jnp.asarray(ext[2:], jnp.int32),
              jnp.asarray([True, True]))]
    np.testing.assert_array_equal(
        _quantiles_multi_device(parts, (0.0, 0.5, 1.0), False),
        np.quantile(ext.astype(np.float64), [0.0, 0.5, 1.0]))
    fl = np.array([-np.inf, -1.5, -0.0, 0.0, 2.25, np.inf], np.float32)
    partsf = [(jnp.asarray(fl), jnp.asarray([True] * 6))]
    np.testing.assert_array_equal(
        _quantiles_multi_device(partsf, (0.0, 0.25, 0.5, 1.0), True),
        np.quantile(fl.astype(np.float64), [0.0, 0.25, 0.5, 1.0]))
