"""Device equi-join (join.py): sort-merge on device, host pair
expansion — differential against a nested-loop Python oracle."""

import csv as pycsv
import io

import numpy as np
import pytest

import csv_simd_tpu as cst
from csv_simd_tpu.join import join_records, join_typed


LEFT = (
    b"sym,qty\n"
    b"AAPL,10\n"
    b"MSFT,20\n"
    b"ZZZZ,30\n"       # no right match
    b"AAPL,40\n"
    b"GOOG,bad!\n"      # right matches exist but qty won't parse
    b'"AA,PL",50\n'     # quoted key
)

RIGHT = (
    b"sym,price\n"
    b"MSFT,2.50\n"
    b'"AAPL",1.25\n'    # quoted: joins text-equal to bare AAPL
    b"AAPL,1.75\n"
    b"GOOG,9.99\n"
    b'"AA,PL",7.77\n'
    b"XXXX,0.01\n"      # no left match
)


def _rows(data):
    return list(pycsv.reader(io.StringIO(data.decode())))[1:]


LROWS, RROWS = _rows(LEFT), _rows(RIGHT)


def _oracle_pairs(how="inner", lkey=lambda r: r[0],
                  rkey=lambda r: r[0]):
    out = []
    matched_r = set()
    for i, lr in enumerate(LROWS):
        hits = [j for j, rr in enumerate(RROWS) if rkey(rr) == lkey(lr)]
        matched_r.update(hits)
        if how == "semi":
            if hits:
                out.append((i, min(hits)))
        elif how == "anti":
            if not hits:
                out.append((i, -1))
        elif hits:
            out += [(i, j) for j in hits]
        elif how in ("left", "outer"):
            out.append((i, -1))
    if how == "outer":
        out += [(-1, j) for j in range(len(RROWS))
                if j not in matched_r]
    return out


def _tapes(engine="offsets"):
    from csv_simd_tpu.frame import _resolve_tape

    lt, ln = _resolve_tape(LEFT, None, "auto", engine, False)
    rt, rn = _resolve_tape(RIGHT, None, "auto", engine, False)
    return lt, rt


@pytest.mark.parametrize("engine", ["offsets", "packed"])
def test_join_records_str_key(engine):
    lt, rt = _tapes(engine)
    l, r = join_records(lt, rt, "sym")
    got = sorted(zip(l.tolist(), r.tolist()))
    assert got == sorted(_oracle_pairs())


def test_join_records_left():
    lt, rt = _tapes()
    l, r = join_records(lt, rt, "sym", how="left")
    # left order preserved, unmatched keep -1
    assert l.tolist() == [p[0] for p in _oracle_pairs("left")]
    assert sorted(zip(l.tolist(), r.tolist())) == sorted(
        _oracle_pairs("left")
    )


def test_join_records_right():
    lt, rt = _tapes()
    l, r = join_records(lt, rt, "sym", how="right")
    # grouped by RIGHT row in right-record order; unmatched right rows
    # (XXXX) keep left id -1
    assert r.tolist() == sorted(r.tolist())
    assert sorted(zip(l.tolist(), r.tolist())) == sorted(
        (i, j) for i, j in _oracle_pairs("outer") if j != -1
    )


def test_join_records_outer():
    lt, rt = _tapes()
    l, r = join_records(lt, rt, "sym", how="outer")
    want = _oracle_pairs("outer")
    assert sorted(zip(l.tolist(), r.tolist())) == sorted(want)
    # left-join prefix keeps left order; right-only rows at the tail
    n_left = sum(1 for i, _ in want if i != -1)
    assert all(i != -1 for i in l.tolist()[:n_left])
    assert all(i == -1 for i in l.tolist()[n_left:])


def test_join_records_semi_anti():
    lt, rt = _tapes()
    l, r = join_records(lt, rt, "sym", how="semi")
    assert list(zip(l.tolist(), r.tolist())) == _oracle_pairs("semi")
    l, r = join_records(lt, rt, "sym", how="anti")
    assert list(zip(l.tolist(), r.tolist())) == _oracle_pairs("anti")
    # an invalid left key is matchless -> qualifies for anti
    left = b"k\n5\nnope\n7\n"
    right = b"k,v\n5,1\n7,2\n"
    lt2, rt2 = _resolve2(left, right)
    l, r = join_records(lt2, rt2, "k", left_spec="int32",
                        right_spec="int32")
    assert sorted(zip(l.tolist(), r.tolist())) == [(0, 0), (2, 1)]
    l, r = join_records(lt2, rt2, "k", left_spec="int32",
                        right_spec="int32", how="anti")
    assert list(zip(l.tolist(), r.tolist())) == [(1, -1)]


def test_join_int_key_device():
    left = b"k,a\n1,x\n2,y\n2,z\n9,w\n"
    right = b"k,b\n2,p\n1,q\n2,r\n7,s\n"
    from csv_simd_tpu.frame import _resolve_tape

    lt, _ = _resolve_tape(left, None, "auto", "offsets", False)
    rt, _ = _resolve_tape(right, None, "auto", "offsets", False)
    l, r = join_records(lt, rt, "k")
    lr = _rows(left)
    rr = _rows(right)
    want = sorted(
        (i, j) for i in range(4) for j in range(4)
        if lr[i][0] == rr[j][0]
    )
    assert sorted(zip(l.tolist(), r.tolist())) == want
    # ties: right matches within a group keep right record order
    grp = [rj for li, rj in zip(l.tolist(), r.tolist()) if li == 1]
    assert grp == sorted(grp)


def test_join_invalid_keys_never_match():
    # right key INT32_MAX is legit; an invalid right row must not ride
    # the sentinel into its group
    left = b"k\n2147483647\n5\n"
    right = b"k,v\n2147483647,1\nnope,2\n5,3\n"
    from csv_simd_tpu.frame import _resolve_tape

    lt, _ = _resolve_tape(left, None, "auto", "offsets", False)
    rt, _ = _resolve_tape(right, None, "auto", "offsets", False)
    l, r = join_records(lt, rt, "k", right_spec="int32",
                        left_spec="int32")
    assert sorted(zip(l.tolist(), r.tolist())) == [(0, 0), (1, 2)]


def test_join_decimal_key_host():
    left = b"p\n1.25\n9.99\n"
    right = b"p,tag\n9.99,hi\n1.25,lo\n1.25,mid\n"
    from csv_simd_tpu.frame import _resolve_tape

    lt, _ = _resolve_tape(left, None, "auto", "offsets", False)
    rt, _ = _resolve_tape(right, None, "auto", "offsets", False)
    l, r = join_records(lt, rt, "p")
    assert sorted(zip(l.tolist(), r.tolist())) == [
        (0, 1), (0, 2), (1, 0)
    ]


def test_join_typed_frame():
    fr = join_typed(LEFT, RIGHT, "sym", schema={"qty": "int32"})
    pairs = _oracle_pairs()
    assert len(fr) == len(pairs)
    assert fr.records.tolist() == [p[0] for p in pairs]
    # qty from left, price from right, per pair
    import collections

    got = collections.Counter(
        (s, int(q) if ok else None, str(p))
        for s, q, ok, p in zip(
            fr["sym"], fr["qty"], fr.ok("qty"), fr["price"]
        )
    )
    want = collections.Counter()
    for i, j in pairs:
        try:
            q = int(LROWS[i][1])
        except ValueError:
            q = None
        cents = str(round(float(RROWS[j][1]) * 100))  # decimal:2 int64
        want[(LROWS[i][0], q, cents)] += 1
    assert got == want


def test_join_typed_left_missing_flags():
    fr = join_typed(LEFT, RIGHT, "sym", how="left")
    miss_rows = [k for k, r in enumerate(fr.records.tolist())
                 if LROWS[r][0] == "ZZZZ"]
    assert len(miss_rows) == 1
    k = miss_rows[0]
    assert not fr.ok("price")[k]
    assert fr.ok("sym_right") is not None and not fr.ok("sym_right")[k]


def test_join_typed_outer_and_right():
    fr = join_typed(LEFT, RIGHT, "sym", how="outer",
                    schema={"qty": "int32"})
    want = _oracle_pairs("outer")
    assert len(fr) == len(want)
    assert fr.records.tolist() == [p[0] for p in want]
    # right-only rows (XXXX): LEFT columns flag not-ok / empty text
    tail = [k for k, i in enumerate(fr.records.tolist()) if i == -1]
    assert len(tail) == 1
    k = tail[0]
    assert not fr.ok("sym")[k] and not fr.ok("qty")[k]
    assert str(fr["sym_right"][k]) == "XXXX"
    # right join keeps every right row, drops unmatched left (ZZZZ)
    fr = join_typed(LEFT, RIGHT, "sym", how="right")
    assert len(fr) == sum(1 for i, j in want if j != -1)
    syms_r = [str(s) for s in fr["sym_right"]]
    assert "XXXX" in syms_r
    assert "ZZZZ" not in [str(s) for s in fr["sym"]]


def test_join_typed_semi_anti():
    fr = join_typed(LEFT, RIGHT, "sym", how="semi",
                    schema={"qty": "int32"})
    # left columns only, one row per matching left record
    assert fr.names == ["sym", "qty"]
    assert fr.records.tolist() == [p[0] for p in _oracle_pairs("semi")]
    fr = join_typed(LEFT, RIGHT, "sym", how="anti")
    assert fr.names == ["sym", "qty"]
    assert [str(s) for s in fr["sym"]] == ["ZZZZ"]


def test_join_typed_suffix_and_columns():
    fr = join_typed(LEFT, RIGHT, "sym", columns=["sym", "qty"],
                    right_columns=["sym", "price"])
    assert fr.names == ["sym", "qty", "sym_right", "price"]
    assert all(a == b for a, b in zip(fr["sym"], fr["sym_right"]))


def test_join_typed_where_pushdown():
    fr = join_typed(LEFT, RIGHT, "sym", where=("qty", ">=", 40),
                    right_where=("price", "<", "5.00"),
                    schema={"qty": "int32"})
    want = [
        (i, j) for i, j in _oracle_pairs()
        if LROWS[i][1].isdigit() and int(LROWS[i][1]) >= 40
        and float(RROWS[j][1]) < 5.0
    ]
    assert len(fr) == len(want)
    assert fr.records.tolist() == [p[0] for p in want]


def test_join_key_type_mismatch():
    with pytest.raises(ValueError, match="disagree"):
        join_typed(LEFT, RIGHT, "sym", right_on="price")


def test_join_how_validation():
    lt, rt = _tapes()
    with pytest.raises(ValueError, match="how must be"):
        join_records(lt, rt, "sym", how="sideways")


def test_join_records_cross():
    lt, rt = _tapes()
    nl, nr = len(LROWS), len(RROWS)
    l_ids, r_ids = join_records(lt, rt, None, how="cross")
    assert l_ids.shape == r_ids.shape == (nl * nr,)
    assert list(l_ids) == list(np.repeat(np.arange(nl), nr))
    assert list(r_ids) == list(np.tile(np.arange(nr), nl))
    # restricted sides compose
    l_ids, r_ids = join_records(lt, rt, None, how="cross",
                                left_records=np.array([2, 0]),
                                right_records=np.array([1]))
    assert list(l_ids) == [2, 0] and list(r_ids) == [1, 1]


def test_join_single_key_domain_mismatch():
    # decimal keys are scale-shifted int64 on host; joining them
    # against face-value ints would compare 10x-scaled vs raw
    left = b"k,v\n1.5,1\n2.5,2\n"    # k infers decimal
    right = b"k,v\n15,1\n25,2\n"     # k infers int32
    with pytest.raises(ValueError, match="disagree"):
        join_records(*_resolve2(left, right), "k")


def test_join_composite_mixed_numeric_domain_raises():
    left = b"sym,day\nAA,1.0\nBB,2.0\n"   # day infers decimal
    right = b"sym,day\nAA,10\nBB,20\n"    # day infers int32
    with pytest.raises(ValueError, match="disagree"):
        join_typed(left, right, on=["sym", "day"])


def _resolve2(left, right):
    from csv_simd_tpu.frame import _resolve_tape

    lt, _ = _resolve_tape(left, None, "auto", "offsets", False)
    rt, _ = _resolve_tape(right, None, "auto", "offsets", False)
    return lt, rt


def test_cli_join_right_on_count_mismatch(tmp_path):
    # one left key column + two right key columns must raise, not
    # silently join on the first right column only
    from csv_simd_tpu.__main__ import main

    lp, rp = tmp_path / "l.csv", tmp_path / "r.csv"
    lp.write_bytes(b"sym,day,qty\nAA,1,10\nAA,2,20\n")
    rp.write_bytes(b"sym,day,px\nAA,9,111\nAA,1,222\n")
    with pytest.raises(ValueError, match="right_on has 2"):
        main(["join", str(lp), str(rp), "sym", "--right-on", "sym,day"])


def test_cli_join(tmp_path, capsys):
    from csv_simd_tpu.__main__ import main

    lp, rp = tmp_path / "l.csv", tmp_path / "r.csv"
    lp.write_bytes(LEFT)
    rp.write_bytes(RIGHT)
    assert main(["join", str(lp), str(rp), "sym", "--limit", "3"]) == 0
    out = capsys.readouterr().out
    assert "sym_right" in out and "price" in out


# ------------------------------------------------- composite join keys

def test_composite_join_matches_python_oracle():
    import itertools

    rng = np.random.default_rng(21)
    lrows = [("AB"[int(rng.integers(0, 2))] * 2,
              int(rng.integers(1, 4)), i) for i in range(40)]
    rrows = [("AB"[int(rng.integers(0, 2))] * 2,
              int(rng.integers(1, 4)), 100 + j) for j in range(25)]
    left = ("sym,day,qty\n" + "".join(
        f"{s},{d},{q}\n" for s, d, q in lrows)).encode()
    right = ("sym,day,px\n" + "".join(
        f"{s},{d},{p}\n" for s, d, p in rrows)).encode()
    from csv_simd_tpu.frame import _resolve_tape

    lt, _ = _resolve_tape(left, None, "auto", "offsets", False)
    rt, _ = _resolve_tape(right, None, "auto", "offsets", False)
    l_ids, r_ids = join_records(lt, rt, ["sym", "day"])
    got = sorted(zip(l_ids.tolist(), r_ids.tolist()))
    want = sorted(
        (i, j)
        for (i, (ls, ld, _)), (j, (rs, rd, _))
        in itertools.product(enumerate(lrows), enumerate(rrows))
        if ls == rs and ld == rd
    )
    assert got == want


def test_composite_join_typed_left_and_right_on():
    left = b"s,d,qty\nAA,1,10\nBB,2,20\nAA,3,30\n"
    right = b"ticker,dd,px\nAA,1,111\nAA,3,333\nBB,9,999\n"
    f = join_typed(left, right, on=["s", "d"],
                   right_on=["ticker", "dd"], how="left")
    assert len(f) == 3
    okm = f.ok("px")
    assert list(okm) == [True, False, True]
    assert list(f["qty"]) == [10, 20, 30]
