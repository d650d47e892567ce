"""CsvCorpus tests: multi-file global addressing, routing, schema check."""

import numpy as np
import pytest

from csv_simd_tpu.corpus_api import CsvCorpus
from csv_simd_tpu.errors import InvalidState


@pytest.fixture
def files(tmp_path):
    paths = []
    for i in range(3):
        p = tmp_path / f"part{i}.csv"
        rows = ["id,val"] + [f"{i}-{j},{i * 100 + j}" for j in range(5 + i)]
        p.write_bytes(("\n".join(rows) + "\n").encode())
        paths.append(str(p))
    return paths


def test_corpus_global_addressing(files):
    c = CsvCorpus(files, backend="golden")
    assert c.num_records == 5 + 6 + 7
    assert len(c) == 18
    assert c.header_names() == ["id", "val"]
    assert c.seek_field(0, 0) == b"0-0"
    assert c.seek_field(4, 0) == b"0-4"     # last of file 0
    assert c.seek_field(5, 0) == b"1-0"     # first of file 1
    assert c.seek_field(17, 0) == b"2-6"    # last overall
    assert c.seek_field(18, 0) is None
    assert c.seek_record(11) == b"2-0,200"
    assert c.owner(11).endswith("part2.csv")


def test_corpus_column(files):
    c = CsvCorpus(files, backend="golden")
    col = c.column(1)
    assert len(col) == 18
    assert col[0] == b"0" and col[5] == b"100" and col[-1] == b"206"


def test_corpus_schema_mismatch(tmp_path, files):
    bad = tmp_path / "bad.csv"
    bad.write_bytes(b"different,names\n1,2\n")
    with pytest.raises(InvalidState):
        CsvCorpus(files + [str(bad)], backend="golden")


def test_corpus_empty():
    with pytest.raises(InvalidState):
        CsvCorpus([])


# -- corpus-level relational ops (per-file map + associative combine) --


@pytest.fixture
def typed_files(tmp_path):
    """Three files, one logical trades table with overlapping symbols."""
    rng = np.random.default_rng(5)
    paths = []
    for i in range(3):
        p = tmp_path / f"trades{i}.csv"
        rows = ["sym,qty,price"]
        for j in range(40):
            sym = ["AAPL", "MSFT", '"GOOG"'][int(rng.integers(0, 3))]
            rows.append(f"{sym},{int(rng.integers(-5, 500))},"
                        f"{int(rng.integers(1, 999)) / 100:.2f}")
        p.write_bytes(("\n".join(rows) + "\n").encode())
        paths.append(str(p))
    return paths


def _single_file_equiv(typed_files, tmp_path):
    """Concatenate the parts into one file (shared header) — the oracle
    for every corpus-level result."""
    blobs = [open(p, "rb").read() for p in typed_files]
    body = blobs[0] + b"".join(b.split(b"\n", 1)[1] for b in blobs[1:])
    one = tmp_path / "all.csv"
    one.write_bytes(body)
    return str(one)


def test_corpus_stats_matches_single_file(typed_files, tmp_path):
    from csv_simd_tpu.query import column_stats

    c = CsvCorpus(typed_files, backend="golden")
    one = _single_file_equiv(typed_files, tmp_path)
    assert column_stats(c, "qty") == column_stats(one, "qty")
    w = [("sym", "==", "GOOG")]
    assert column_stats(c, "qty", where=w) == column_stats(one, "qty", where=w)


def test_corpus_groupby_matches_single_file(typed_files, tmp_path):
    from csv_simd_tpu.query import groupby_typed

    c = CsvCorpus(typed_files, backend="golden")
    one = _single_file_equiv(typed_files, tmp_path)
    g_c = groupby_typed(c, "sym", "qty")
    g_1 = groupby_typed(one, "sym", "qty")
    assert list(g_c["keys"]) == list(g_1["keys"])
    for k in ("sum", "min", "max", "count"):
        assert list(g_c[k]) == list(g_1[k])


def test_corpus_groupby_having(typed_files, tmp_path):
    # HAVING applies after the cross-file merge: the corpus result
    # must equal the single-file result, so a group split across
    # files filters by its COMBINED aggregates
    from csv_simd_tpu.query import groupby_typed

    c = CsvCorpus(typed_files, backend="golden")
    one = _single_file_equiv(typed_files, tmp_path)
    base = groupby_typed(one, "sym", "qty")
    # a COMBINED-count threshold no single file reaches: per-file
    # filtering would return nothing
    hav = ("count", ">", int(min(base["count"])))
    g_c = groupby_typed(c, "sym", "qty", having=hav)
    g_1 = groupby_typed(one, "sym", "qty", having=hav)
    assert list(g_c["keys"]) == list(g_1["keys"])
    for k in ("sum", "min", "max", "count"):
        assert list(g_c[k]) == list(g_1[k])
    # sanity: the filter actually dropped the min-count group
    assert len(g_c["keys"]) < len(base["keys"])


def test_corpus_groupby_composite(typed_files, tmp_path):
    from csv_simd_tpu.query import groupby_typed

    c = CsvCorpus(typed_files, backend="golden")
    one = _single_file_equiv(typed_files, tmp_path)
    g_c = groupby_typed(c, ["sym", "price"], "qty",
                        key_spec=[None, "decimal:2"])
    g_1 = groupby_typed(one, ["sym", "price"], "qty",
                        key_spec=[None, "decimal:2"])
    for a, b in zip(g_c["keys"], g_1["keys"]):
        assert list(a) == list(b)
    for k in ("sum", "min", "max", "count"):
        assert list(g_c[k]) == list(g_1[k])


def test_corpus_value_counts_and_select(typed_files, tmp_path):
    from csv_simd_tpu.query import select_records, value_counts

    c = CsvCorpus(typed_files, backend="golden")
    one = _single_file_equiv(typed_files, tmp_path)
    v_c = value_counts(c, "sym")
    v_1 = value_counts(one, "sym")
    assert list(v_c["keys"]) == list(v_1["keys"])
    assert list(v_c["count"]) == list(v_1["count"])
    ids = select_records(c, [("qty", ">", 250)])
    # global ids route through the corpus to the same rows the
    # single-file select finds
    from csv_simd_tpu.frame import read_typed
    qty_all = read_typed(c, {"qty": "int32"})["qty"]
    assert (qty_all[ids] > 250).all()
    assert len(ids) == int((qty_all > 250).sum())


def test_corpus_order_by_limit(typed_files, tmp_path):
    from csv_simd_tpu.frame import read_typed

    c = CsvCorpus(typed_files, backend="golden")
    one = _single_file_equiv(typed_files, tmp_path)
    f_c = read_typed(c, order_by="qty", descending=True, limit=7)
    f_1 = read_typed(one, order_by="qty", descending=True, limit=7)
    assert list(f_c["qty"]) == list(f_1["qty"])
    assert list(f_c["sym"]) == list(f_1["sym"])
    # text ORDER BY over the corpus frame
    f_c2 = read_typed(c, order_by="sym", limit=5)
    f_12 = read_typed(one, order_by="sym", limit=5)
    assert list(f_c2["sym"]) == list(f_12["sym"])
    # multi-key ORDER BY: corpus matches the single-file equivalent
    f_c3 = read_typed(c, order_by=["sym", "qty"],
                      descending=[False, True], limit=9)
    f_13 = read_typed(one, order_by=["sym", "qty"],
                      descending=[False, True], limit=9)
    assert list(f_c3["sym"]) == list(f_13["sym"])
    assert list(f_c3["qty"]) == list(f_13["qty"])


def test_corpus_partition_invariance(tmp_path):
    """Corpus-level relational results must not depend on WHERE the
    file boundaries fall (the associative-combine property, exercised
    at several partitionings of the same logical table)."""
    from csv_simd_tpu.frame import read_typed
    from csv_simd_tpu.query import column_stats, groupby_typed

    rng = np.random.default_rng(13)
    body = [
        f"{['X', 'Y', 'Z'][int(rng.integers(0, 3))]},"
        f"{int(rng.integers(-100, 100))}"
        for _ in range(60)
    ]
    head = "sym,qty"

    def _mk(cuts, tag):
        paths, prev = [], 0
        for i, c in enumerate(list(cuts) + [len(body)]):
            p = tmp_path / f"{tag}_{i}.csv"
            p.write_text("\n".join([head] + body[prev:c]) + "\n")
            paths.append(str(p))
            prev = c
        return CsvCorpus(paths, backend="golden")

    base = _mk([], "whole")
    s0 = column_stats(base, "qty")
    g0 = groupby_typed(base, "sym", "qty")
    f0 = read_typed(base, order_by="qty", limit=10)
    for k, cuts in enumerate([[30], [1, 2], [10, 20, 30, 40, 50],
                              [59], [17, 43], [0, 30]]):
        c = _mk(cuts, f"cut{k}")
        assert column_stats(c, "qty") == s0
        g = groupby_typed(c, "sym", "qty")
        assert list(g["keys"]) == list(g0["keys"])
        for fld in ("sum", "min", "max", "count"):
            assert list(g[fld]) == list(g0[fld])
        f = read_typed(c, order_by="qty", limit=10)
        assert list(f["qty"]) == list(f0["qty"])


def test_corpus_serving_tape_and_join(tmp_path):
    """CorpusTape: the corpus behind the single-tape serving contract —
    routed gathers, typed columns, and equi-joins with a corpus on
    either side."""
    from csv_simd_tpu.join import join_typed
    from csv_simd_tpu.query import order_records

    for i in range(2):
        rows = ["sym,qty"] + [
            f"{['AA', 'BB', 'CC'][j % 3]},{i * 100 + j}" for j in range(9)
        ]
        (tmp_path / f"p{i}.csv").write_text("\n".join(rows) + "\n")
    (tmp_path / "dim.csv").write_text(
        "sym,sector\nAA,tech\nBB,ads\nCC,cars\n"
    )
    c = CsvCorpus([str(tmp_path / f"p{i}.csv") for i in range(2)],
                  backend="golden")
    st = c.serving_tape()

    # routed gather == per-file seeks
    out, ln, v = st.gather_fields(
        np.array([0, 8, 9, 17, 99]), np.array([1, 1, 1, 1, 1]), 8
    )
    vals = st.to_host_lists(out, ln, v)
    assert vals == [b"0", b"8", b"100", b"108", None]

    # typed column spans the file boundary
    vv, ok = st.column_int32(1)
    assert np.asarray(ok).all()
    assert list(np.asarray(vv)) == list(range(9)) + [100 + j
                                                     for j in range(9)]

    ids = order_records(st, "qty", descending=True, limit=3)
    assert [c.seek_field(int(r), 1) for r in ids] == [b"108", b"107",
                                                      b"106"]

    f = join_typed(c, str(tmp_path / "dim.csv"), on="sym")
    assert len(f) == 18
    assert list(f["sector"][:3]) == ["tech", "ads", "cars"]

    f2 = join_typed(str(tmp_path / "dim.csv"), c, on="sym", how="left")
    assert len(f2) == 18  # every dim row matches 6 corpus rows


def test_corpus_mixed_type_files_lock_corpus_wide(tmp_path):
    """Inference locks ONE type from a cross-file sample: a file of
    ints followed by a file of decimals must behave exactly like the
    concatenated single file (predicates, stats, frames) — a type
    locked from the first file alone would truncate decimal literals
    and match the wrong rows."""
    from csv_simd_tpu.frame import read_typed
    from csv_simd_tpu.query import column_stats, select_records

    (tmp_path / "A.csv").write_text("sym,qty\nAAPL,1\nGOOG,2\n")
    (tmp_path / "B.csv").write_text("sym,qty\nGOOG,1.5\nAAPL,2.5\n")
    (tmp_path / "one.csv").write_text(
        "sym,qty\nAAPL,1\nGOOG,2\nGOOG,1.5\nAAPL,2.5\n"
    )
    c = CsvCorpus([str(tmp_path / "A.csv"), str(tmp_path / "B.csv")],
                  backend="golden")
    one = str(tmp_path / "one.csv")

    assert list(select_records(c, [("qty", "==", 1.5)])) == [2]
    assert (column_stats(c, "qty", where=[("qty", "<", 2)])
            == column_stats(one, "qty", where=[("qty", "<", 2)]))
    f_c, f_1 = read_typed(c), read_typed(one)
    assert f_c.schema == f_1.schema
    assert list(f_c["qty"]) == list(f_1["qty"])
    # the result schema must not depend on the where clause
    fa = read_typed(c, where=[("sym", "==", "AAPL")])
    fg = read_typed(c, where=[("sym", "==", "GOOG")])
    assert fa.schema == fg.schema
    assert list(fa.records) == [0, 3] and list(fg.records) == [1, 2]


def test_corpus_order_by_date_desc_and_hidden_key(tmp_path):
    """Corpus ORDER BY: datetime64 keys sort descending without
    crashing, and the key column need not be in the output columns."""
    from csv_simd_tpu.frame import read_typed

    (tmp_path / "D1.csv").write_text("d,v\n2024-01-02,1\n2024-03-01,2\n")
    (tmp_path / "D2.csv").write_text("d,v\n2023-12-31,3\n2024-02-15,4\n")
    c = CsvCorpus([str(tmp_path / "D1.csv"), str(tmp_path / "D2.csv")],
                  backend="golden")
    f = read_typed(c, order_by="d", descending=True)
    assert [str(x) for x in f["d"]] == [
        "2024-03-01", "2024-02-15", "2024-01-02", "2023-12-31"
    ]
    f2 = read_typed(c, columns=["v"], order_by="d", descending=True)
    assert f2.names == ["v"] and list(f2["v"]) == [2, 4, 1, 3]


def test_corpus_validate_utf8(tmp_path):
    from csv_simd_tpu.errors import InvalidCsvFormat

    (tmp_path / "ok.csv").write_text("a,b\n1,2\n")
    (tmp_path / "bad.csv").write_bytes(b"a,b\n1,\xff\xfe\n")
    with pytest.raises(InvalidCsvFormat):
        CsvCorpus([str(tmp_path / "ok.csv"), str(tmp_path / "bad.csv")],
                  backend="golden", validate_utf8=True)
