"""Device window executor vs the host oracle (VERDICT r3 item 4).

Every query runs twice over the same frame: once with the device
path forced (DEVICE_WINDOW_MIN_ROWS=1) and once with it disabled
(threshold above n) — results must match exactly. A spy asserts the
device path really ran (not a silent fallback)."""

import numpy as np
import pytest

import csv_simd_tpu.window as W
from csv_simd_tpu.sql import sql


def _mk_csv(n=900, seed=5):
    rng = np.random.default_rng(seed)
    grp = rng.choice([b"aa", b"bb", b"cc", b"dd"], n)
    sub = rng.integers(0, 3, n)
    qty = rng.integers(-500, 500, n)
    fv = rng.integers(-100, 100, n) / 4.0  # f32-exact
    rows = []
    for i in range(n):
        q = b"oops" if i % 37 == 0 else str(qty[i]).encode()
        f = b"bad" if i % 53 == 0 else repr(fv[i]).encode()
        rows.append(b"%s,%d,%s,%s,t%03d" % (grp[i], sub[i], q, f, i % 97))
    return b"grp,sub,qty,fv,tag\n" + b"\n".join(rows) + b"\n"


CSV = _mk_csv()
S = {"qty": "int32", "fv": "float", "sub": "int32"}

QUERIES = [
    "SELECT tag, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY qty) AS x"
    " FROM t",
    "SELECT tag, RANK() OVER (PARTITION BY grp ORDER BY qty) AS x,"
    " DENSE_RANK() OVER (PARTITION BY grp ORDER BY qty DESC) AS y FROM t",
    "SELECT tag, SUM(qty) OVER (PARTITION BY grp) AS s,"
    " COUNT(qty) OVER (PARTITION BY grp) AS c,"
    " COUNT(*) OVER (PARTITION BY grp) AS n,"
    " AVG(qty) OVER (PARTITION BY grp) AS m FROM t",
    "SELECT tag, SUM(qty) OVER (PARTITION BY grp ORDER BY qty) AS s"
    " FROM t",
    "SELECT tag, MIN(qty) OVER (PARTITION BY grp ORDER BY sub) AS lo,"
    " MAX(qty) OVER (PARTITION BY grp ORDER BY sub) AS hi FROM t",
    "SELECT tag, MIN(fv) OVER (PARTITION BY grp) AS lo,"
    " MAX(fv) OVER (PARTITION BY grp ORDER BY qty) AS hi FROM t",
    "SELECT tag, LAG(tag) OVER (PARTITION BY grp ORDER BY qty) AS p,"
    " LEAD(qty, 2) OVER (PARTITION BY grp ORDER BY qty) AS nx FROM t",
    # multi-key partition AND multi-key order, mixed direction
    "SELECT tag, ROW_NUMBER() OVER (PARTITION BY grp, sub"
    " ORDER BY qty DESC, tag) AS x, SUM(qty) OVER (PARTITION BY grp,"
    " sub ORDER BY qty DESC, tag) AS s FROM t",
    # no partition
    "SELECT tag, SUM(qty) OVER (ORDER BY qty) AS s,"
    " ROW_NUMBER() OVER (ORDER BY qty DESC) AS rn FROM t",
    # window over a computed value / text order key
    "SELECT tag, AVG(qty) OVER (PARTITION BY grp ORDER BY tag) AS m"
    " FROM t",
    # round-5: float SUM/AVG ride the compensated double-f32 scan
    "SELECT tag, SUM(fv) OVER (PARTITION BY grp) AS s,"
    " AVG(fv) OVER (PARTITION BY grp ORDER BY qty) AS m FROM t",
    "SELECT tag, SUM(fv) OVER (PARTITION BY grp ORDER BY qty"
    " ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS s FROM t",
    # round-5: bounded ROWS MIN/MAX (sparse-table range extrema) and
    # the suffix-scan shape (bounded below, unbounded above)
    "SELECT tag, MIN(qty) OVER (PARTITION BY grp ORDER BY sub"
    " ROWS BETWEEN 3 PRECEDING AND 2 FOLLOWING) AS lo,"
    " MAX(qty) OVER (PARTITION BY grp ORDER BY sub"
    " ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS hi FROM t",
    "SELECT tag, MAX(fv) OVER (PARTITION BY grp ORDER BY qty"
    " ROWS BETWEEN 1 PRECEDING AND 3 FOLLOWING) AS hi,"
    " MIN(fv) OVER (PARTITION BY grp ORDER BY qty"
    " ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS lo FROM t",
    "SELECT tag, MIN(qty) OVER (PARTITION BY grp ORDER BY qty DESC"
    " ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nx FROM t",
    # round-5: percent_rank / cume_dist
    "SELECT tag, PERCENT_RANK() OVER (PARTITION BY grp ORDER BY qty)"
    " AS pr, CUME_DIST() OVER (PARTITION BY grp ORDER BY qty) AS cd"
    " FROM t",
]


def _vals(fr, name):
    out = []
    col = fr[name]
    okm = fr._ok.get(name)
    for i, v in enumerate(col):
        if okm is not None and not okm[i]:
            out.append(None)
        elif v is None:
            out.append(None)
        elif isinstance(v, float) and v != v:
            out.append(None)
        elif isinstance(v, (bytes, str)):
            out.append(v if isinstance(v, str) else v.decode())
        elif isinstance(v, float) or str(
                getattr(v, "dtype", "")).startswith("float"):
            out.append(round(float(v), 9))
        else:
            out.append(int(v))
    return out


@pytest.mark.parametrize("q", QUERIES)
def test_device_matches_host(q, monkeypatch):
    calls = {"n": 0}
    real = W.window_column

    def spy(*a, **k):
        r = real(*a, **k)
        if r is not None:
            calls["n"] += 1
        return r

    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 1)
    monkeypatch.setattr(W, "window_column", spy)
    # sql._device_window_column imports window_column inside the call,
    # so the monkeypatch takes effect
    dev = sql(q, CSV, schema=S)

    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 10**9)
    host = sql(q, CSV, schema=S)

    assert calls["n"] >= 1, "device window path never ran"
    assert dev.names == host.names
    for name in dev.names:
        assert _vals(dev, name) == _vals(host, name), (q, name)


def test_float_sum_runs_on_device(monkeypatch):
    """Round 4's float-sum fallback is gone: SUM(float) OVER rides the
    compensated double-f32 scan on the device plan (VERDICT r4 #4)."""
    calls = {"n": 0}
    real = W.window_column

    def spy(*a, **k):
        r = real(*a, **k)
        if r is not None:
            calls["n"] += 1
        return r

    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 1)
    monkeypatch.setattr(W, "window_column", spy)
    fr = sql("SELECT SUM(fv) OVER (PARTITION BY grp) AS s FROM t",
             CSV, schema=S)
    assert calls["n"] >= 1, "float SUM did not take the device plan"
    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 10**9)
    want = sql("SELECT SUM(fv) OVER (PARTITION BY grp) AS s FROM t",
               CSV, schema=S)
    assert _vals(fr, "s") == _vals(want, "s")


def test_float_sum_non_f32_exact_falls_back(monkeypatch):
    """Values that are not exactly float32-representable keep the host
    float64 path (the pair scan would quantize them)."""
    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 1)
    n = 40
    part = np.zeros(n, np.int32)
    vals = np.full(n, 0.1, np.float64)  # 0.1 is not f32-exact
    r = W.window_column("sum", n, [(part, None)], [], vals, None,
                        is_int=False)
    assert r is None


def test_huge_partition_guard(monkeypatch):
    """A partition at the 2**20 exactness bound must fall back (the
    digit cumsum would overflow) — checked via the eligibility helper
    directly so the test stays fast."""
    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 1)
    monkeypatch.setattr(W, "_MAX_EXACT_PARTITION", 256)
    n = 300
    part = np.zeros(n, np.int32)
    vals = np.ones(n, np.int32)
    r = W.window_column("sum", n, [(part, None)], [], vals, None,
                        is_int=True)
    assert r is None
    r2 = W.window_column("count", n, [(part, None)], [], vals, None,
                         is_int=True)
    assert r2 is not None  # counts have no exactness cliff


@pytest.mark.parametrize("n", [1, 2, 3])
def test_tiny_frames_device(n, monkeypatch):
    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 1)
    csv = b"g,v\n" + b"".join(b"%d,%d\n" % (i % 2, i) for i in range(n))
    fr = sql("SELECT ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS r,"
             " SUM(v) OVER (PARTITION BY g) AS s FROM t", csv,
             schema={"g": "int32", "v": "int32"})
    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 10**9)
    want = sql("SELECT ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS"
               " r, SUM(v) OVER (PARTITION BY g) AS s FROM t", csv,
               schema={"g": "int32", "v": "int32"})
    assert _vals(fr, "r") == _vals(want, "r")
    assert _vals(fr, "s") == _vals(want, "s")


def test_all_null_values_and_keys(monkeypatch):
    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 1)
    csv = (b"g,v\n"
           b"1,x\n1,y\n2,z\n2,w\n")  # every v fails the int parse
    q = ("SELECT SUM(v) OVER (PARTITION BY g) AS s, "
         "COUNT(v) OVER (PARTITION BY g) AS c, "
         "MIN(v) OVER (PARTITION BY g ORDER BY g) AS lo FROM t")
    fr = sql(q, csv, schema={"g": "int32", "v": "int32"})
    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 10**9)
    want = sql(q, csv, schema={"g": "int32", "v": "int32"})
    for nm in ("s", "c", "lo"):
        assert _vals(fr, nm) == _vals(want, nm)


def test_order_key_all_null(monkeypatch):
    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 1)
    csv = b"g,o,v\n1,x,10\n1,y,20\n1,z,30\n"  # o always parse-fails
    q = ("SELECT ROW_NUMBER() OVER (PARTITION BY g ORDER BY o) AS r,"
         " SUM(v) OVER (PARTITION BY g ORDER BY o) AS s FROM t")
    sch = {"g": "int32", "o": "int32", "v": "int32"}
    fr = sql(q, csv, schema=sch)
    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 10**9)
    want = sql(q, csv, schema=sch)
    assert _vals(fr, "r") == _vals(want, "r")
    assert _vals(fr, "s") == _vals(want, "s")


def test_percent_rank_cume_dist_semantics(monkeypatch):
    """Standard definitions against a hand-computed oracle, on BOTH
    executors: PERCENT_RANK = (rank-1)/(size-1) (0.0 for size-1
    partitions), CUME_DIST = peers-through-current / size."""
    csv = b"g,v\n" + b"".join(
        b"%s,%d\n" % (g, v)
        for g, v in [(b"a", 3), (b"a", 1), (b"a", 3), (b"a", 7),
                     (b"b", 5), (b"c", 2), (b"c", 2)])
    q = ("SELECT g, v, PERCENT_RANK() OVER (PARTITION BY g ORDER BY v)"
         " AS pr, CUME_DIST() OVER (PARTITION BY g ORDER BY v) AS cd"
         " FROM t")
    want = {  # (g, v) -> (pr, cd), computed by hand
        ("a", 1): (0.0, 0.25), ("a", 3): (1 / 3, 0.75),
        ("a", 7): (1.0, 1.0), ("b", 5): (0.0, 1.0),
        ("c", 2): (0.0, 1.0),
    }
    for minrows in (1, 10**9):
        monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", minrows)
        r = sql(q, csv, schema={"v": "int32"})
        for g, v, pr, cd in zip(r["g"], r["v"], r["pr"], r["cd"]):
            wpr, wcd = want[(str(g), int(v))]
            assert float(pr) == wpr and float(cd) == wcd, (g, v, minrows)
