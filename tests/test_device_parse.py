"""Device-side typed parsing & filtering tests: vectorised atoi/atof and
equality filters over gathered columns, differential vs Python parsing."""

import numpy as np
import pytest

from csv_simd_tpu import create_from_bytes
from csv_simd_tpu.device_tape import DeviceTape


def _tape(rows):
    data = ("\n".join(rows) + "\n").encode()
    return DeviceTape.from_tape(create_from_bytes(data, backend="golden"))


def test_column_int32():
    dt = _tape(["id,v", "1,42", "2,-17", "3,0", "4,2147483647", "5, 88"])
    vals, ok = dt.column_int32(1)
    np.testing.assert_array_equal(np.asarray(ok), [True] * 5)
    np.testing.assert_array_equal(
        np.asarray(vals), [42, -17, 0, 2147483647, 88]
    )


def test_column_int32_malformed():
    dt = _tape(["id,v", "1,42", "2,abc", "3,", "4,1.5", "5,+7"])
    vals, ok = dt.column_int32(1)
    np.testing.assert_array_equal(np.asarray(ok), [True, False, False, False, True])
    assert np.asarray(vals)[0] == 42 and np.asarray(vals)[4] == 7


def test_column_float32():
    rows = ["id,v", "1,3.5", "2,-0.25", "3,100", "4,2.", "5,.5", "6, 7.125"]
    dt = _tape(rows)
    vals, ok = dt.column_float32(1)
    expect = [3.5, -0.25, 100.0, 2.0, 0.5, 7.125]
    np.testing.assert_array_equal(np.asarray(ok), [True] * 6)
    np.testing.assert_allclose(np.asarray(vals), expect, rtol=1e-6)


def test_column_float32_malformed():
    dt = _tape(["id,v", "1,1e5", "2,1.2.3", "3,nope", "4,8"])
    vals, ok = dt.column_float32(1)
    np.testing.assert_array_equal(np.asarray(ok), [False, False, False, True])
    assert np.asarray(vals)[3] == 8.0


def test_column_int_random_differential():
    rng = np.random.default_rng(5)
    nums = rng.integers(-(2**31) + 1, 2**31 - 1, 300)
    rows = ["a,b"] + [f"{i},{v}" for i, v in enumerate(nums)]
    dt = _tape(rows)
    vals, ok = dt.column_int32(1)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(vals), nums.astype(np.int32))


def test_filter_equals():
    dt = _tape(["k,v", "x,1", "y,2", "x,3", "z,4", "x,5"])
    hits = dt.filter_equals(0, b"x")
    np.testing.assert_array_equal(hits, [0, 2, 4])
    assert dt.filter_equals(0, b"nope").size == 0
    # prefix must not match
    hits = dt.filter_equals(0, b"x" + b"x")
    assert hits.size == 0


def test_int32_overflow_edges():
    dt = _tape(
        [
            "a,b",
            "0,-2147483648",   # INT32_MIN: exact, accepted
            "1,2147483648",    # INT32_MAX+1: rejected
            "2,9999999999",    # wraps: rejected
            "3,-6442450944",   # aliases INT32_MIN mod 2^32: rejected
            "4,2147483647",    # INT32_MAX: accepted
        ]
    )
    vals, ok = dt.column_int32(1)
    np.testing.assert_array_equal(
        np.asarray(ok), [True, False, False, False, True]
    )
    assert np.asarray(vals)[0] == -(2**31)
    assert np.asarray(vals)[4] == 2**31 - 1


def test_column_date_days():
    import datetime

    rows = [
        b"1970-01-01", b"2026-08-17", b"2000-02-29", b"1969-12-31",
        b"0001-01-01", b"9999-12-31", b"2023-02-29", b"2024-13-01",
        b"2024-00-10", b"24-01-01", b"2024/01/01", b"x024-01-01",
    ]
    data = b"d,x\n" + b"".join(r + b",1\n" for r in rows)
    from csv_simd_tpu import create_from_bytes
    from csv_simd_tpu.device_tape import DeviceTape

    tape = create_from_bytes(data, backend="golden")
    dt = DeviceTape.from_tape(tape)
    days, ok = dt.column_date_days(0)
    days, ok = np.asarray(days), np.asarray(ok)
    assert ok[:6].all() and not ok[6:].any(), ok
    epoch = datetime.date(1970, 1, 1)
    for i in range(6):
        want = (datetime.date.fromisoformat(rows[i].decode()) - epoch).days
        assert days[i] == want, (rows[i], days[i], want)


def test_column_datetime64_differential():
    import datetime

    good = [
        b"1970-01-01 00:00:00", b"2026-08-17T13:45:09",
        b"2000-02-29 23:59:59", b"1969-12-31T23:59:59",
        b"2024-06-01 12:00:00Z", b"0001-01-01T00:00:00",
    ]
    data = b"t,x\n" + b"".join(r + b",1\n" for r in good)
    from csv_simd_tpu import create_from_bytes
    from csv_simd_tpu.device_tape import DeviceTape

    dt = DeviceTape.from_tape(create_from_bytes(data, backend="golden"))
    vals, ok = dt.column_datetime64(0, unit="s")
    assert ok.all(), ok
    for i, r in enumerate(good):
        txt = r.decode().replace("T", " ").rstrip("Z")
        want = datetime.datetime.fromisoformat(txt).replace(
            tzinfo=datetime.timezone.utc
        ).timestamp()
        assert vals[i] == int(want), (r, vals[i], want)


def test_column_datetime64_fractions_and_rejects():
    rows = [
        b"2024-01-02 03:04:05.123",   # ms
        b"2024-01-02 03:04:05.5",     # 500 ms
        b"2024-01-02 03:04:05.123456",  # us precision
        b"2024-01-02 03:04:05",
        b"2024-01-02 03:04:05.1234",  # > ms at unit=ms
        b"2024-02-30 03:04:05",       # bad civil date
        b"2024-01-02 24:00:00",       # bad hour
        b"2024-01-02 03:60:00",       # bad minute
        b"2024-01-0203:04:05",        # missing separator
        b"2024-01-02 03:04:05+01:00", # tz offset unsupported
        b"2024-01-02 03:04:05.",      # dot with no digits
    ]
    data = b"t,x\n" + b"".join(r + b",1\n" for r in rows)
    from csv_simd_tpu import create_from_bytes
    from csv_simd_tpu.device_tape import DeviceTape

    dt = DeviceTape.from_tape(create_from_bytes(data, backend="golden"))
    base = 1704164645000  # 2024-01-02 03:04:05 UTC in ms
    vals, ok = dt.column_datetime64(0, unit="ms")
    np.testing.assert_array_equal(
        ok, [True, True, False, True] + [False] * 7
    )
    assert vals[0] == base + 123 and vals[1] == base + 500
    assert vals[3] == base
    # at unit=s any fraction refuses; at unit=us all three parse
    _, ok_s = dt.column_datetime64(0, unit="s")
    np.testing.assert_array_equal(ok_s[:4], [False, False, False, True])
    vals_us, ok_us = dt.column_datetime64(0, unit="us")
    np.testing.assert_array_equal(ok_us[:5], [True] * 5)
    assert vals_us[2] == base * 1000 + 123456
    assert vals_us[4] == base * 1000 + 123400


def test_column_datetime64_packed_and_frame():
    from csv_simd_tpu import PackedDeviceTape, read_typed

    data = (b"t,n\n2024-01-02 03:04:05,1\n2024-01-02T03:04:06.250,2\n")
    pt = PackedDeviceTape(data)
    vals, ok = pt.column_datetime64(0, unit="ms")
    assert ok.all() and vals[1] - vals[0] == 1250

    f = read_typed(data)
    assert f.schema["t"].type == "datetime"
    assert f.schema["t"].unit == "ms"
    assert f["t"].dtype == np.dtype("datetime64[ms]")
    assert str(f["t"][0]) == "2024-01-02T03:04:05.000"
    f2 = read_typed(data, {"t": "datetime:us"})
    assert f2["t"].dtype == np.dtype("datetime64[us]")


def test_column_decimal64_basic():
    rows = ["id,price", "1,12.34", "2,-0.05", "3,100", "4,7.5",
            "5,.25", "6,3.", "7, 9.99", "8,+1.01"]
    dt = _tape(rows)
    vals, ok = dt.column_decimal64(1, scale=2)
    np.testing.assert_array_equal(ok, [True] * 8)
    np.testing.assert_array_equal(
        vals, [1234, -5, 10000, 750, 25, 300, 999, 101]
    )


def test_column_decimal64_rejects():
    # exactness contract: too many frac digits, exponent, garbage,
    # >18 significant digits
    rows = ["id,v", "1,1.234", "2,1e3", "3,abc", "4,12..3",
            "5,9999999999999999999", "6,1.23"]
    dt = _tape(rows)
    vals, ok = dt.column_decimal64(1, scale=2)
    np.testing.assert_array_equal(ok, [False, False, False, False, False, True])
    assert vals[5] == 123


def test_column_decimal64_18_digits_exact():
    big = 10**18 - 1  # 18 nines: the documented ceiling
    rows = ["id,v", f"1,{big}", f"2,-{big}", f"3,{10**18}"]
    dt = _tape(rows)
    vals, ok = dt.column_decimal64(1, scale=0)
    np.testing.assert_array_equal(ok, [True, True, False])
    np.testing.assert_array_equal(vals[:2], [big, -big])


def test_column_decimal64_differential_host_oracle():
    from csv_simd_tpu.decode import DecodedView

    rng = np.random.default_rng(12)
    cells = []
    for _ in range(400):
        kind = rng.integers(0, 6)
        if kind == 0:
            cells.append(str(rng.integers(-10**9, 10**9)))
        elif kind == 1:
            cells.append(f"{rng.integers(-10**6, 10**6)}.{rng.integers(0, 100):02d}")
        elif kind == 2:
            cells.append(f"{rng.integers(0, 10)}.{rng.integers(0, 10**4)}")  # maybe >2 frac
        elif kind == 3:
            cells.append(str(rng.integers(0, 10**17)))
        elif kind == 4:
            cells.append(" " + str(rng.integers(-99, 99)) + ".5")
        else:
            cells.append(rng.choice(["", "x", "1e2", ".", "-", "1.2.3"]))
    rows = ["a,b"] + [f"{i},{c}" for i, c in enumerate(cells)]
    dt = _tape(rows)
    vals, ok = dt.column_decimal64(1, scale=2)
    tape = create_from_bytes(("\n".join(rows) + "\n").encode(), backend="golden")
    want_vals, want_ok = DecodedView(tape).column_decimal(1, scale=2)
    np.testing.assert_array_equal(ok, want_ok)
    np.testing.assert_array_equal(vals, want_vals)


def test_column_decimal64_packed_tape():
    from csv_simd_tpu.offsetfree import PackedDeviceTape

    rows = ["id,amt", "1,5.25", "2,-12.00", "3,bad.x"]
    data = ("\n".join(rows) + "\n").encode()
    pt = PackedDeviceTape(data)
    vals, ok = pt.column_decimal64(1, scale=2)
    np.testing.assert_array_equal(ok, [True, True, False])
    np.testing.assert_array_equal(vals, [525, -1200, 0])


def test_float32_rejects_digitless():
    """'.', '-.', '+.', ' .' are not numbers: ok=False (the same
    n_digits guard the exp-float and decimal parsers always had)."""
    from csv_simd_tpu.frame import _resolve_tape

    csv = b"v\n.\n-.\n+.\n .\n1.\n.5\n2\n"
    tape, _ = _resolve_tape(csv, None, "auto", "offsets", False)
    vals, ok = tape.column_float32(0)
    assert list(np.asarray(ok, bool)) == [
        False, False, False, False, True, True, True
    ]
    assert np.asarray(vals)[4:].tolist() == [1.0, 0.5, 2.0]
    # exp variant agrees
    vals, ok = tape.column_float32_exp(0)
    assert list(np.asarray(ok, bool))[:4] == [False] * 4


def test_filter_equals_rejects_long_needle():
    """A needle longer than max_len must raise, not silently compare
    the truncated window (which would false-positive on any field
    sharing the prefix + true length)."""
    import pytest

    from csv_simd_tpu.frame import _resolve_tape

    csv = b"v\nabcdYY\nabcdXX\n"
    tape, _ = _resolve_tape(csv, None, "auto", "offsets", False)
    with pytest.raises(ValueError, match="max_len"):
        tape.filter_equals(0, b"abcdXX", max_len=4)
    hits = tape.filter_equals(0, b"abcdXX", max_len=8)
    assert hits.tolist() == [1]


def test_datetime_window_too_small_raises():
    import pytest

    from csv_simd_tpu.frame import _resolve_tape

    csv = b"t\n2024-01-02 03:04:05\n"
    tape, _ = _resolve_tape(csv, None, "auto", "offsets", False)
    with pytest.raises(ValueError, match=">= 21"):
        tape.column_datetime64(0, max_len=20)
