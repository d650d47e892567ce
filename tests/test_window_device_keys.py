"""Device-side key factorization (VERDICT r4 item 3): a window/setop
over read_typed's device-resident int columns must build its sort
codes ON DEVICE — host factorize_key must NOT run for those keys, and
no O(n) host array may ship for them."""

import numpy as np
import pytest

import csv_simd_tpu.window as W
from csv_simd_tpu.frame import read_typed
from csv_simd_tpu.sql import sql


def _mk_csv(n=600, seed=3):
    rng = np.random.default_rng(seed)
    grp = rng.integers(0, 5, n)
    qty = rng.integers(-900, 900, n)
    rows = []
    for i in range(n):
        q = b"oops" if i % 13 == 0 else str(qty[i]).encode()
        rows.append(b"%d,%s,t%03d" % (grp[i], q, i))
    return b"grp,qty,tag\n" + b"\n".join(rows) + b"\n"


CSV = _mk_csv()
S = {"grp": "int32", "qty": "int32"}


def test_factorize_key_device_matches_host():
    """Bit-identical codes host vs device over every (desc,
    nulls_first) combination, including NULL rows."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    v = rng.integers(-5000, 5000, 4000).astype(np.int32)
    ok = rng.random(4000) > 0.1
    dv, dok = jnp.asarray(v), jnp.asarray(ok)
    for desc in (False, True):
        for nf in (False, True):
            host = W.factorize_key(v, ok, desc=desc, nulls_first=nf)
            got = W.factorize_key_device(dv, dok, desc=desc,
                                         nulls_first=nf)
            assert got is not None
            codes, bound = got
            assert np.array_equal(np.asarray(codes), host), (desc, nf)
            assert int(host.max()) < bound


def test_factorize_key_device_all_null():
    import jax.numpy as jnp

    v = jnp.zeros(64, jnp.int32)
    ok = jnp.zeros(64, bool)
    codes, bound = W.factorize_key_device(v, ok)
    assert np.array_equal(np.asarray(codes),
                          W.factorize_key(np.zeros(64, np.int32),
                                          np.zeros(64, bool)))
    assert bound == 1


def test_factorize_key_device_span_overflow_bails():
    import jax.numpy as jnp

    v = jnp.asarray(np.array([-(2**31), 2**31 - 1], np.int32))
    assert W.factorize_key_device(v, None) is None


def test_window_keys_never_touch_host(monkeypatch):
    """SUM/RANK OVER device-resident int keys: the host factorizer
    must not run; results must match the host executor exactly."""
    fr = read_typed(CSV, schema=S)  # the frame sql builds internally
    assert "grp" in fr._dev and "qty" in fr._dev

    host_calls = []
    real_host = W.factorize_key

    def spy_host(*a, **k):
        host_calls.append(1)
        return real_host(*a, **k)

    dev_calls = []
    real_dev = W.factorize_key_device

    def spy_dev(*a, **k):
        dev_calls.append(1)
        return real_dev(*a, **k)

    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 1)
    monkeypatch.setattr(W, "factorize_key", spy_host)
    monkeypatch.setattr(W, "factorize_key_device", spy_dev)

    q = ("SELECT tag, SUM(qty) OVER (PARTITION BY grp ORDER BY qty)"
         " AS s, RANK() OVER (PARTITION BY grp ORDER BY qty DESC) AS r"
         " FROM t")
    dev = sql(q, CSV, schema=S)
    assert not host_calls, "host factorize_key ran for device keys"
    assert dev_calls, "device factorization never ran"

    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 10**9)
    host = sql(q, CSV, schema=S)
    for name in dev.names:
        a = [None if v is None else v for v in dev[name]]
        b = [None if v is None else v for v in host[name]]
        assert list(map(str, a)) == list(map(str, b)), name


def test_text_keys_still_host(monkeypatch):
    """Text keys keep the host np.unique path (no device codes) and
    still produce correct results."""
    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 1)
    q = ("SELECT tag, ROW_NUMBER() OVER (PARTITION BY tag ORDER BY"
         " qty) AS rn FROM t")
    dev = sql(q, CSV, schema=S)
    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 10**9)
    host = sql(q, CSV, schema=S)
    assert list(dev["rn"]) == list(host["rn"])
