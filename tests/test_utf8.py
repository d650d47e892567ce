"""UTF-8 validation tests: targeted RFC 3629 edges + differential fuzz
against Python's decoder (the capability the reference's dead
avx/utf8check.rs represented, SURVEY.md §2.3)."""

import random

import pytest

from csv_simd_tpu.ops.utf8 import is_ascii, validate_utf8


def _py_valid(b: bytes) -> bool:
    try:
        b.decode("utf-8")
        return True
    except UnicodeDecodeError:
        return False


EDGES = [
    (b"", True),
    (b"hello", True),
    ("héllo wörld".encode(), True),
    ("日本語テキスト".encode(), True),
    ("emoji \U0001f389".encode(), True),
    (b"\xed\x9f\xbf", True),        # U+D7FF, last before surrogates
    (b"\xee\x80\x80", True),        # U+E000, first after surrogates
    (b"\xf4\x8f\xbf\xbf", True),    # U+10FFFF max
    (b"\x80", False),               # lone continuation
    (b"\xbf", False),
    (b"\x80\x80", False),
    (b"\xc0\x80", False),           # overlong 2
    (b"\xc1\xbf", False),
    (b"\xe0\x80\x80", False),       # overlong 3
    (b"\xe0\x9f\xbf", False),
    (b"\xed\xa0\x80", False),       # surrogate
    (b"\xf0\x80\x80\x80", False),   # overlong 4
    (b"\xf0\x8f\xbf\xbf", False),
    (b"\xf4\x90\x80\x80", False),   # > U+10FFFF
    (b"\xf5\x80\x80\x80", False),
    (b"\xe2\x82", False),           # truncated 3
    (b"\xf0\x9f\x98", False),       # truncated 4
    (b"a\xc3", False),              # truncated 2
    (b"ok\xff", False),
    (b"\xfe", False),
]


@pytest.mark.parametrize("data,want", EDGES, ids=lambda v: repr(v)[:24])
def test_edges(data, want):
    if isinstance(data, bool):
        pytest.skip("id param")
    assert validate_utf8(data) == want == _py_valid(data)


def test_fuzz_random_bytes():
    rng = random.Random(7)
    for _ in range(2000):
        b = bytes(rng.randint(0, 255) for _ in range(rng.randint(0, 48)))
        assert validate_utf8(b) == _py_valid(b), b.hex()


def test_fuzz_valid_strings():
    rng = random.Random(8)
    for _ in range(400):
        s = "".join(chr(rng.randint(1, 0x10FFFF)) for _ in range(rng.randint(0, 24)))
        s = "".join(ch for ch in s if not 0xD800 <= ord(ch) < 0xE000)
        assert validate_utf8(s.encode("utf-8"))


def test_is_ascii():
    assert is_ascii(b"plain text 123")
    assert not is_ascii("café".encode())
    assert is_ascii(b"")


def test_iter_records(sample_csv):
    from csv_simd_tpu import create_from_bytes

    tape = create_from_bytes(sample_csv, backend="golden")
    recs = list(tape)
    assert len(recs) == len(tape) == tape.num_data_records
    assert recs[0] == tape.seek_record(0)
    rows = list(tape.iter_rows())
    assert rows[0][2] == tape.seek_field(0, 2)


# -- round 2: device validation + the opt-in create gate --

def test_validate_utf8_device_matches_host():
    import jax.numpy as jnp

    from csv_simd_tpu.ops.utf8 import validate_utf8, validate_utf8_device

    cases = [
        "plain ascii".encode(),
        "héllo wörld ©®™".encode(),
        "日本語テキスト𝄞".encode(),
        b"\xff\xfe bad",
        b"ok \xc3\x28 overlong-ish",   # invalid continuation
        b"trunc \xe6\x97",             # truncated 3-byte at end
        "edge߿ࠀ￿".encode() + "\U0010FFFF".encode(),
        b"\xed\xa0\x80",               # surrogate
        b"\xf4\x90\x80\x80",           # > U+10FFFF
    ]
    for c in cases:
        import numpy as np

        arr = np.frombuffer(c, dtype=np.uint8)
        assert validate_utf8_device(arr) == validate_utf8(arr), c


def test_create_validate_utf8_flag():
    import pytest

    from csv_simd_tpu import create_from_bytes
    from csv_simd_tpu.errors import InvalidCsvFormat

    good = "a,b\n1,héllo\n".encode()
    t = create_from_bytes(good, backend="golden", validate_utf8=True)
    assert t.seek_field(0, 1) == "héllo".encode()
    bad = b"a,b\n1,\xff\xfe\n"
    with pytest.raises(InvalidCsvFormat, match="UTF-8"):
        create_from_bytes(bad, backend="golden", validate_utf8=True)
    # without the flag the bytes pass through untouched (reference
    # behavior: from_utf8_unchecked, record_source.rs:135-139)
    t2 = create_from_bytes(bad, backend="golden")
    assert t2.seek_field(0, 1) == b"\xff\xfe"


def test_packed_tape_validate_utf8():
    import pytest

    from csv_simd_tpu.errors import InvalidCsvFormat
    from csv_simd_tpu.offsetfree import PackedDeviceTape

    good = "a,b\n1,héllo\n".encode()
    pt = PackedDeviceTape(good, validate_utf8=True)
    assert int(pt.record_cnt) == 2
    with pytest.raises(InvalidCsvFormat, match="UTF-8"):
        PackedDeviceTape(b"a,b\n1,\xff\xfe\n", validate_utf8=True)
