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
