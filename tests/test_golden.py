"""Golden-model tests: the NumPy oracle must reproduce the reference's own
verified expectations (SURVEY.md §8) on the reference fixtures."""

import numpy as np
import pytest

from csv_simd_tpu import golden
from csv_simd_tpu.config import (
    CODE_DELIM,
    CODE_ESCAPE,
    CODE_NEWLINE,
    CODE_QUOTE,
    CODE_SPACE,
    DEFAULT_DIALECT,
    Dialect,
    build_full_lut,
    build_nibble_luts,
)

# The reference's hardcoded tables, stage1.rs:24-35.
REF_LO = [4, 0, 16, 0, 0, 0, 0, 0, 0, 0, 1, 0, 10, 1, 0, 0]
REF_HI = [1, 0, 22, 0, 0, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]


def test_nibble_luts_match_reference():
    lo, hi = build_nibble_luts(DEFAULT_DIALECT)
    assert lo.tolist() == REF_LO
    assert hi.tolist() == REF_HI


def test_classification_codes():
    lut = build_full_lut()
    assert lut[0x0A] == CODE_NEWLINE
    assert lut[0x0D] == CODE_NEWLINE
    assert lut[0x2C] == CODE_DELIM
    assert lut[0x20] == CODE_SPACE
    assert lut[0x5C] == CODE_ESCAPE
    assert lut[0x22] == CODE_QUOTE
    others = [b for b in range(256) if b not in (0x0A, 0x0D, 0x2C, 0x20, 0x5C, 0x22)]
    assert all(lut[b] == 0 for b in others)


def test_custom_dialect_luts():
    # semicolon-delimited, single-quote quoted
    d = Dialect(delimiter=0x3B, quote=0x27)
    lut = build_full_lut(d)
    assert lut[0x3B] == CODE_DELIM
    assert lut[0x27] == CODE_QUOTE
    assert lut[0x2C] == 0  # plain comma no longer structural


def test_unrepresentable_dialect_rejected():
    # newlines (0x0A, 0x1D) share the NEWLINE code across low nibbles
    # {A, D} and high nibbles {0, 1}, so the cross products 0x1A and 0x0D
    # also classify as newline — a nibble-LUT collision the builder must
    # reject rather than silently misclassify.
    with pytest.raises(ValueError):
        build_nibble_luts(Dialect(newlines=(0x0A, 0x1D)))


def test_quote_mask_inclusive_parity():
    # '"ab",c' -> quote bits at 0 and 3
    data = np.frombuffer(b'"ab",c', dtype=np.uint8)
    codes = golden.classify(data)
    q = ((codes & CODE_QUOTE) != 0).astype(np.uint8)
    mask = golden.quote_mask(q)
    # opening quote inside, a,b inside, closing quote outside, rest outside
    assert mask.tolist() == [1, 1, 1, 0, 0, 0]


def test_quote_mask_carry():
    data = np.frombuffer(b'ab",c', dtype=np.uint8)  # starts inside a quote
    codes = golden.classify(data)
    q = ((codes & CODE_QUOTE) != 0).astype(np.uint8)
    mask = golden.quote_mask(q, carry_in=1)
    assert mask.tolist() == [1, 1, 0, 0, 0]


def test_escaped_quotes_parity():
    # RFC-4180 '""' toggles twice: comma after stays masked
    data = np.frombuffer(b'"a"",b"c', dtype=np.uint8)
    mask = golden.structural_mask(data)
    # the comma at offset 5 is inside quotes -> masked
    assert mask.tolist() == [0, 0, 0, 0, 0, 0, 0, 0]


def test_reader_test01_index(reader_test01):
    """The reference's own integration expectations (reader.rs:319-327):
    index[1] == 4 (first comma), index[-1] == 95 (final newline), and the
    survey-verified prefix [0,4,12,18,25,27,32,...]."""
    idx = golden.structural_index(reader_test01)
    assert idx[0] == 0
    assert idx[1] == 4
    assert idx[-1] == 95
    assert idx[:7].tolist() == [0, 4, 12, 18, 25, 27, 32]
    assert len(idx) == 17  # 16 structural chars + sentinel


def test_sample_rx_quoted_comma(sample_rx):
    """sample_rx.csv: 8 fields, CRLF, BOM; the comma inside
    '"INTERNAL MED, CARD. ELECTROPHYSIOLOGY"' must be masked, preserving
    stride 9 x 8 = 72 (+1 sentinel = 73 entries, SURVEY.md §8.2)."""
    idx = golden.structural_index(sample_rx)
    assert len(idx) == 73
    # every CRLF contributes two entries; commas inside quotes are absent
    data = np.frombuffer(sample_rx, dtype=np.uint8)
    for off in idx[1:]:
        assert data[off] in (0x2C, 0x0D, 0x0A)


def test_sample_csv_stride(sample_csv):
    idx = golden.structural_index(sample_csv)
    assert (len(idx) - 1) % 3 == 0
    assert (len(idx) - 1) // 3 == 15


def test_parity_out():
    assert golden.quote_parity_out(b'abc"def') == 1
    assert golden.quote_parity_out(b'abc"def"') == 0
    assert golden.quote_parity_out(b'abc"def', carry_in=1) == 0
