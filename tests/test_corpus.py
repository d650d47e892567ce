"""RFC-4180 conformance: every corpus case must (a) build a tape whose
index matches the golden oracle under every backend, and (b) serve fields
that agree with Python's csv module on unambiguous cases (differential
oracle the reference never had, SURVEY.md §4)."""

import csv as pycsv
import io

import numpy as np
import pytest

from csv_simd_tpu import InvalidCsvFormat, create_from_bytes, golden
from csv_simd_tpu.index import build_index

from corpus import all_cases, basic_cases

CASES = all_cases()
IDS = [c.name for c in CASES]


@pytest.mark.parametrize("case", CASES, ids=IDS)
def test_jnp_index_matches_golden(case):
    want = golden.structural_index(case.data)
    got = build_index(case.data, backend="jnp")
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("case", CASES, ids=IDS)
def test_tape_build(case):
    if case.should_build:
        tape = create_from_bytes(case.data, backend="golden")
        assert tape.record_cnt >= 1
    else:
        with pytest.raises(InvalidCsvFormat):
            create_from_bytes(case.data, backend="golden")


@pytest.mark.parametrize(
    "case", [c for c in basic_cases() if c.should_build], ids=lambda c: c.name
)
def test_differential_vs_python_csv(case):
    """For well-formed inputs, our raw field slices must equal Python csv's
    parse after applying its unquote/unescape — i.e. unquoting our slice
    yields csv's value. Skips cases whose semantics legitimately differ
    (our slices preserve whitespace/quotes by design)."""
    if case.name == "unterminated_quote_masks_rest":
        pytest.skip("malformed by construction")
    if case.name == "mac_cr_endings":
        pytest.skip("python csv's \\r-only handling differs by design")
    text = case.data.decode("utf-8")
    if text.startswith("﻿"):
        text = text[1:]
    rows = list(pycsv.reader(io.StringIO(text)))
    tape = create_from_bytes(case.data, backend="golden")
    assert tape.num_data_records == len(rows) - 1
    for r in range(tape.num_data_records):
        for f in range(tape.field_cnt):
            raw = tape.seek_field(r, f).decode("utf-8")
            expect = rows[r + 1][f]
            # our slices are raw: strip RFC-4180 quoting to compare
            val = raw
            if val.startswith('"') and val.endswith('"') and len(val) >= 2:
                val = val[1:-1].replace('""', '"')
            assert val == expect, (case.name, r, f, raw, expect)
