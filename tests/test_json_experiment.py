"""JSON experiment tests: the bitmask formulation (escape-aware string
masking + structural extraction + level sets) vs a direct scalar scanner,
on targeted escapes and fuzzed json.dumps documents."""

import json
import random

import numpy as np
import pytest

from csv_simd_tpu.experiments.json_levels import (
    json_structural_index,
    level_sets,
)

STRUCTURAL = set(b'{}[]:,')


def scalar_structural(data: bytes):
    """Direct reference scanner: structural chars outside strings."""
    out = []
    in_str = False
    escaped = False
    for i, b in enumerate(data):
        if in_str:
            if escaped:
                escaped = False
            elif b == 0x5C:
                escaped = True
            elif b == 0x22:
                in_str = False
        else:
            if b == 0x22:
                in_str = True
            elif b in STRUCTURAL:
                out.append(i)
    return np.array(out, dtype=np.int64)


CASES = [
    b"{}",
    b'{"a": 1, "b": [2, 3]}',
    b'{"s": "br{ace}s, and [colons]: inside"}',
    b'{"esc": "quote \\" inside"}',
    b'{"bs": "ends with backslash \\\\"}',
    b'{"bs2": "\\\\\\" still in string, here: yes"}',
    b'["\\\\", "\\"", "\\\\\\\\", {"k": "v"}]',
    b'{"deep": {"a": [{"b": [[]]}]}}',
    b"[1,2,3]",
    b"",
    b'"just a string with , and { inside"',
]


@pytest.mark.parametrize("data", CASES, ids=lambda d: repr(d)[:30])
def test_structural_matches_scanner(data):
    got = json_structural_index(data)
    want = scalar_structural(data)
    np.testing.assert_array_equal(got, want)


def test_fuzz_json_documents():
    rng = random.Random(11)

    def rand_value(depth=0):
        k = rng.random()
        if depth > 3 or k < 0.3:
            return rng.choice(
                [
                    rng.randint(-99, 99),
                    'str with \\ and " and {, : ]',
                    "plain",
                    True,
                    None,
                    'tricky\\"',
                    "\\",
                ]
            )
        if k < 0.65:
            return [rand_value(depth + 1) for _ in range(rng.randint(0, 4))]
        return {
            f"k{i}\\\"x": rand_value(depth + 1)
            for i in range(rng.randint(0, 4))
        }

    for _ in range(200):
        doc = json.dumps(rand_value()).encode()
        np.testing.assert_array_equal(
            json_structural_index(doc), scalar_structural(doc), err_msg=doc
        )


def test_level_sets():
    data = b'{"a": [1, {"b": 2}]}'
    ls = level_sets(data)
    offsets = [o for o, _ in ls]
    np.testing.assert_array_equal(offsets, scalar_structural(data))
    depths = dict(ls)
    assert depths[0] == 0            # outer { at depth 0
    assert depths[len(data) - 1] == 0  # outer } back to 0
    assert depths[6] == 1            # [ at depth 1
    # balanced: ends at depth 0
    assert ls[-1][1] == 0
