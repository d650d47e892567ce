"""RFC-4180 conformance corpus generator.

The reference's test oracle is essentially two byte offsets on one fixture
(SURVEY.md §4); this corpus is the coverage it lacked: quoted commas,
quoted newlines, escaped double-quotes, CRLF/LF, BOM, long runs crossing
every blocking boundary (64 B reference blocks, 128-lane rows, kernel
tiles), plus uniform-stride error cases.

Each case is (name, bytes, should_build) where should_build=False means the
full tape build must raise InvalidCsvFormat (ragged rows) while the raw
structural index is still well-defined.
"""

from __future__ import annotations

import dataclasses
import random
from typing import List


@dataclasses.dataclass
class Case:
    name: str
    data: bytes
    should_build: bool = True


def _table(rows: List[List[str]], newline: str = "\n", bom: bool = False) -> bytes:
    text = newline.join(",".join(r) for r in rows) + newline
    raw = text.encode("utf-8")
    return (b"\xef\xbb\xbf" + raw) if bom else raw


def basic_cases() -> List[Case]:
    cases = []
    cases.append(
        Case("plain_lf", _table([["a", "b", "c"], ["1", "2", "3"], ["4", "5", "6"]]))
    )
    cases.append(
        Case(
            "plain_crlf",
            _table([["a", "b", "c"], ["1", "2", "3"], ["4", "5", "6"]], newline="\r\n"),
        )
    )
    cases.append(
        Case(
            "bom_crlf",
            _table([["id", "name"], ["1", "x"], ["2", "y"]], newline="\r\n", bom=True),
        )
    )
    cases.append(
        Case(
            "quoted_comma",
            _table([["a", "b"], ['"x,y"', "z"], ["p", '"q,r,s"']]),
        )
    )
    cases.append(
        Case(
            "quoted_newline_lf",
            # newline inside quotes is masked, so this stays uniform-stride
            b'a,b\n"line1\nline2",2\nx,y\n',
        )
    )
    cases.append(
        Case(
            "escaped_quotes",
            # RFC-4180 "" escapes: parity toggles twice, mask stays correct
            b'a,b\n"he said ""hi"", then left",2\nx,y\n',
        )
    )
    cases.append(
        Case(
            "unterminated_quote_masks_rest",
            # an unbalanced quote swallows the rest of the file -> only the
            # header's 2 structural chars remain (divisible by jump 2, so
            # the tape builds with zero servable data records)
            b'a,b\n"unterminated,2\nx,y\n',
        )
    )
    cases.append(
        Case("ragged_trailing_comma", b"a,b,c\n1,2,3,\n", should_build=False)
    )
    cases.append(Case("single_column", b"h\n1\n2\n3\n"))
    cases.append(
        Case(
            "mac_cr_endings",
            # classic-Mac \r-only endings: \r classifies as newline, the
            # CRLF sniff sees no following \n -> jump = field_cnt, works
            b"a,b\r1,2\r3,4\r",
        )
    )
    cases.append(
        Case(
            "mixed_endings_ragged",
            # LF rows then a CRLF row: the CR adds an index slot ->
            # stride breaks -> build must reject
            b"a,b\n1,2\n3,4\r\n",
            should_build=False,
        )
    )
    cases.append(
        Case(
            "whitespace_preserved",
            _table([["a", "b"], ["  padded  ", " x "], ["1", "2"]]),
        )
    )
    cases.append(
        Case(
            "empty_fields",
            _table([["a", "b", "c"], ["", "", ""], ["1", "", "3"]]),
        )
    )
    cases.append(
        Case(
            # round 2: pins the kernels' word-parity carry arithmetic
            # (sign-form parities, carry folded into the row column) —
            # dense quote pairs make per-word/row parity counts large
            # and odd across word, row and tile boundaries
            "dense_quote_parity_carry",
            b"a,b\n"
            + b"".join(
                b'"%s",%d\n' % (b'x"' b'"y' * (3 + i % 5), i)
                for i in range(700)
            ),
        )
    )
    return cases


def boundary_cases() -> List[Case]:
    """Rows/quotes engineered to straddle 64-, 128-, 4096-, and
    131072-byte boundaries (reference block, lane row, small tile, default
    tile)."""
    cases = []
    for size in (63, 64, 65, 127, 128, 129, 4095, 4096, 4097):
        # one long quoted field whose quoted span crosses `size`
        filler = "x" * size
        data = f'a,b\n"{filler},still quoted",2\nq,w\n'.encode()
        cases.append(Case(f"quote_cross_{size}", data))
    for size in (64, 128, 4096):
        # delimiter exactly at a block boundary
        pad = "y" * (size - 5)
        data = f"a,b\n{pad},2\nq,w\n".encode()
        cases.append(Case(f"delim_near_{size}", data))
    # v4 masks in the 0x80 flag domain (round-2 rewrite): a byte equal
    # to a structural char with bit 7 set (0xAC = ',' | 0x80, second
    # byte of U+00AC's UTF-8 pair) must stay non-structural, and a
    # quoted comma adjacent to the closing quote must still be masked —
    # including when the quoted span crosses a tile boundary.
    for size in (63, 64, 65, 4096):
        pad = b"z" * size
        data = (b"a,b\n"
                + b'"\xc2\xac,in quotes",' + pad + b"\n"
                + b'q,"' + pad + b'\xc2\xac,"\n')
        cases.append(Case(f"hi_bit_mask_{size}", data))
    # raw-classify garbage containment (round-2-late swar_classify_raw):
    # the kernels carry garbage outside bit-7 positions between the
    # classify and the final mask AND. Bytes whose LOW-7 bits equal the
    # quote (0xA2 = '"'|0x80) or a newline (0x8A = '\n'|0x80) are the
    # adversarial inputs: only the hoisted high-bit test keeps them
    # from toggling quote parity / splitting records — in AND out of
    # quoted spans, at word (4 B) offsets 0..3, across a tile boundary.
    for size in (62, 63, 64, 65, 4096):
        pad = b"w" * size
        data = (b"a,b\n"
                + b"\xa2\x8a\x8d\xac,plain\n"       # all four, unquoted
                + b'"\xa2 quoted \x8a",' + pad + b"\n"
                + b'x\xa2,"span ' + pad + b' \xa2\x8a"\n')
        cases.append(Case(f"hi_bit_quote_{size}", data))
    return cases


def random_cases(seed: int = 1234, n_cases: int = 8) -> List[Case]:
    """Randomised tables with quoted fields containing commas/newlines and
    escaped quotes; always uniform-stride by construction."""
    rng = random.Random(seed)
    cases = []
    for i in range(n_cases):
        n_fields = rng.randint(1, 12)
        n_rows = rng.randint(1, 200)
        header = [f"col{j}" for j in range(n_fields)]
        rows = [header]
        for _ in range(n_rows):
            row = []
            for _ in range(n_fields):
                kind = rng.random()
                if kind < 0.55:
                    row.append(
                        "".join(
                            rng.choice("abcdefghij0123456789 ")
                            for _ in range(rng.randint(0, 20))
                        )
                    )
                elif kind < 0.75:
                    inner = "".join(
                        rng.choice("abc,xyz ,\n")
                        for _ in range(rng.randint(1, 30))
                    )
                    row.append('"' + inner + '"')
                else:
                    inner = 'say ""' + str(rng.randint(0, 99)) + '"" ok'
                    row.append('"' + inner + '"')
            rows.append(row)
        newline = "\r\n" if rng.random() < 0.5 else "\n"
        cases.append(Case(f"random_{i}", _table(rows, newline=newline)))
    return cases


def all_cases() -> List[Case]:
    return basic_cases() + boundary_cases() + random_cases()


def synthetic_wide_table(n_bytes: int, n_fields: int = 16, seed: int = 7) -> bytes:
    """Deterministic wide-table CSV of ~n_bytes for benchmarking (the
    BASELINE.json '1 GB synthetic wide-table' config, scaled)."""
    rng = random.Random(seed)
    header = ",".join(f"f{j}" for j in range(n_fields)) + "\n"
    out = [header]
    size = len(header)
    row_id = 0
    while size < n_bytes:
        fields = [str(row_id)]
        for j in range(1, n_fields):
            if j % 7 == 3:
                fields.append(f'"text, with comma {rng.randint(0, 9999)}"')
            else:
                fields.append(str(rng.randint(0, 10**9)))
        row = ",".join(fields) + "\n"
        out.append(row)
        size += len(row)
        row_id += 1
    return "".join(out).encode()
