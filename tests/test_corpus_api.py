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
