"""Corpus API: many CSV files as one logical table.

The BASELINE's distributed configs speak of "data-parallel corpus
shards" — in production the unit of sharding is usually a file (or file
range), not one giant buffer. `CsvCorpus` builds a tape per file (in
parallel threads — each build may itself use the device or native
backend) and exposes global record addressing over the concatenated
corpus:

    corpus = CsvCorpus(paths)           # schema-checked union
    corpus.num_records                  # total data records
    corpus.seek_field(global_r, f)      # routed to the owning file
    corpus.column(f)                    # concatenated across files

Files must share a header schema (same field names after trim); the
per-file record counts form the routing table (an exclusive-sum, the
same construction as the shard offset rebasing).
"""

from __future__ import annotations

import bisect
import concurrent.futures
import os
from typing import List, Optional, Sequence

import numpy as np

from .api import create
from .config import DEFAULT_DIALECT, Dialect
from .errors import InvalidState


class CsvCorpus:
    def __init__(
        self,
        paths: Sequence[str | os.PathLike],
        dialect: Optional[Dialect] = None,
        backend: str = "auto",
        max_workers: int = 4,
        require_same_schema: bool = True,
    ):
        if not paths:
            raise InvalidState("empty corpus")
        self._paths = [str(p) for p in paths]
        dialect = dialect or DEFAULT_DIALECT
        with concurrent.futures.ThreadPoolExecutor(max_workers=max_workers) as ex:
            self._tapes = list(
                ex.map(lambda p: create(p, dialect=dialect, backend=backend), self._paths)
            )
        names0 = self._tapes[0].header_names()
        if require_same_schema:
            for p, t in zip(self._paths[1:], self._tapes[1:]):
                if list(t.header_names()) != list(names0):
                    raise InvalidState(
                        f"schema mismatch: {p} has {t.header_names()}, "
                        f"expected {names0}"
                    )
        self._names = list(names0)
        counts = np.array([t.num_data_records for t in self._tapes], np.int64)
        self._starts = np.concatenate([[0], np.cumsum(counts)])

    @property
    def num_records(self) -> int:
        return int(self._starts[-1])

    @property
    def field_cnt(self) -> int:
        return self._tapes[0].field_cnt

    def header_names(self) -> List[str]:
        return self._names

    @property
    def tapes(self):
        return self._tapes

    def _route(self, global_r: int):
        if global_r < 0 or global_r >= self.num_records:
            return None, None
        i = bisect.bisect_right(self._starts, global_r) - 1
        return i, global_r - int(self._starts[i])

    def seek_field(self, global_r: int, f: int) -> Optional[bytes]:
        i, local = self._route(global_r)
        return None if i is None else self._tapes[i].seek_field(local, f)

    def seek_record(self, global_r: int) -> Optional[bytes]:
        i, local = self._route(global_r)
        return None if i is None else self._tapes[i].seek_record(local)

    def column(self, f: int) -> list:
        out: list = []
        for t in self._tapes:
            out.extend(t.column(f))
        return out

    def owner(self, global_r: int) -> Optional[str]:
        """Which file serves this record (debug/observability)."""
        i, _ = self._route(global_r)
        return None if i is None else self._paths[i]

    def __len__(self) -> int:
        return self.num_records

    def __repr__(self) -> str:
        return (
            f"CsvCorpus(files={len(self._paths)}, records={self.num_records}, "
            f"fields={self.field_cnt})"
        )
