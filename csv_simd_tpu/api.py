"""Top-level factory: file path / bytes -> Tape.

Reference: `csv_simd::create` (lib.rs:61-74) — open, mmap, parse header,
build structural index, assemble tape. Here the index build dispatches to a
selectable backend:

- "golden": pure NumPy oracle (always available, any host);
- "jnp":    jitted XLA pipeline (CPU or TPU);
- "pallas": fused Pallas TPU kernel (the production path);
- "native": multithreaded C++ host engine (ctypes; no device roundtrip —
            fastest for small files given the device tunnel's latency);
- "auto":   pallas on TPU, jnp otherwise.
"""

from __future__ import annotations

import mmap as _mmap
import os

from .errors import IoError
from .tape import Header, Tape


def _build_index(data: bytes, dialect, backend: str):
    if backend == "golden":
        from . import golden

        return golden.structural_index(data, dialect)
    if backend in ("jnp", "pallas", "native", "auto"):
        from .index import build_index

        return build_index(data, dialect=dialect, backend=backend)
    raise ValueError(f"unknown backend: {backend!r}")


def create_from_bytes(data: bytes, dialect=None, backend: str = "auto") -> Tape:
    """Build a Tape from an in-memory byte buffer."""
    from .config import DEFAULT_DIALECT

    dialect = dialect or DEFAULT_DIALECT
    header = Header.parse(data, delimiter=dialect.delimiter)
    index = _build_index(data, dialect, backend)
    return Tape(data, index, header)


def create(filename: str | os.PathLike, dialect=None, backend: str = "auto") -> Tape:
    """Build a Tape from a CSV file.

    The file is memory-mapped and served zero-copy (the reference's mmap
    design, lib.rs:65): the Tape's bytes are a NumPy view of the mapping,
    so a 1 GiB file costs no copy on the host path."""
    import numpy as np

    try:
        with open(filename, "rb") as f:
            mapped = _mmap.mmap(f.fileno(), 0, access=_mmap.ACCESS_READ)
    except ValueError as e:
        # mmap refuses zero-length files; treat like the reference's Io error
        raise IoError(f"{filename}: {e}") from e
    except OSError as e:
        raise IoError(str(e)) from e
    data = np.frombuffer(mapped, dtype=np.uint8)
    return create_from_bytes(data, dialect=dialect, backend=backend)
