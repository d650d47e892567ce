"""Device-resident tape: serving as XLA gathers.

The reference serves one field at a time from host memory
(record_source.rs:104-140). On TPU the tape (offsets) and the bytes can
both live in HBM, and serving becomes *batched* gathers — whole columns
or arbitrary (record, field) batches in one fused device computation,
something the CPU library cannot express:

  slot  = (record + 1) * jump + field          (slot arithmetic, vectorised)
  start = index[slot] + 1; end = index[slot+1] (offset gathers)
  out[i, j] = bytes[start_i + j] masked to j < end_i - start_i
                                               (2-D byte gather)

Fixed shapes throughout: `max_len` bounds the field width (static), and
lengths are returned alongside so callers can trim. Out-of-range records
clamp to 0 and are reported in the validity mask.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("max_len",))
def _gather_fields(
    data: jnp.ndarray,       # (n_bytes,) uint8
    index: jnp.ndarray,      # (index_len,) int32
    records: jnp.ndarray,    # (N,) int32
    fields: jnp.ndarray,     # (N,) int32
    jump: jnp.ndarray,       # scalar int32
    field_cnt: jnp.ndarray,  # scalar int32
    record_cnt: jnp.ndarray, # scalar int32
    max_len: int,
):
    valid = (
        (records >= 0)
        & (records + 1 < record_cnt)
        & (fields >= 0)
        & (fields < field_cnt)
    )
    r = jnp.where(valid, records, 0)
    f = jnp.where(valid, fields, 0)
    slots = (r + 1) * jump + f
    starts = index[slots] + 1
    ends = index[slots + 1]
    lengths = jnp.where(valid, ends - starts, 0)
    pos = starts[:, None] + jnp.arange(max_len, dtype=jnp.int32)[None, :]
    in_range = pos < ends[:, None]
    pos = jnp.clip(pos, 0, data.shape[0] - 1)
    out = jnp.where(in_range & valid[:, None], data[pos], jnp.uint8(0))
    return out, lengths, valid


class DeviceTape:
    """Tape with bytes + index resident on device for batched serving.

    Construct from a host Tape (`DeviceTape.from_tape`) or raw parts. The
    scalar metadata mirrors RecordSource's getters; lookups return
    (bytes (N, max_len) uint8, lengths (N,), valid (N,)) device arrays.
    """

    def __init__(self, data: jnp.ndarray, index: jnp.ndarray, jump: int,
                 field_cnt: int, record_cnt: int):
        self.data = data
        self.index = index.astype(jnp.int32)
        self.jump = jnp.int32(jump)
        self.field_cnt = jnp.int32(field_cnt)
        self.record_cnt = jnp.int32(record_cnt)

    @classmethod
    def from_tape(cls, tape) -> "DeviceTape":
        raw = tape.data_bytes
        host = (
            np.frombuffer(raw, dtype=np.uint8)
            if isinstance(raw, (bytes, bytearray, memoryview))
            else np.asarray(raw, dtype=np.uint8)
        )
        data = jnp.asarray(host)
        index = jnp.asarray(np.asarray(tape.index, dtype=np.int32))
        return cls(
            data, index, tape.record_jump_size, tape.field_cnt, tape.record_cnt
        )

    def gather_fields(
        self, records, fields, max_len: int = 64
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Batched (record, field) -> (bytes, lengths, valid)."""
        return _gather_fields(
            self.data, self.index,
            jnp.asarray(records, jnp.int32), jnp.asarray(fields, jnp.int32),
            self.jump, self.field_cnt, self.record_cnt, max_len,
        )

    def gather_column(self, field: int, max_len: int = 64):
        """One whole column in a single device gather."""
        n = int(self.record_cnt) - 1
        recs = jnp.arange(n, dtype=jnp.int32)
        flds = jnp.full((n,), field, jnp.int32)
        return self.gather_fields(recs, flds, max_len)

    def to_host_lists(self, out, lengths, valid) -> list:
        """Decode a gather result into a list of bytes (None if invalid)."""
        o = np.asarray(out)
        ln = np.asarray(lengths)
        v = np.asarray(valid)
        return [
            bytes(o[i, : ln[i]]) if v[i] else None for i in range(o.shape[0])
        ]
