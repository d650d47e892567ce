"""Cross-shard serving: batched field gathers over sharded bytes.

The bytes stay sharded across the mesh exactly as the index build left
them (P("data")); the structural index — ~1/6 the size of the data, and
needed in full for slot arithmetic — is replicated. Lookups are the same
fixed-shape gather as device_tape._gather_fields; XLA's sharding
propagation inserts the cross-shard collectives so a query whose bytes
live on another device is fetched over ICI without any manual routing
(SURVEY.md §5.8 (iii))."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..device_tape import _gather_fields
from .sharded import AXIS


class ShardedTape:
    """Serving over mesh-sharded bytes + replicated index."""

    def __init__(self, data: np.ndarray, index: np.ndarray, jump: int,
                 field_cnt: int, record_cnt: int, mesh: Mesh):
        n_shards = mesh.devices.size
        pad = (-len(data)) % n_shards
        padded = np.concatenate([data, np.zeros(pad, np.uint8)]) if pad else data
        self.data = jax.device_put(
            jnp.asarray(padded), NamedSharding(mesh, P(AXIS))
        )
        idx_host = np.asarray(index)
        if idx_host.size and int(idx_host[-1]) >= 2**31:
            raise ValueError(
                "ShardedTape replicates an int32 index: >= 2 GiB inputs "
                "need the offsets-free ShardedPackedTape"
            )
        self.index = jax.device_put(
            jnp.asarray(idx_host.astype(np.int32)),
            NamedSharding(mesh, P()),
        )
        self.jump = jnp.int32(jump)
        self.field_cnt = jnp.int32(field_cnt)
        self.record_cnt = jnp.int32(record_cnt)

    @classmethod
    def from_tape(cls, tape, mesh: Mesh) -> "ShardedTape":
        raw = tape.data_bytes
        host = (
            np.frombuffer(raw, dtype=np.uint8)
            if isinstance(raw, (bytes, bytearray, memoryview))
            else np.asarray(raw, dtype=np.uint8)
        )
        return cls(
            host,
            np.asarray(tape.index),
            tape.record_jump_size,
            tape.field_cnt,
            tape.record_cnt,
            mesh,
        )

    def gather_fields(self, records, fields, max_len: int = 64):
        return _gather_fields(
            self.data, self.index,
            jnp.asarray(records, jnp.int32), jnp.asarray(fields, jnp.int32),
            self.jump, self.field_cnt, self.record_cnt, max_len,
        )

    def to_host_lists(self, out, lengths, valid, allow_truncated=False) -> list:
        from ..device_tape import _to_host_lists

        return _to_host_lists(out, lengths, valid, allow_truncated)


def _packed_seq_meta(header, n_bytes, fingerprint):
    return dict(
        magic="csv-simd-tpu-index", version=1, encoding="packed_seq",
        names=header.names, new_line=header.new_line.value,
        field_cnt=header.field_cnt, delimiter=header.delimiter,
        record_offset=header.record_offset, n_bytes=n_bytes,
        fingerprint=fingerprint,
    )


class ShardedPackedTape:
    """Offsets-free serving over a mesh: the packed seq bitmask AND the
    bytes stay sharded row-wise on the devices that own them; only the
    row popcount prefix (4 bytes per 512 input bytes) is replicated.

    This is the production >= 2 GiB serving path: no offsets array
    exists anywhere (no int32 ceiling, no ~4 B/char replication —
    round-1's ShardedTape replicated the whole index per device), and
    queries route by global row: searchsorted on the replicated prefix
    finds the owning row, the word gather + byte gather execute on the
    owning shard with XLA-inserted collectives (SURVEY.md §5.8 (iii))."""

    def __init__(self, data: bytes | np.ndarray, mesh: Mesh,
                 dialect=None, use_pallas=None, interpret=None):
        import jax as _jax

        from ..config import DEFAULT_DIALECT
        from ..errors import InvalidCsvFormat
        from ..offsetfree import prefix_for_packed
        from ..tape import Header, NewLine
        from .sharded import pad_words_for_mesh, sharded_stage1

        dialect = dialect or DEFAULT_DIALECT
        arr = (
            np.frombuffer(data, dtype=np.uint8)
            if isinstance(data, (bytes, bytearray, memoryview))
            else np.asarray(data, dtype=np.uint8)
        )
        self.n_bytes = arr.size
        self.header = Header.parse(arr, delimiter=dialect.delimiter)
        n_shards = mesh.devices.size
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        if use_pallas is None:
            use_pallas = on_tpu
        if interpret is None:
            interpret = use_pallas and not on_tpu

        w2d = pad_words_for_mesh(arr, n_shards)
        rows = w2d.shape[0]
        w_dev = _jax.device_put(
            jnp.asarray(w2d), NamedSharding(mesh, P(AXIS, None))
        )
        packed, _c, _ce, total, _par = sharded_stage1(
            w_dev, 0, mesh, dialect, use_pallas=use_pallas,
            interpret=interpret, layout="seq",
        )
        self.words = packed  # (rows, 16) sharded P(AXIS, None)
        # replicated row prefix: 1 int32 per 512 input bytes
        self.cum_incl = _jax.device_put(
            jax.jit(prefix_for_packed)(packed), NamedSharding(mesh, P())
        )
        datap = np.zeros(rows * 512, np.uint8)
        datap[: arr.size] = arr
        self.data = _jax.device_put(
            jnp.asarray(datap), NamedSharding(mesh, P(AXIS))
        )
        count = int(total)
        jump = self.header.field_cnt + (
            1 if self.header.new_line is NewLine.CRLF else 0
        )
        record_cnt, rem = divmod(count, jump)
        if rem != 0:
            raise InvalidCsvFormat(
                f"non-uniform record stride: {count} structural entries "
                f"not divisible by jump {jump}"
            )
        self.jump = jnp.int32(jump)
        self.field_cnt = jnp.int32(self.header.field_cnt)
        self.record_cnt = jnp.int32(record_cnt)
        self.num_data_records = max(record_cnt - 1, 0)

    def gather_fields(self, records, fields, max_len: int = 64):
        from ..offsetfree import _serve

        return _serve(
            self.data, self.words, self.cum_incl,
            jnp.asarray(records, jnp.int32), jnp.asarray(fields, jnp.int32),
            self.jump, self.field_cnt, self.record_cnt, max_len,
        )

    def save(self, path) -> None:
        """Write the SAME packed_seq artifact as PackedDeviceTape.save —
        the sharded and single-device serving stacks share one artifact
        format (rows beyond the data are all-zero pad and harmless to
        either loader)."""
        import json

        from ..artifact import _fingerprint

        data_host = np.asarray(self.data)[: self.n_bytes]
        meta = _packed_seq_meta(
            self.header, self.n_bytes, _fingerprint(data_host)
        )
        np.savez_compressed(
            path,
            meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
            packed=np.asarray(self.words, dtype=np.int32),
        )

    def gather_column(self, field: int, max_len: int = 64):
        n = self.num_data_records
        return self.gather_fields(
            jnp.arange(n, dtype=jnp.int32),
            jnp.full((n,), field, jnp.int32),
            max_len,
        )

    def to_host_lists(self, out, lengths, valid, allow_truncated=False) -> list:
        from ..device_tape import _to_host_lists

        return _to_host_lists(out, lengths, valid, allow_truncated)
