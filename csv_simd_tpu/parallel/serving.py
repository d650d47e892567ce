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
        self.index = jax.device_put(
            jnp.asarray(np.asarray(index, dtype=np.int32)),
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

    def to_host_lists(self, out, lengths, valid) -> list:
        o, ln, v = np.asarray(out), np.asarray(lengths), np.asarray(valid)
        return [bytes(o[i, : ln[i]]) if v[i] else None for i in range(o.shape[0])]
