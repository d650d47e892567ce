"""Streaming index build: chunked input with carried boundary state.

The reference required the whole file in memory ("Extend the capability to
streams (not all in memory as it is now)" was an open todo, README.md:23,
with a 4 GB limit noted in its vestigial error enum). Here the byte stream
is consumed in fixed-size chunks; the only state carried between chunks is
the quote parity (exactly the `in_string` carry the reference threads
between 64-byte blocks, reader.rs:218,239,284 — chunking is the same
construction at a coarser granularity) plus the running byte offset for
rebasing local structural positions to absolute offsets.

The result is bit-identical to a one-shot build; chunk boundaries may cut
records, quoted regions, even multi-byte sequences — none of it matters
because parity is associative and offsets are rebased exactly.
"""

from __future__ import annotations

import os
from typing import BinaryIO, Iterable, Iterator, Optional, Union

import numpy as np

from .config import DEFAULT_DIALECT, Dialect
from .errors import IoError
from .utils import as_u8

DEFAULT_CHUNK_BYTES = 64 * 1024 * 1024


def _iter_chunks(
    source: Union[str, os.PathLike, BinaryIO, Iterable[bytes]],
    chunk_bytes: int,
) -> Iterator[bytes]:
    if isinstance(source, (str, os.PathLike)):
        try:
            with open(source, "rb") as f:
                while True:
                    chunk = f.read(chunk_bytes)
                    if not chunk:
                        return
                    yield chunk
        except OSError as e:
            raise IoError(str(e)) from e
    elif hasattr(source, "read"):
        while True:
            chunk = source.read(chunk_bytes)
            if not chunk:
                return
            yield chunk
    else:
        yield from source


class StreamingIndexBuilder:
    """Incremental structural-index builder.

    feed(chunk) any number of times, then finish() -> int64 index with the
    0 sentinel. Device work per chunk uses the selected backend; carry is
    a single parity bit + byte offset.
    """

    def __init__(
        self,
        dialect: Dialect = DEFAULT_DIALECT,
        backend: str = "auto",
        pipeline_depth: int = 2,
    ):
        self._dialect = dialect
        self._backend = backend
        self._parity = 0  # int, or a device scalar while pipelining
        self._offset = 0
        self._parts = [np.zeros(1, dtype=np.int64)]  # sentinel
        # device-path pipeline: scans are LAUNCHED per feed() with the
        # quote-parity carry chained ON DEVICE (no host sync per chunk);
        # host-side offset extraction lags `pipeline_depth` chunks behind
        # so the next chunk's transfer+scan overlaps this chunk's extract
        # (the IO/compute overlap the reference planned but never built,
        # README.md:17)
        self._depth = max(pipeline_depth, 1)
        self._pending = []  # [(packed_device, n_bytes, base_offset, tile)]

    def feed(self, chunk: bytes | np.ndarray) -> None:
        self.feed_prepared(self.prepare(chunk))

    def prepare(self, chunk: bytes | np.ndarray):
        """Backend-specific chunk staging, safe to call from a worker
        thread: for device backends this pads to the (rows, 128)
        byte-quad layout and ENQUEUES the host->device transfer, so by
        the time feed_prepared launches the scan the copy is already in
        flight (double-buffered ingestion; jax.device_put is async and
        thread-safe). Host backends pass the bytes through."""
        from .index import _resolve_backend

        arr = as_u8(chunk)
        if arr.size and _resolve_backend(self._backend) in ("pallas", "jnp"):
            import jax.numpy as jnp

            from .ops.stage1_v2 import pad_to_words

            return ("dev", jnp.asarray(pad_to_words(arr)), arr.size)
        return ("host", arr, arr.size)

    def feed_prepared(self, prepared) -> None:
        from .utils.metrics import GLOBAL as _metrics

        kind, payload, n_bytes = prepared
        if n_bytes == 0:
            return
        with _metrics.span("streaming_chunk", n_bytes):
            if kind == "dev":
                self._feed_device(payload, n_bytes)
            else:
                self._feed_inner(payload)

    def _feed_inner(self, arr: np.ndarray) -> None:
        from .index import _resolve_backend

        backend = _resolve_backend(self._backend)
        if backend == "golden":
            from . import golden

            mask = golden.structural_mask(arr, self._dialect, self._parity)
            self._parity = golden.quote_parity_out(
                arr, self._dialect, self._parity
            )
            local = np.flatnonzero(mask).astype(np.int64)
            if local.size:
                self._parts.append(local + self._offset)
            self._offset += arr.size
            return
        if backend == "native":
            from . import native

            local, par = native.host_stage1(
                arr, self._dialect, carry_in=self._parity,
                with_sentinel=False,
            )
            self._parity = int(par)
            if local.size:
                self._parts.append(local + self._offset)
            self._offset += arr.size
            return
        # backend is pallas or jnp from here (resolve_backend rejects
        # anything else; golden/native returned above)
        import jax.numpy as jnp

        from .ops.stage1_v2 import pad_to_words

        self._feed_device(jnp.asarray(pad_to_words(arr)), arr.size)

    def _feed_device(self, w2d, n_bytes: int) -> None:
        from .index import _have_tpu, _resolve_backend
        from .ops.stage1_v3 import stage1_fused, stage1_swar_xla

        backend = _resolve_backend(self._backend)
        tile = min(512, w2d.shape[0])
        if backend == "pallas":
            packed, par = stage1_fused(
                w2d, self._parity, self._dialect,
                interpret=not _have_tpu(),
            )
        else:
            packed, par = stage1_swar_xla(w2d, self._parity, self._dialect)
        # chain the parity carry as a DEVICE scalar (async dispatch:
        # the next chunk's scan launches without waiting), queue the
        # packed words and extract a lagging chunk on the host
        self._parity = par
        self._pending.append((packed, n_bytes, self._offset, tile))
        self._offset += n_bytes
        while len(self._pending) > self._depth:
            self._drain_one()

    def _drain_one(self) -> None:
        from .index import extract_offsets_from_packed

        packed, n, base, tile = self._pending.pop(0)
        local = extract_offsets_from_packed(
            np.asarray(packed), tile, n, base=base
        )
        if local.size:
            self._parts.append(local)

    def _drain_all(self) -> None:
        while self._pending:
            self._drain_one()

    @property
    def bytes_consumed(self) -> int:
        return self._offset

    @property
    def quote_parity(self) -> int:
        return int(self._parity)

    def finish(self) -> np.ndarray:
        self._drain_all()
        return np.concatenate(self._parts)

    # -- checkpoint/resume: an interrupted ingest restarts from the last
    #    consumed byte with only the parity bit + offset + partial index
    #    (SURVEY.md §5.4 — the reference had nothing here) --

    def state_dict(self) -> dict:
        self._drain_all()
        return {
            "parity": int(self._parity),
            "offset": self._offset,
            "index_parts": np.concatenate(self._parts),
        }

    @classmethod
    def from_state(cls, state: dict, dialect=None, backend: str = "auto"):
        from .config import DEFAULT_DIALECT

        b = cls(dialect or DEFAULT_DIALECT, backend)
        b._parity = int(state["parity"])
        b._offset = int(state["offset"])
        b._parts = [np.asarray(state["index_parts"], dtype=np.int64)]
        return b

    def save(self, path) -> None:
        np.savez_compressed(path, **self.state_dict())

    @classmethod
    def load(cls, path, dialect=None, backend: str = "auto"):
        z = np.load(path, allow_pickle=False)
        return cls.from_state(
            {k: z[k] for k in ("parity", "offset", "index_parts")},
            dialect,
            backend,
        )


class ShardedStreamingIndexBuilder:
    """Chunked ingestion ACROSS a device mesh: streaming and sharding
    composed (VERDICT r3 item 5; SURVEY §5.7(c)+§5.8).

    Each fed chunk is split byte-wise over the mesh's shards and scanned
    by parallel.sharded.sharded_stage1, whose exclusive XOR-scan
    collective resolves quote parity across the SHARD cuts inside the
    chunk; the builder threads the single quote-parity carry across the
    CHUNK cuts (kept as a device scalar — no host sync per chunk). The
    two carries are the same associative triple at two granularities
    (the reference's in_string carry, reader.rs:218, generalized), so
    the result is bit-identical to a one-shot single-device build even
    when a quoted region spans both a chunk AND a shard boundary."""

    def __init__(self, mesh=None, dialect: Dialect = DEFAULT_DIALECT,
                 use_pallas: Optional[bool] = None,
                 interpret: Optional[bool] = None,
                 pipeline_depth: int = 2):
        import jax

        from .parallel.sharded import make_mesh

        self._mesh = mesh or make_mesh()
        self._dialect = dialect
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        self._use_pallas = on_tpu if use_pallas is None else use_pallas
        self._interpret = ((self._use_pallas and not on_tpu)
                           if interpret is None else interpret)
        self._parity = 0  # int or device scalar
        self._offset = 0
        self._parts = [np.zeros(1, dtype=np.int64)]
        # same lagging-extraction pipeline as StreamingIndexBuilder:
        # chunk k+1's sharded scan launches (parity chains as a device
        # scalar) while chunk k's packed words extract on host
        self._depth = max(pipeline_depth, 1)
        self._pending = []  # [(packed_sharded, n_bytes, base, tile)]

    def feed(self, chunk: bytes | np.ndarray) -> None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.sharded import (
            AXIS,
            pad_words_for_mesh,
            sharded_stage1,
        )

        arr = as_u8(chunk)
        if arr.size == 0:
            return
        n_shards = self._mesh.devices.size
        w2d = pad_words_for_mesh(arr, n_shards)
        w_dev = jax.device_put(
            w2d, NamedSharding(self._mesh, P(AXIS, None)))
        packed, _c, _ce, _t, parity = sharded_stage1(
            w_dev, self._parity, self._mesh, self._dialect,
            use_pallas=self._use_pallas, interpret=self._interpret,
        )
        self._parity = parity  # device scalar: next chunk chains async
        shard_rows = w2d.shape[0] // n_shards
        self._pending.append(
            (packed, arr.size, self._offset, min(512, shard_rows)))
        self._offset += arr.size
        while len(self._pending) > self._depth:
            self._drain_one()

    def _drain_one(self) -> None:
        from .ops.stage1_v3 import unpack_packed_host

        packed, n, base, tile = self._pending.pop(0)
        mask = unpack_packed_host(np.asarray(packed), n, tile=tile)
        local = np.flatnonzero(mask).astype(np.int64)
        if local.size:
            self._parts.append(local + base)

    @property
    def quote_parity(self) -> int:
        return int(self._parity)

    def finish(self) -> np.ndarray:
        while self._pending:
            self._drain_one()
        return np.concatenate(self._parts)

    # -- checkpoint/resume (same contract as StreamingIndexBuilder:
    #    parity bit + byte offset + partial index restart an
    #    interrupted ingest exactly; SURVEY §5.4) --

    def state_dict(self) -> dict:
        while self._pending:
            self._drain_one()
        return {
            "parity": int(self._parity),
            "offset": self._offset,
            "index_parts": np.concatenate(self._parts),
        }

    @classmethod
    def from_state(cls, state: dict, mesh=None, dialect=None,
                   use_pallas=None, interpret=None):
        b = cls(mesh, dialect or DEFAULT_DIALECT, use_pallas, interpret)
        b._parity = int(state["parity"])
        b._offset = int(state["offset"])
        b._parts = [np.asarray(state["index_parts"], dtype=np.int64)]
        return b

    def save(self, path) -> None:
        np.savez_compressed(path, **self.state_dict())

    @classmethod
    def load(cls, path, mesh=None, dialect=None, use_pallas=None,
             interpret=None):
        z = np.load(path, allow_pickle=False)
        return cls.from_state(
            {k: z[k] for k in ("parity", "offset", "index_parts")},
            mesh, dialect, use_pallas, interpret,
        )


def build_index_sharded_streaming(
    source: Union[str, os.PathLike, BinaryIO, Iterable[bytes]],
    mesh=None,
    dialect: Dialect = DEFAULT_DIALECT,
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
    use_pallas: Optional[bool] = None,
    interpret: Optional[bool] = None,
) -> np.ndarray:
    """Streamed + sharded build -> host int64 index with sentinel,
    bit-identical to golden / the one-shot builds."""
    b = ShardedStreamingIndexBuilder(mesh, dialect, use_pallas, interpret)
    for chunk in _iter_chunks(source, chunk_bytes):
        b.feed(chunk)
    return b.finish()


def build_index_streaming(
    source: Union[str, os.PathLike, BinaryIO, Iterable[bytes]],
    dialect: Dialect = DEFAULT_DIALECT,
    backend: str = "auto",
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
    prefetch: bool = True,
) -> np.ndarray:
    """Build the full structural index from a path / file object / chunk
    iterable without materialising the input.

    With prefetch=True (default) the ingest is a three-stage pipeline:
    an IO thread reads chunk k+2, a transfer thread stages chunk k+1
    (padding + async device_put for device backends), while the main
    thread launches chunk k's scan and extracts lagging results — the
    IO/compute overlap the reference's design notes discuss but never
    built (README.md:17), double-buffered so the device never waits on
    the host copy."""
    builder = StreamingIndexBuilder(dialect, backend)
    chunks = _iter_chunks(source, chunk_bytes)
    if prefetch:
        import concurrent.futures

        with concurrent.futures.ThreadPoolExecutor(max_workers=2) as pool:
            nxt = pool.submit(lambda: next(chunks, None))
            staged = None  # future of the next prepared chunk
            while True:
                chunk = nxt.result()
                if chunk is None:
                    break
                nxt = pool.submit(lambda: next(chunks, None))
                prep = pool.submit(builder.prepare, chunk)
                if staged is not None:
                    builder.feed_prepared(staged.result())
                staged = prep
            if staged is not None:
                builder.feed_prepared(staged.result())
    else:
        for chunk in chunks:
            builder.feed(chunk)
    return builder.finish()


def create_streaming(
    path: Union[str, os.PathLike],
    dialect: Optional[Dialect] = None,
    backend: str = "auto",
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
):
    """Streamed equivalent of api.create: index built chunk-by-chunk, then
    a Tape over the mmapped bytes (bytes aren't duplicated in memory)."""
    import mmap as _mmap

    from .tape import Header, Tape

    dialect = dialect or DEFAULT_DIALECT
    index = build_index_streaming(path, dialect, backend, chunk_bytes)
    try:
        with open(path, "rb") as f:
            mapped = _mmap.mmap(f.fileno(), 0, access=_mmap.ACCESS_READ)
    except (OSError, ValueError) as e:
        raise IoError(str(e)) from e
    import numpy as np

    data = np.frombuffer(mapped, dtype=np.uint8)
    header = Header.parse(data, delimiter=dialect.delimiter,
                          quote_aware=dialect.header_quotes,
                          quote=dialect.quote)
    return Tape(data, index, header)
