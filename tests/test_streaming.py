"""Streaming build tests: chunked builds must be bit-identical to one-shot
builds for any chunking, including cuts inside quoted regions."""

import io
import os

import numpy as np
import pytest

from csv_simd_tpu import golden
from csv_simd_tpu.streaming import (
    StreamingIndexBuilder,
    build_index_streaming,
    create_streaming,
)

from corpus import basic_cases, synthetic_wide_table


@pytest.mark.parametrize("chunk", [7, 64, 1000, 1 << 16])
def test_chunked_identical(chunk):
    data = synthetic_wide_table(150_000)
    got = build_index_streaming(
        io.BytesIO(data), backend="jnp", chunk_bytes=chunk
    )
    want = golden.structural_index(data)
    np.testing.assert_array_equal(got, want)


def test_cut_inside_quotes():
    inner = "x," * 5000
    data = f'a,b\n"{inner}end",2\nq,w\n'.encode()
    got = build_index_streaming(io.BytesIO(data), backend="jnp", chunk_bytes=501)
    want = golden.structural_index(data)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("case", basic_cases(), ids=lambda c: c.name)
def test_corpus_streaming(case):
    got = build_index_streaming(io.BytesIO(case.data), backend="jnp", chunk_bytes=37)
    want = golden.structural_index(case.data)
    np.testing.assert_array_equal(got, want)


def test_builder_state():
    b = StreamingIndexBuilder(backend="jnp")
    b.feed(b'a,b\n"unterminated ')
    assert b.quote_parity == 1
    b.feed(b'closed",2\n')
    assert b.quote_parity == 0
    idx = b.finish()
    data = b'a,b\n"unterminated closed",2\n'
    np.testing.assert_array_equal(idx, golden.structural_index(data))
    assert b.bytes_consumed == len(data)


def test_create_streaming(tmp_path):
    data = synthetic_wide_table(50_000)
    p = tmp_path / "t.csv"
    p.write_bytes(data)
    tape = create_streaming(p, backend="jnp", chunk_bytes=4096)
    from csv_simd_tpu import create_from_bytes

    ref = create_from_bytes(data, backend="golden")
    assert tape.record_cnt == ref.record_cnt
    assert tape.seek_record(0) == ref.seek_record(0)
    assert tape.seek_field(3, 2) == ref.seek_field(3, 2)


def test_chunk_iterable_source():
    data = synthetic_wide_table(30_000)
    chunks = [data[i : i + 999] for i in range(0, len(data), 999)]
    got = build_index_streaming(chunks, backend="jnp")
    np.testing.assert_array_equal(got, golden.structural_index(data))


@pytest.mark.skipif(
    not os.environ.get("CSV_SIMD_BIG_TESTS"),
    reason="3 GiB build is slow; set CSV_SIMD_BIG_TESTS=1",
)
def test_build_index_over_2gib():
    """>= 2 GiB single-call build through the default API: the device
    backends route through the streamed scan with int64 rebasing
    (reference capacity bar: usize offsets, reader.rs:305)."""
    from csv_simd_tpu.index import build_index

    base = synthetic_wide_table(1 << 21)
    reps = (2**31 + (1 << 22)) // len(base) + 1
    data = np.frombuffer(base * reps, dtype=np.uint8)
    assert data.size >= 2**31
    idx = build_index(data, backend="jnp")
    # spot-check against golden on a window that crosses the 2 GiB line
    lo = 2**31 - 1000
    inwin = idx[(idx >= lo) & (idx < lo + 4000)]
    # golden on the window needs the carried quote parity at lo
    from csv_simd_tpu import golden
    par = golden.quote_parity_out(data[:lo])
    mask = golden.structural_mask(data[lo : lo + 4000], carry_in=par)
    want = np.flatnonzero(mask).astype(np.int64) + lo
    np.testing.assert_array_equal(inwin, want)
    assert idx[-1] > 2**31


def test_pipelined_device_path_lag_and_state():
    """The device path keeps the parity carry on device and drains
    extraction lazily: results and checkpoints must be identical to the
    synchronous semantics, quote spans crossing chunks included."""
    inner = "x," * 5000
    data = f'a,b\n"{inner}end",2\nq,w\n'.encode()
    b = StreamingIndexBuilder(backend="jnp", pipeline_depth=4)
    for lo in range(0, len(data), 997):
        b.feed(data[lo : lo + 997])
    # mid-stream checkpoint must drain pending device work
    state = b.state_dict()
    b2 = StreamingIndexBuilder.from_state(state, backend="jnp")
    np.testing.assert_array_equal(b2.finish(), golden.structural_index(data))
    np.testing.assert_array_equal(b.finish(), golden.structural_index(data))
    assert b.quote_parity == 0


def test_prepare_feed_prepared_pipeline():
    """The explicit two-phase ingest (prepare on a worker thread,
    feed_prepared in order) is bit-identical to plain feed, for both a
    device backend and a host backend."""
    import concurrent.futures

    data = synthetic_wide_table(120_000)
    want = golden.structural_index(data)
    chunks = [data[i : i + 7001] for i in range(0, len(data), 7001)]
    for backend in ("jnp", "golden"):
        b = StreamingIndexBuilder(backend=backend)
        with concurrent.futures.ThreadPoolExecutor(max_workers=2) as pool:
            preps = [pool.submit(b.prepare, c) for c in chunks]
            for f in preps:
                b.feed_prepared(f.result())
        np.testing.assert_array_equal(b.finish(), want)


def test_streaming_prefetch_double_buffered():
    """build_index_streaming's pipelined path (prefetch=True) stays
    bit-identical with the staged-transfer pipeline."""
    data = synthetic_wide_table(200_000)
    got = build_index_streaming(
        io.BytesIO(data), backend="jnp", chunk_bytes=9999, prefetch=True
    )
    np.testing.assert_array_equal(got, golden.structural_index(data))
