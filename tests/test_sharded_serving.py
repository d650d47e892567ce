"""Cross-shard serving tests: sharded bytes + replicated index on the
8-device CPU mesh; every lookup must match the host tape regardless of
which shard owns the bytes."""

import numpy as np
import jax
import pytest

from csv_simd_tpu import create_from_bytes
from csv_simd_tpu.parallel.serving import ShardedTape
from csv_simd_tpu.parallel.sharded import make_mesh

from corpus import synthetic_wide_table


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    data = synthetic_wide_table(200_000)
    tape = create_from_bytes(data, backend="golden")
    mesh = make_mesh(8)
    return tape, ShardedTape.from_tape(tape, mesh)


def test_cross_shard_lookups(setup):
    tape, st = setup
    rng = np.random.default_rng(0)
    recs = rng.integers(0, tape.num_data_records, 64)
    flds = rng.integers(0, tape.field_cnt, 64)
    out, lengths, valid = st.gather_fields(recs, flds, max_len=48)
    vals = st.to_host_lists(out, lengths, valid)
    for i in range(64):
        assert vals[i] == tape.seek_field(int(recs[i]), int(flds[i]))


def test_out_of_range_sharded(setup):
    tape, st = setup
    out, lengths, valid = st.gather_fields(
        np.array([0, 10**8]), np.array([0, 0]), max_len=16
    )
    vals = st.to_host_lists(out, lengths, valid)
    assert vals[0] == tape.seek_field(0, 0)
    assert vals[1] is None


def test_device_build_v3(setup):
    from csv_simd_tpu.index import build_index_device
    from csv_simd_tpu import golden

    data = synthetic_wide_table(100_000)
    offsets, count = build_index_device(data)
    want = golden.structural_index(data)
    np.testing.assert_array_equal(np.asarray(offsets)[: count + 1], want)
