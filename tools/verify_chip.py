"""On-hardware verification: compiled kernels + the sharded Pallas path
on a single-chip mesh, all asserted bit-identical to golden.

Run (with the axon TPU visible):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/verify_chip.py

This is the compiled-mode complement of the interpret-mode CI tests:
tests/ run the kernels under the Pallas interpreter on CPU; this script
runs the Mosaic-COMPILED kernels on the real chip, including
`sharded_stage1(use_pallas=True)` on a Mesh of size 1 — the exact code
path a multi-chip deployment executes per shard.
"""

import sys

import numpy as np


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from csv_simd_tpu import golden
    from csv_simd_tpu.ops.stage1_v2 import pad_to_words
    from csv_simd_tpu.ops.stage1_v3 import stage1_fused, unpack_packed_host
    from csv_simd_tpu.ops.stage1_v4 import stage1_fused_v4
    from csv_simd_tpu.parallel.sharded import make_mesh, sharded_stage1

    plat = jax.devices()[0].platform
    print(f"platform: {plat} ({len(jax.devices())} device(s))")
    compiled = plat in ("tpu", "axon")
    if not compiled:
        print("WARNING: no TPU visible; kernels will run interpreted")

    # several random corpora at ONE padded shape (so the compiled
    # executables are reused across seeds — fuzzing costs no recompiles)
    for seed in (11, 202, 3033):
        rng = np.random.default_rng(seed)
        data = rng.choice(
            # includes the raw-classify adversaries: bytes whose low-7
            # bits equal the quote/newlines/delimiter but with bit 7
            # set (0xa2 0x8a 0x8d 0xac) must stay non-structural
            np.frombuffer(b'ab"",\n\rx,z":; \t09\xa2\x8a\x8d\xac\xff',
                          dtype=np.uint8),
            size=900_000,
        )
        ref = golden.structural_mask(data)
        w2d = pad_to_words(data)

        p3, _ = stage1_fused(jnp.asarray(w2d), 0, interpret=not compiled)
        m3 = unpack_packed_host(np.asarray(p3), data.size, tile=512)
        assert (m3 == ref).all(), f"v3 compiled kernel != golden (seed {seed})"

        p4, _, na = stage1_fused_v4(jnp.asarray(w2d), 0, interpret=not compiled)
        m4 = np.unpackbits(
            np.ascontiguousarray(np.asarray(p4)).view("<u4").view(np.uint8),
            bitorder="little",
        )[: data.size]
        assert (m4 == ref).all(), f"v4 seq kernel != golden (seed {seed})"
        assert int(na) == int((data >= 0x80).sum()), "non-ASCII count wrong"
        print(f"seed {seed}: v3 + v4 bit-identical to golden")

    # single-chip mesh: the compiled Pallas kernel INSIDE shard_map with
    # the vma checker enabled — the per-shard production path
    mesh = make_mesh(1)
    w_dev = jax.device_put(jnp.asarray(w2d), NamedSharding(mesh, P("data", None)))
    packed, counts, _ce, total, parity = sharded_stage1(
        w_dev, 0, mesh, use_pallas=compiled, interpret=not compiled
    )
    ms = unpack_packed_host(np.asarray(packed), data.size, tile=512)
    assert (ms == ref).all(), "sharded pallas path != golden"
    assert int(total) == int(ref.sum())
    print(f"sharded_stage1(use_pallas) on 1-chip mesh: OK (count {int(total)})")

    # seq layout through shard_map too
    packed_seq, _c, _ce2, total2, _p = sharded_stage1(
        w_dev, 0, mesh, use_pallas=compiled, interpret=not compiled,
        layout="seq",
    )
    m_seq = np.unpackbits(
        np.ascontiguousarray(np.asarray(packed_seq)).view("<u4").view(np.uint8),
        bitorder="little",
    )[: data.size]
    assert (m_seq == ref).all(), "sharded seq path != golden"
    print("sharded_stage1(layout='seq') on 1-chip mesh: OK")

    # round-5 WIDE layout through shard_map (the production
    # ShardedPackedTape build config on TPU)
    if compiled:
        w_dev_w = jax.device_put(
            jnp.asarray(w2d.reshape(-1, 1024)),
            NamedSharding(mesh, P("data", None)))
        packed_w, _cw, _cew, total_w, _pw = sharded_stage1(
            w_dev_w, 0, mesh, use_pallas=True, layout="seq_wide",
        )
        m_wide = np.unpackbits(
            np.ascontiguousarray(np.asarray(packed_w))
            .view("<u4").view(np.uint8), bitorder="little",
        )[: data.size]
        assert (m_wide == ref).all(), "sharded seq_wide path != golden"
        assert int(total_w) == int(ref.sum())
        print("sharded_stage1(layout='seq_wide') on 1-chip mesh: OK")

    # compiled offsets-free sharded SERVING (build + shard_map gather)
    from csv_simd_tpu import create_from_bytes
    from csv_simd_tpu.parallel.serving import ShardedPackedTape

    csv = b"a,b,c\n" + b"".join(
        b'%d,"v,%d",w%d\n' % (i, i * 7, i) for i in range(500)
    )
    tape = create_from_bytes(csv, backend="golden")
    st = ShardedPackedTape(
        csv, mesh, use_pallas=compiled, interpret=not compiled
    )
    recs = np.array([0, 123, 499 - 1, 7])
    flds = np.array([1, 2, 0, 1])
    out, ln, v = st.gather_fields(recs, flds, max_len=24)
    vals = st.to_host_lists(out, ln, v)
    want = [tape.seek_field(int(r), int(f)) for r, f in zip(recs, flds)]
    assert vals == want, (vals, want)
    print("ShardedPackedTape compiled serve on 1-chip mesh: OK")

    # the RELATIONAL stack compiled on the chip: typed parse ->
    # predicate pushdown -> segment group-by, vs a Python oracle
    from csv_simd_tpu.frame import read_typed
    from csv_simd_tpu.offsetfree import PackedDeviceTape
    from csv_simd_tpu.query import column_stats, groupby_typed

    rows = [("AA", 3 * i - 700) for i in range(400)]
    rows += [("BB", 5 * i) for i in range(300)]
    rel_csv = ("sym,qty\n" + "".join(
        f"{s},{q}\n" for s, q in rows
    )).encode()
    pt = PackedDeviceTape(rel_csv)
    s = column_stats(pt, "qty", where=[("qty", ">", 0)])
    want_vals = [q for _s, q in rows if q > 0]
    assert s.ok_count == len(want_vals) and s.sum == sum(want_vals), s
    g = groupby_typed(pt, "sym", "qty")
    for i, key in enumerate(g["keys"]):
        grp = [q for s2, q in rows if s2 == key]
        assert int(g["sum"][i]) == sum(grp) and int(g["count"][i]) == len(grp)
    fr = read_typed(pt, order_by="qty", descending=True, limit=5)
    assert list(fr["qty"]) == sorted(
        (q for _s, q in rows), reverse=True)[:5]
    print("relational stack (parse/filter/group/sort) on chip: OK")

    from csv_simd_tpu.sql import sql as run_sql

    r = run_sql(
        "SELECT sym, COUNT(*), SUM(qty) AS s FROM t WHERE qty > 0 "
        "GROUP BY sym ORDER BY s DESC", pt,
    )
    want = {}
    for s2, q in rows:
        if q > 0:
            c, t_ = want.get(s2, (0, 0))
            want[s2] = (c + 1, t_ + q)
    got = {k: (int(c), int(t_))
           for k, c, t_ in zip(r["sym"], r["count"], r["s"])}
    assert got == want, (got, want)
    print("SQL end-to-end on chip: OK")

    # --- round-4 paths, compiled on the chip ---
    # the one-launch Pallas prefix kernel vs its XLA twin
    from csv_simd_tpu.offsetfree import (
        _prefix_for_packed_pallas,
        _prefix_for_packed_xla,
    )

    pw = pt.words
    assert np.array_equal(
        np.asarray(_prefix_for_packed_pallas(pw)),
        np.asarray(_prefix_for_packed_xla(pw)),
    ), "pallas prefix kernel != XLA twin on chip"
    print("pallas prefix kernel: OK (== XLA twin, compiled)")

    # device window executor vs the host oracle, on the chip
    import csv_simd_tpu.window as W

    old_min = W.DEVICE_WINDOW_MIN_ROWS
    try:
        W.DEVICE_WINDOW_MIN_ROWS = 1
        wq = ("SELECT SUM(qty) OVER (PARTITION BY sym ORDER BY qty) "
              "AS s, ROW_NUMBER() OVER (PARTITION BY sym ORDER BY "
              "qty) AS rn FROM t")
        dev_r = run_sql(wq, pt)
        W.DEVICE_WINDOW_MIN_ROWS = 10**9
        host_r = run_sql(wq, pt)
        assert [int(v) for v in dev_r["s"]] == \
            [int(v) for v in host_r["s"]]
        assert dev_r["rn"].tolist() == host_r["rn"].tolist()
        # round-5 shapes: bounded ROWS MIN/MAX (sparse-table range
        # extrema) and PERCENT_RANK (int-pair numerators)
        W.DEVICE_WINDOW_MIN_ROWS = 1
        wq5 = ("SELECT MIN(qty) OVER (PARTITION BY sym ORDER BY qty "
               "ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS lo, "
               "PERCENT_RANK() OVER (PARTITION BY sym ORDER BY qty) "
               "AS pr FROM t")
        dev5 = run_sql(wq5, pt)
        W.DEVICE_WINDOW_MIN_ROWS = 10**9
        host5 = run_sql(wq5, pt)
        assert [None if v is None else int(v) for v in dev5["lo"]] == \
            [None if v is None else int(v) for v in host5["lo"]]
        assert [float(v) for v in dev5["pr"]] == \
            [float(v) for v in host5["pr"]]
    finally:
        W.DEVICE_WINDOW_MIN_ROWS = old_min
    print("device window executor on chip: OK (== host oracle, "
          "incl. bounded MIN/MAX + PERCENT_RANK)")

    # device set-op executor vs the host row codes, on the chip
    import csv_simd_tpu.setops as SO

    old_so = SO.DEVICE_SETOP_MIN_ROWS
    try:
        SO.DEVICE_SETOP_MIN_ROWS = 1
        sq = ("SELECT qty FROM t WHERE qty > 0 EXCEPT "
              "SELECT qty FROM t WHERE qty > 500")
        dev_s = run_sql(sq, pt)
        SO.DEVICE_SETOP_MIN_ROWS = 10**9
        host_s = run_sql(sq, pt)
        assert dev_s["qty"].tolist() == host_s["qty"].tolist()
    finally:
        SO.DEVICE_SETOP_MIN_ROWS = old_so
    print("device set-op executor on chip: OK (== host row codes)")
    print("ALL ON-HARDWARE CHECKS PASSED")


if __name__ == "__main__":
    main()
