"""Ablate prefix_for_packed constructions on the live chip.

The full-build chain (bench.py) pays ~65 us/pass over the v4 scan for
the offsets-free row-popcount prefix — a (rows, 16) popcount + axis-1
reduce, i.e. exactly the narrow-tensor shape PERF_NOTES measured
lowering ~10x worse per element than full-width ops. Variants here
recast the popcount/reduce at (rows/8, 128) full width:

  cur       jnp.sum(popcount(packed), axis=1) (shipped)
  wide_sum  reshape (rows/8,128) -> popcount -> (.,8,16).sum(-1)
  wide_mm   reshape -> popcount -> int8 MXU matmul vs (128,8) selector
  wide_dot  reshape -> popcount(int32) -> f32 matmul (exact: <= 512)

All feed the same hierarchical fast_cumsum_i32. Every variant is
checked bit-identical to the NumPy golden cumsum on the COMPILED
backend before timing (CLAUDE.md rule). Methodology: data-dependent
fori_loop chains, marginal time between k1/k2, best of N trials
(tools/ablate2.py lineage).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/prefix_ablate.py [MB]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
try:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

from csv_simd_tpu.offsetfree import fast_cumsum_i32  # noqa: E402

LANES = 128


def cur(packed):
    row_counts = jnp.sum(jax.lax.population_count(packed), axis=1)
    return fast_cumsum_i32(row_counts)


def wide_sum(packed):
    rows = packed.shape[0]
    wide = packed.reshape(rows // 8, LANES)
    pc = jax.lax.population_count(wide)
    row_counts = pc.reshape(rows // 8, 8, 16).sum(
        axis=-1, dtype=jnp.int32).reshape(rows)
    return fast_cumsum_i32(row_counts)


def _selector_i8():
    w = np.zeros((LANES, 8), np.int8)
    for lane in range(LANES):
        w[lane, lane // 16] = 1
    return w


def wide_mm(packed):
    rows = packed.shape[0]
    wide = packed.reshape(rows // 8, LANES)
    pc = jax.lax.population_count(wide).astype(jnp.int8)
    sel = jnp.asarray(_selector_i8())
    row_counts = jax.lax.dot_general(
        pc, sel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).reshape(rows)
    return fast_cumsum_i32(row_counts)


def wide_dot(packed):
    rows = packed.shape[0]
    wide = packed.reshape(rows // 8, LANES)
    pc = jax.lax.population_count(wide).astype(jnp.float32)
    sel = jnp.asarray(_selector_i8(), jnp.float32)
    row_counts = jax.lax.dot_general(
        pc, sel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32).reshape(rows)
    return fast_cumsum_i32(row_counts)


VARIANTS = {"cur": cur, "wide_sum": wide_sum, "wide_mm": wide_mm,
            "wide_dot": wide_dot}


def _chain(fn):
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(a, k):
        def body(i, acc):
            # data-dependent: xor the accumulator into one word so the
            # loop cannot be elided or pipelined past the dependency
            cum = fn(a ^ (acc & 1))
            return acc + cum[-1] + cum[0]
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))
    return chain


def _marginal(chain, a, k1, k2, trials=5):
    best = None
    for _ in range(trials):
        jax.block_until_ready(chain(a, k1))
        t0 = time.perf_counter()
        jax.block_until_ready(chain(a, k1))
        t1 = time.perf_counter()
        jax.block_until_ready(chain(a, k2))
        t2 = time.perf_counter()
        per = ((t2 - t1) - (t1 - t0)) / (k2 - k1)
        if best is None or per < best:
            best = per
    return best


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    # v4 emits one (16,)-word packed row per 512 input bytes
    rows = mb * 1024 * 1024 // 512
    rng = np.random.default_rng(7)
    packed_np = rng.integers(0, 2**32, size=(rows, 16),
                             dtype=np.uint32).astype(np.int32)
    golden = np.cumsum(
        np.unpackbits(packed_np.view(np.uint8)).reshape(rows, -1)
        .sum(axis=1).astype(np.int64)).astype(np.int32)
    packed = jnp.asarray(packed_np)
    plat = jax.devices()[0].platform
    print(f"# platform={plat} rows={rows} "
          f"({rows*16*4/2**20:.0f} MiB packed, {mb} MiB input)",
          file=sys.stderr)

    results = {}
    for name, fn in VARIANTS.items():
        got = np.asarray(jax.jit(fn)(packed))
        if not np.array_equal(got, golden):
            bad = int((got != golden).sum())
            print(f"{name:10s} WRONG ({bad} mismatches) — skipped",
                  file=sys.stderr)
            results[name] = {"ok": False}
            continue
        per = _marginal(_chain(fn), packed, 64, 320)
        us = per * 1e6
        eff = mb * 2**20 / per / 1e9
        results[name] = {"ok": True, "us_per_pass": round(us, 1),
                         "input_gbps": round(eff, 1)}
        print(f"{name:10s} {us:8.1f} us/pass  "
              f"({eff:.0f} GB/s of original input)", file=sys.stderr)
    print(json.dumps({"platform": plat, "mb": mb, "results": results}))


if __name__ == "__main__":
    main()
