"""Kernel v-next lab: candidate optimizations over stage1_v3, correctness
-checked against golden and benchmarked with the fori_loop methodology.

Candidates:
  i8acc      — matmuls accumulate in int8 (mod-256 overflow preserves the
               mod-2 parity); 1/4 the matmul-output traffic
  directpack — single-step pack: 8 contiguous row-block slices, shift by
               bitrev3(j), OR; replaces the 3-step fold; same layout
  both       — the two combined

Usage: PYTHONPATH=... python tools/vnext.py [bench|check] [names...]
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo/tests")

from csv_simd_tpu.config import DEFAULT_DIALECT
from csv_simd_tpu.ops.stage1_v3 import _classify, _fold_pack
from csv_simd_tpu.ops.swar import (
    swar_broadcast_flag,
    swar_prefix_xor_bytes,
    swar_word_parity,
)

L = 128
_BITREV3 = [0, 4, 2, 6, 1, 5, 3, 7]
_SHIFT_KEEP = [0x7FFFFFFF >> (s - 1) if s else -1 for s in _BITREV3]


def direct_pack(masked, tile):
    gp = tile // 8
    acc = None
    for j in range(8):
        s = _BITREV3[j]
        blk = masked[j * gp : (j + 1) * gp]
        term = blk if s == 0 else (blk >> s) & _SHIFT_KEEP[j]
        acc = term if acc is None else (acc | term)
    return acc


def make(tile, rows, i8acc=False, directpack=False):
    triu = jnp.asarray(np.triu(np.ones((L, L), np.int8), 1))
    tril = jnp.asarray(np.tril(np.ones((tile, tile), np.int8), -1))
    acc_t = jnp.int8 if i8acc else jnp.int32

    def kernel(c_ref, w_ref, t_ref, g_ref, p_ref, par_ref, sm):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            sm[0] = c_ref[0]
        x = w_ref[:]
        sf, qf = _classify(x, DEFAULT_DIALECT)
        p_in = swar_prefix_xor_bytes(qf)
        wp = swar_word_parity(p_in)
        wp8 = wp.astype(jnp.int8)
        lane_excl = jax.lax.dot_general(
            wp8, t_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_t)
        le_i32 = lane_excl.astype(jnp.int32) if i8acc else lane_excl
        rowpar = (le_i32[:, L - 1 :] + wp[:, L - 1 :]) & 1
        rowpar8 = jnp.broadcast_to(rowpar, (tile, 8)).astype(jnp.int8)
        row_excl = jax.lax.dot_general(
            g_ref[:], rowpar8, (((1,), (0,)), ((), ())),
            preferred_element_type=acc_t)
        re_i32 = row_excl.astype(jnp.int32) if i8acc else row_excl
        base = (le_i32 + re_i32[:, :1] + sm[0]) & 1
        inq = p_in ^ swar_broadcast_flag(base)
        masked = sf & ~inq
        p_ref[:] = direct_pack(masked, tile) if directpack else _fold_pack(masked, tile)
        new_carry = (sm[0] + re_i32[tile - 1, 0] + rowpar[tile - 1, 0]) & 1
        sm[0] = new_carry
        par_ref[0, 0] = new_carry

    grid = rows // tile
    f = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, tile), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile // 8, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows // 8, L), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )

    def run(w2d, carry):
        p, par = f(jnp.asarray(carry, jnp.int32).reshape(1), w2d, triu, tril)
        return p, par[0, 0]

    return run


def check(i8acc, directpack):
    from csv_simd_tpu import golden
    from csv_simd_tpu.ops.stage1_v2 import pad_to_words
    from csv_simd_tpu.ops.stage1_v3 import unpack_packed_host
    from corpus import synthetic_wide_table

    data = synthetic_wide_table(2_000_000)
    arr = np.frombuffer(data, np.uint8)
    w2d = jnp.asarray(pad_to_words(arr))
    run = make(512, w2d.shape[0], i8acc, directpack)
    p, par = run(w2d, 0)
    ok = np.array_equal(
        unpack_packed_host(np.asarray(p), arr.size), golden.structural_mask(arr)
    )
    print(f"i8acc={i8acc} directpack={directpack}: bit-identical={ok} "
          f"parity={int(par)}/{golden.quote_parity_out(arr)}")
    sys.stdout.flush()
    return ok


def bench(name, i8acc, directpack, tile=512):
    N = 64 * 1024 * 1024
    rows = N // 512
    arr = jnp.asarray(
        np.random.randint(-(2**31), 2**31, (rows, L), dtype=np.int64).astype(np.int32)
    )
    run = make(tile, rows, i8acc, directpack)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(a, k):
        def body(i, acc):
            p, par = run(a, acc & 1)
            return acc + par + p[0, 0]
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    mins = {}
    for K in (32, 96):
        float(chain(arr, K))
        best = 1e9
        for _ in range(4):
            t0 = time.time()
            float(chain(arr, K))
            best = min(best, time.time() - t0)
        mins[K] = best
    per = (mins[96] - mins[32]) / 64
    print(f"{name}: {per*1e6:.1f} us/pass -> {N/per/1e9:.1f} GB/s")
    sys.stdout.flush()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "bench"
    if mode == "check":
        for i8, dp in ((False, True), (True, False), (True, True)):
            check(i8, dp)
    else:
        bench("base(v3)", False, False)
        bench("directpack", False, True)
        bench("i8acc", True, False)
        bench("both", True, True)
