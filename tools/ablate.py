"""Ablation profile of the stage-1 v2 kernel: which stage costs what.

Each variant keeps the same input/output contract (carry scalar input so
the chained calls are loop-variant — XLA would hoist a loop-invariant
pallas call right out of a fori_loop) and drops later pipeline stages.

Usage: python tools/ablate.py <mode:tile> [...]
Modes: dma_only classify_only inword noscan full
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from csv_simd_tpu.ops.swar import (
    swar_broadcast_flag,
    swar_eq,
    swar_prefix_xor_bytes,
    swar_word_parity,
)

L = 128
N = 64 * 1024 * 1024


def _fold_pack(masked, tile):
    """Constant-shift fold pack: 3 halvings with shifts 1,2,4. Output word
    (g, lane) bit (8b + bitrev3(j)) = row j*(tile/8)+g, byte b."""
    t = (masked >> 7) & 0x01010101
    h = tile // 2
    t = t[:h] | (t[h:] << 1)
    h //= 2
    t = t[:h] | (t[h:] << 2)
    h //= 2
    return t[:h] | (t[h:] << 4)


def mk(body_mode, tile, rows):
    triu = jnp.asarray(np.triu(np.ones((L, L), np.float32), 1), jnp.bfloat16)
    ones = jnp.ones((L, L), jnp.bfloat16)
    tril_t = jnp.asarray(np.tril(np.ones((tile, tile), np.float32), -1), jnp.bfloat16)
    triu8 = jnp.asarray(np.triu(np.ones((L, L), np.int8), 1))
    ones8 = jnp.ones((L, L), jnp.int8)
    tril8 = jnp.asarray(np.tril(np.ones((tile, tile), np.int8), -1))

    def kernel(c_ref, w_ref, t_ref, o_ref, g_ref, t8_ref, o8_ref, g8_ref, p_ref, sm):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            sm[0] = c_ref[0]

        x = w_ref[:]
        if body_mode == "dma_only":
            p_ref[:] = x[: tile // 8, :] + sm[0]
            return
        qf = swar_eq(x, 0x22)
        sf = swar_eq(x, 0x2C) | swar_eq(x, 0x0A) | swar_eq(x, 0x0D)
        if body_mode == "classify_only":
            p_ref[:] = (sf | qf)[: tile // 8, :] + sm[0]
            return
        p_in = swar_prefix_xor_bytes(qf)
        wp = swar_word_parity(p_in)
        if body_mode == "inword":
            p_ref[:] = (sf & ~p_in)[: tile // 8, :] + wp[: tile // 8, :] + sm[0]
            return
        sh = 7 - jax.lax.broadcasted_iota(jnp.int32, (tile, L), 0) % 8
        if body_mode == "noscan":
            masked = sf & ~p_in
            t = masked >> sh
            p_ref[:] = jnp.sum(
                t.reshape(tile // 8, 8, L), axis=1, dtype=jnp.int32
            ) + sm[0]
            return
        if body_mode == "v3i8":
            # int8 MXU path: 2x MXU throughput, int32 accumulate, no
            # f32<->i32 converts
            wb = wp.astype(jnp.int8)
            lane_excl = jax.lax.dot_general(
                wb, t8_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            rowsum = jax.lax.dot_general(
                wb, o8_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            # only parity matters downstream: reduce row sums mod 2 so the
            # (T,T) scan matmul runs on exact {0,1} int8 values
            rowpar = (rowsum & 1).astype(jnp.int8)
            row_excl_par = jax.lax.dot_general(
                g8_ref[:], rowpar, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            base = (lane_excl + row_excl_par + sm[0]) & 1
            inq = p_in ^ swar_broadcast_flag(base)
            masked = sf & ~inq
            p_ref[:] = _fold_pack(masked, tile)
            tot = row_excl_par[tile - 1, 0] + rowsum[tile - 1, 0]
            sm[0] = (sm[0] + tot) & 1
            return
        if body_mode in ("v3", "v3_foldonly", "v3_mmonly"):
            wb = wp.astype(jnp.bfloat16)
            if body_mode == "v3_foldonly":
                masked = sf & ~p_in
                p_ref[:] = _fold_pack(masked, tile) + sm[0]
                return
            lane_excl_f = jax.lax.dot_general(
                wb, t_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            rowsum_f = jax.lax.dot_general(
                wb, o_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            row_excl_f = jax.lax.dot_general(
                g_ref[:], rowsum_f.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            base = (lane_excl_f + row_excl_f).astype(jnp.int32)
            base = (base + sm[0]) & 1
            if body_mode == "v3_mmonly":
                p_ref[:] = base[: tile // 8, :]
                sm[0] = (sm[0] + (row_excl_f[tile - 1, 0] + rowsum_f[tile - 1, 0]).astype(jnp.int32)) & 1
                return
            inq = p_in ^ swar_broadcast_flag(base)
            masked = sf & ~inq
            p_ref[:] = _fold_pack(masked, tile)
            sm[0] = (sm[0] + (row_excl_f[tile - 1, 0] + rowsum_f[tile - 1, 0]).astype(jnp.int32)) & 1
            return
        excl = jax.lax.dot_general(
            wp.astype(jnp.bfloat16), t_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        row_tot = excl[:, L - 1 :] + wp[:, L - 1 :]
        xx = row_tot
        ridx = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
        s = 1
        while s < tile:
            xx = xx + jnp.where(ridx >= s, pltpu.roll(xx, s, 0), 0)
            s *= 2
        row_excl = xx - row_tot
        base = (excl + row_excl + sm[0]) & 1
        inq = p_in ^ swar_broadcast_flag(base)
        masked = sf & ~inq
        t = masked >> sh
        p_ref[:] = jnp.sum(t.reshape(tile // 8, 8, L), axis=1, dtype=jnp.int32)
        sm[0] = (sm[0] + xx[tile - 1, 0]) & 1

    grid = rows // tile
    f = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, tile), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, tile), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile // 8, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows // 8, L), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(a, k):
        def body(i, acc):
            p = f((acc & 1).reshape(1), a, triu, ones, tril_t, triu8, ones8, tril8)
            return acc + p[0, 0]
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    return chain


def bench(mode, tile, arr, Ks=(32, 96)):
    c = mk(mode, tile, arr.shape[0])
    ts = {}
    for K in Ks:
        float(c(arr, K))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            float(c(arr, K))
            best = min(best, time.time() - t0)
        ts[K] = best
    per = (ts[Ks[1]] - ts[Ks[0]]) / (Ks[1] - Ks[0])
    print(f"{mode:14s} tile={tile}: {per*1e6:7.1f} us/pass -> {N/per/1e9:6.1f} GB/s")
    sys.stdout.flush()


if __name__ == "__main__":
    rows = N // 512
    arr = jnp.asarray(
        np.random.randint(-(2**31), 2**31, (rows, L), dtype=np.int64).astype(np.int32)
    )
    for spec in sys.argv[1:]:
        mode, tile = spec.split(":")
        bench(mode, int(tile), arr)
