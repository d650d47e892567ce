"""Round-2 ablation: v4 candidates vs v3/seq on the real chip.

Modes:
  v3    - stage1_fused (fold layout, production scan)
  seq   - stage1_fused_seq (round-1 sequential kernel, kept as A/B)
  v4    - stage1_fused_v4 (production sequential kernel)
  cls22 - round-1 classify only (4x swar_eq) -> VPU calibration
  cls18 - shared-subexpression classify only -> VPU calibration
  prep  - cls18 + nibble compress (v4's full-width prep)
  mm1/pack1/pack1slice/pack2/px/lane/v4full - pack/scan stage cuts of
          the abandoned packed-domain design (kept for the record)
  sol   - streaming reduce speed-of-light

Usage: python tools/ablate2.py v3:512 v4:512 v4r:512 ...
Methodology: loop-variant fori_loop chains, marginal time between two
chain lengths, best of trials (see bench.py docstring).
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
    swar_classify_u,
    swar_eq,
    swar_nibble_compress,
)

L = 128
N = 64 * 1024 * 1024


def mk_microkernel(mode, tile, rows):
    """Ad-hoc calibration kernels: classify floors and v4 stage cuts."""
    WORDS = 16

    def _pack_weights32():
        w = np.zeros((L, 2 * WORDS), np.float32)
        for lane in range(L):
            g, l = divmod(lane, 8)
            w[lane, (g if l < 4 else WORDS + g)] = float(1 << (4 * (l % 4)))
        return w

    def _prefix_xor32(x):
        for s in (1, 2, 4, 8, 16):
            x = x ^ (x << s)
        return x

    w32c = jnp.asarray(_pack_weights32(), jnp.bfloat16)
    triu16 = jnp.asarray(np.triu(np.ones((WORDS, WORDS), np.int8), 1))
    trilT = jnp.asarray(np.tril(np.ones((tile, tile), np.int8), -1))

    def kernel(c_ref, w_ref, w32_ref, triu_ref, tril_ref, p_ref, sm):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            sm[0] = c_ref[0]

        x = w_ref[:]
        if mode == "cls22":
            qf = swar_eq(x, 0x22)
            sf = swar_eq(x, 0x2C) | swar_eq(x, 0x0A) | swar_eq(x, 0x0D)
            p_ref[:] = (sf | qf)[:, :16] + sm[0]
            sm[0] = (sm[0] + 1) & 1
            return
        us, uq = swar_classify_u(x, (0x0A, 0x0D, 0x2C), 0x22)
        if mode == "cls18":
            p_ref[:] = (us | uq)[:, :16] + sm[0]
            sm[0] = (sm[0] + 1) & 1
            return
        vs = swar_nibble_compress(us)
        vq = swar_nibble_compress(uq)
        if mode == "prep":
            p_ref[:] = (vs + vq)[:, :16] + sm[0]
            sm[0] = (sm[0] + 1) & 1
            return

        def pack(v, combine):
            out = jax.lax.dot_general(
                v.astype(jnp.bfloat16), w32_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            if not combine:
                return out[:, :WORDS]
            if mode.endswith("slice"):
                comb = out[:, :WORDS] | (out[:, WORDS:] << 16)
                return comb
            comb = out | (pltpu.roll(out, WORDS, 1) << 16)
            return comb[:, :WORDS]

        if mode == "mm1":  # one pack matmul, no lane combine
            p_ref[:] = pack(vs, False) + sm[0]
            sm[0] = (sm[0] + 1) & 1
            return
        if mode in ("pack1", "pack1slice"):  # one full packed output
            p_ref[:] = pack(vs, True) + sm[0]
            sm[0] = (sm[0] + 1) & 1
            return
        sw = pack(vs, True)
        qw = pack(vq, True)
        if mode == "pack2":
            p_ref[:] = (sw ^ qw) + sm[0]
            sm[0] = (sm[0] + 1) & 1
            return
        px = _prefix_xor32(qw)
        if mode == "px":
            p_ref[:] = (sw & ~px) + sm[0]
            sm[0] = (sm[0] + 1) & 1
            return
        wp = (px >> 31) & 1
        lane_excl = jax.lax.dot_general(
            wp.astype(jnp.int8), triu_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        if mode == "lane":
            base = (lane_excl + sm[0]) & 1
            p_ref[:] = sw & ~(px ^ -base)
            sm[0] = (sm[0] + 1) & 1
            return
        rowpar = (lane_excl[:, WORDS - 1:] + wp[:, WORDS - 1:]) & 1
        rowpar8 = jnp.broadcast_to(rowpar, (tile, 8)).astype(jnp.int8)
        row_excl = jax.lax.dot_general(
            tril_ref[:], rowpar8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)[:, :1]
        base = (lane_excl + row_excl + sm[0]) & 1
        p_ref[:] = sw & ~(px ^ -base)  # == full v4
        new_carry = (sm[0] + row_excl[tile - 1, 0] + rowpar[tile - 1, 0]) & 1
        sm[0] = new_carry

    grid = rows // tile
    f = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 2 * WORDS), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((WORDS, WORDS), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, tile), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 16), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(a, k):
        def body(i, acc):
            p = f((acc & 1).reshape(1), a, w32c, triu16, trilT)
            return acc + p[0, 0]
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    return chain


_MICRO = (
    "cls22", "cls18", "prep", "mm1", "pack1", "pack1slice", "pack2",
    "px", "lane", "v4full",
)


def mk(mode, tile):
    if mode in _MICRO:
        return mk_microkernel(mode, tile, N // 512)
    if mode == "sol":
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(a, k):
            def body(i, acc):
                return acc + jnp.sum(jnp.maximum(a, acc & 127), dtype=jnp.int32)
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        return chain

    if mode == "v3":
        from csv_simd_tpu.ops.stage1_v3 import stage1_fused as f
        kw = {}
    elif mode == "seq":
        from csv_simd_tpu.ops.stage1_v3 import stage1_fused_seq as f
        kw = {}
    elif mode == "v4":
        from csv_simd_tpu.ops.stage1_v4 import stage1_fused_v4 as f
        kw = {}
    elif mode == "v4mm1":
        from csv_simd_tpu.ops.stage1_v4 import stage1_fused_v4 as f
        kw = {"pack_mode": "mm1"}
    elif mode == "v4mm1r":
        from csv_simd_tpu.ops.stage1_v4 import stage1_fused_v4 as f
        kw = {"pack_mode": "mm1r"}
    elif mode == "v4nc":  # v4 without the fused non-ASCII reduce
        from csv_simd_tpu.ops.stage1_v4 import stage1_fused_v4 as f
        kw = {"count_nonascii": False}
    elif mode == "v4ncmm1":  # production config + single-matmul pack
        from csv_simd_tpu.ops.stage1_v4 import stage1_fused_v4 as f
        kw = {"count_nonascii": False, "pack_mode": "mm1"}
    elif mode == "v4ncmm1r":
        from csv_simd_tpu.ops.stage1_v4 import stage1_fused_v4 as f
        kw = {"count_nonascii": False, "pack_mode": "mm1r"}

    else:
        raise SystemExit(f"unknown mode {mode}")

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(a, k):
        def body(i, acc):
            out = f(a, acc & 1, row_tile=tile, **kw)
            return acc + out[1] + out[0][0, 0]
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    return chain


def bench(mode, tile, arr, Ks=(32, 96)):
    c = mk(mode, tile)
    ts = {}
    for K in Ks:
        float(c(arr, K))
        best = 1e9
        for _ in range(4):
            t0 = time.time()
            float(c(arr, K))
            best = min(best, time.time() - t0)
        ts[K] = best
    per = (ts[Ks[1]] - ts[Ks[0]]) / (Ks[1] - Ks[0])
    print(f"{mode:8s} tile={tile}: {per*1e6:7.2f} us/pass -> {N/per/1e9:6.1f} GB/s")
    sys.stdout.flush()


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    rows = N // 512
    arr = jnp.asarray(
        np.random.randint(-(2**31), 2**31, (rows, L), dtype=np.int64).astype(np.int32)
    )
    for spec in sys.argv[1:]:
        mode, tile = spec.split(":")
        bench(mode, int(tile), arr)
