"""Kernel-variant micro-benchmark harness (real TPU).

The axon tunnel has ~30-40 ms host<->device round-trip latency, so naive
per-call timing measures nothing. This harness chains K data-dependent
kernel invocations inside one jit (the carry feeds each call) and reports
the marginal time (K_hi - K_lo) / (K_hi - K_lo) per pass.

Usage: python tools/kbench.py [variant ...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 128


def lane_scan(x):
    lanes = x.shape[-1]
    s = 1
    while s < lanes:
        x = x + jnp.pad(x, ((0, 0), (s, 0)))[:, :lanes]
        s *= 2
    return x


def pack(m, tile):
    shifts = jax.lax.broadcasted_iota(jnp.int32, (tile, L), 0) % 32
    c = m << shifts
    return jnp.sum(c.reshape(tile // 32, 32, L), axis=1, dtype=jnp.int32)


def classify(b):
    struct = ((b == 44) | (b == 10) | (b == 13)).astype(jnp.int32)
    q = (b == 34).astype(jnp.int32)
    return struct, q


def make_variant(name, tile, rows):
    """Returns f(arr, carry) -> (words, count) for the named variant."""
    grid = rows // tile

    def common_specs(extra=()):
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # carry (1,)
            pl.BlockSpec((tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        for e in extra:
            in_specs.append(
                pl.BlockSpec(e.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            )
        out_specs = [
            pl.BlockSpec((tile // 32, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((rows // 32, L), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ]
        return in_specs, out_specs, out_shape

    if name == "nopar":
        def kernel(c_ref, b_ref, w_ref, cnt_ref, sm):
            b = b_ref[:].astype(jnp.int32)
            struct, q = classify(b)
            w_ref[:] = pack(struct, tile)
            cnt_ref[0, 0] = jnp.sum(struct) + c_ref[0]
        extra = ()
    elif name == "lanescan":
        def kernel(c_ref, b_ref, w_ref, cnt_ref, sm):
            b = b_ref[:].astype(jnp.int32)
            struct, q = classify(b)
            within = lane_scan(q)
            masked = struct * (1 - (within & 1))
            w_ref[:] = pack(masked, tile)
            cnt_ref[0, 0] = jnp.sum(masked) + c_ref[0]
        extra = ()
    elif name == "roll":
        def kernel(c_ref, b_ref, w_ref, cnt_ref, sm):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                sm[0] = c_ref[0]
            b = b_ref[:].astype(jnp.int32)
            struct, q = classify(b)
            within = lane_scan(q)
            row_tot = within[:, L - 1:]
            x = row_tot
            ridx = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
            s = 1
            while s < tile:
                x = x + jnp.where(ridx >= s, pltpu.roll(x, s, 0), 0)
                s *= 2
            par = (within + (x - row_tot) + sm[0]) & 1
            masked = struct * (1 - par)
            w_ref[:] = pack(masked, tile)
            cnt_ref[0, 0] = jnp.sum(masked)
            sm[0] = (sm[0] + jnp.sum(q)) & 1
        extra = ()
    elif name == "tril_input":
        tril = jnp.asarray(np.tril(np.ones((tile, tile), np.float32), -1))

        def kernel(c_ref, b_ref, t_ref, w_ref, cnt_ref, sm):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                sm[0] = c_ref[0]
            b = b_ref[:].astype(jnp.int32)
            struct, q = classify(b)
            within = lane_scan(q)
            row_tot = within[:, L - 1:]
            excl = jax.lax.dot_general(
                t_ref[:], row_tot.astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            par = (within + excl + sm[0]) & 1
            masked = struct * (1 - par)
            w_ref[:] = pack(masked, tile)
            cnt_ref[0, 0] = jnp.sum(masked)
            sm[0] = (sm[0] + jnp.sum(q)) & 1
        extra = (tril,)
    elif name == "current":
        from csv_simd_tpu.ops.stage1_pallas import stage1_pallas

        def f(arr, carry):
            w, c, p = stage1_pallas(arr, carry, row_tile=tile)
            return w, c
        return f
    else:
        raise ValueError(name)

    in_specs, out_specs, out_shape = common_specs(extra)

    def f(arr, carry):
        w, cnt = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
        )(carry.reshape(1), arr, *extra)
        return w, cnt[0, 0]

    return f


def bench_variant(name, tile=1024, n_mb=64, k_lo=1, k_hi=17, reps=5):
    n = n_mb * 1024 * 1024
    rows = n // L
    arr = jnp.asarray(np.random.randint(0, 256, n, dtype=np.uint8).reshape(rows, L))
    f = make_variant(name, tile, rows)

    def chain(a, k):
        acc = jnp.int32(0)
        for _ in range(k):
            w, c = f(a, acc & 1)
            acc = acc + c + w[0, 0]
        return acc

    times = {}
    for k in (k_lo, k_hi):
        g = jax.jit(lambda a, k=k: chain(a, k))
        float(g(arr))
        t0 = time.time()
        for _ in range(reps):
            float(g(arr))
        times[k] = (time.time() - t0) / reps
    per = (times[k_hi] - times[k_lo]) / (k_hi - k_lo)
    gbps = n / per / 1e9
    print(f"{name:12s} tile={tile:5d}: {per*1e3:7.3f} ms/pass -> {gbps:6.1f} GB/s")
    sys.stdout.flush()
    return gbps


if __name__ == "__main__":
    variants = sys.argv[1:] or ["nopar", "lanescan", "roll", "tril_input"]
    for v in variants:
        if ":" in v:
            name, tile = v.split(":")
            bench_variant(name, int(tile))
        else:
            bench_variant(v)
