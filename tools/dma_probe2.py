"""Round-5 DMA forensics: can a TALLER narrow out block recover the
wide-write rate? (VERDICT r4 item 1, avenue (a).)

Round-4's dma_probe.py showed the same bytes written as (512,16) NARROW
blocks read 320.6 GB/s at 1 GiB vs 486.5 as (64,128) WIDE blocks. This
probe adds the candidate fix: keep the (rows,16) array shape (pinned by
the serving layout) but make the OUT BLOCK 8x taller — BlockSpec
((8*T,16), lambda i: (i // 8, 0)) revisited for 8 consecutive grid
steps, each step storing its (T,16) slice, one (4096,16)=256 KiB DMA
flush per 8 steps instead of eight 32 KiB flushes.

Also probes the READ side (the prefix kernel's collapse 235->65 GB/s at
1 GiB): reading a (rows,16) array through the (rows/8,128) reshape vs
reading a natively-wide (rows/8,128) array — is the reshape free?

    PYTHONPATH=/root/repo:/root/.axon_site python tools/dma_probe2.py
"""

import functools, time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

T = 512


def mk_write(rows, mode):
    """read (T,128) blocks, write the same byte count in `mode` layout."""
    if mode == "narrow":            # (T,16) out blocks, (rows,16) array
        out_shape = jax.ShapeDtypeStruct((rows, 16), jnp.int32)
        ospec = pl.BlockSpec((T, 16), lambda i: (i, 0), memory_space=pltpu.VMEM)
        def kernel(c_ref, w_ref, o_ref, sm):
            @pl.when(pl.program_id(0) == 0)
            def _():
                sm[0] = c_ref[0]
            o_ref[:] = w_ref[:][:, :16] + sm[0]
            sm[0] = (sm[0] + 1) & 1
    elif mode.startswith("tall"):   # (K*T,16) out block revisited K steps
        K = int(mode[4:])
        out_shape = jax.ShapeDtypeStruct((rows, 16), jnp.int32)
        ospec = pl.BlockSpec((K * T, 16), lambda i: (i // K, 0),
                             memory_space=pltpu.VMEM)
        def kernel(c_ref, w_ref, o_ref, sm):
            i = pl.program_id(0)
            @pl.when(i == 0)
            def _():
                sm[0] = c_ref[0]
            o_ref[pl.ds((i % K) * T, T), :] = w_ref[:][:, :16] + sm[0]
            sm[0] = (sm[0] + 1) & 1
    else:                           # wide: same bytes as (rows/8,128)
        out_shape = jax.ShapeDtypeStruct((rows // 8, 128), jnp.int32)
        ospec = pl.BlockSpec((T // 8, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        def kernel(c_ref, w_ref, o_ref, sm):
            @pl.when(pl.program_id(0) == 0)
            def _():
                sm[0] = c_ref[0]
            o_ref[:] = w_ref[:][: T // 8, :] + sm[0]
            sm[0] = (sm[0] + 1) & 1
    f = pl.pallas_call(
        kernel, grid=(rows // T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((T, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=ospec, out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(a, k):
        def body(i, acc):
            p = f((acc & 1).reshape(1), a)
            return acc + p[0, 0]
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))
    return chain


def mk_read(mode):
    """read-side probe: sum a buffer presented as (R,128) wide blocks,
    where the buffer is EITHER natively (R,128) or a (rows,16) array
    reshaped — the prefix kernel's exact read pattern."""
    def kernel(c_ref, w_ref, o_ref, sm):
        @pl.when(pl.program_id(0) == 0)
        def _():
            sm[0] = c_ref[0]
        o_ref[0, 0] = jnp.sum(w_ref[:]) + sm[0]

    def build(R):
        return pl.pallas_call(
            kernel, grid=(R // (T // 8),),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((T // 8, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        )

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(a, k):
        def body(i, acc):
            wide = a.reshape(-1, 128) if mode == "reshape" else a
            p = build(wide.shape[0])((acc & 1).reshape(1), wide)
            return acc + p[0, 0]
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))
    return chain


def run(gb_list=(64, 1024)):
    for gb in gb_list:
        N = gb * 1024 * 1024
        rows = N // 512
        arr = jnp.asarray(np.random.randint(
            -2**31, 2**31, (rows, 128), dtype=np.int64).astype(np.int32))
        ks = (2, 6) if gb >= 512 else (16, 48)
        # tall32's (16384,16) out block is lane-PADDED to 128 in VMEM
        # (T(8,128) tiling): 8 MB x2 double-buffered blows the 16 MB
        # scoped-vmem limit. tall8 (2 MB padded) is the usable ceiling.
        modes = ("narrow", "tall2", "tall8", "wide")
        chains = {m: mk_write(rows, m) for m in modes}
        best = {m: {k: 1e9 for k in ks} for m in modes}
        for m, c in chains.items():
            for k in ks:
                float(c(arr, k))
        for _ in range(5):
            for m, c in chains.items():
                for k in ks:
                    t0 = time.time(); float(c(arr, k))
                    best[m][k] = min(best[m][k], time.time() - t0)
        for m in modes:
            per = (best[m][ks[1]] - best[m][ks[0]]) / (ks[1] - ks[0])
            print(f"{gb:5d}MiB write[{m:7s}]: {per*1e6:9.1f} us/pass "
                  f"-> {N/per/1e9:6.1f} GB/s (read-side)", flush=True)
        del arr

        # read side: same byte count, narrow-array-reshaped vs native wide
        nrow16 = N // 64                     # (nrow16,16) int32 = N bytes
        a16 = jnp.asarray(np.random.randint(
            -2**31, 2**31, (nrow16, 16), dtype=np.int64).astype(np.int32))
        awide = jnp.asarray(np.asarray(a16).reshape(-1, 128))
        rd = {"reshape": (mk_read("reshape"), a16),
              "native ": (mk_read("native"), awide)}
        bestr = {m: {k: 1e9 for k in ks} for m in rd}
        for m, (c, a) in rd.items():
            for k in ks:
                float(c(a, k))
        for _ in range(5):
            for m, (c, a) in rd.items():
                for k in ks:
                    t0 = time.time(); float(c(a, k))
                    bestr[m][k] = min(bestr[m][k], time.time() - t0)
        for m, (c, a) in rd.items():
            per = (bestr[m][ks[1]] - bestr[m][ks[0]]) / (ks[1] - ks[0])
            print(f"{gb:5d}MiB read [{m:7s}]: {per*1e6:9.1f} us/pass "
                  f"-> {N/per/1e9:6.1f} GB/s", flush=True)
        del a16, awide


if __name__ == "__main__":
    import sys
    gbs = tuple(int(x) for x in sys.argv[1:]) or (64, 1024)
    run(gbs)
