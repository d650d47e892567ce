"""Narrow- vs wide-block output DMA probe (round-4 forensics).

Evidence for PERF_NOTES "the 1 GiB scale penalty is the NARROW-OUTPUT
DMA": a kernel reading (512,128) int32 blocks and writing the same
byte count as (512,16) NARROW blocks vs (64,128) WIDE blocks. Recorded
2026-08-19 on the v5e chip:

    64 MiB:  narrow 160.0 us/pass (419.5 GB/s read)   wide 34.3
    1 GiB:   narrow 3349.3 us/pass (320.6 GB/s read)  wide 2207.2

At 64 MiB the narrow-write cost hides under compute overlap in the
real kernels; at 1 GiB it stops overlapping and throttles the read
stream. Re-run on toolchain updates:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/dma_probe.py
"""

import functools, time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

def mk(rows, mode):
    T = 512
    if mode == "narrow":   # (T,16) out blocks, (rows,16) array
        out_shape = jax.ShapeDtypeStruct((rows, 16), jnp.int32)
        ospec = pl.BlockSpec((T, 16), lambda i: (i, 0), memory_space=pltpu.VMEM)
        def kernel(c_ref, w_ref, o_ref, sm):
            i = pl.program_id(0)
            @pl.when(i == 0)
            def _():
                sm[0] = c_ref[0]
            o_ref[:] = w_ref[:][:, :16] + sm[0]
            sm[0] = (sm[0] + 1) & 1
    else:                   # same bytes as (T/8,128) blocks, (rows/8,128) array
        out_shape = jax.ShapeDtypeStruct((rows // 8, 128), jnp.int32)
        ospec = pl.BlockSpec((T // 8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        def kernel(c_ref, w_ref, o_ref, sm):
            i = pl.program_id(0)
            @pl.when(i == 0)
            def _():
                sm[0] = c_ref[0]
            o_ref[:] = w_ref[:][: T // 8, :] + sm[0]
            sm[0] = (sm[0] + 1) & 1
    f = pl.pallas_call(
        kernel, grid=(rows // T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)],
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

for gb, ks in ((64, (16, 48)), (1024, (2, 6))):
    N = gb * 1024 * 1024
    rows = N // 512
    arr = jnp.asarray(np.random.randint(-2**31, 2**31, (rows, 128), dtype=np.int64).astype(np.int32))
    chains = {m: mk(rows, m) for m in ("narrow", "wide")}
    best = {m: {k: 1e9 for k in ks} for m in chains}
    for m, c in chains.items():
        for k in ks: float(c(arr, k))
    for r in range(5):
        for m, c in chains.items():
            for k in ks:
                t0 = time.time(); float(c(arr, k)); best[m][k] = min(best[m][k], time.time()-t0)
    for m in chains:
        per = (best[m][ks[1]] - best[m][ks[0]]) / (ks[1] - ks[0])
        print(f"{gb:5d}MiB read+{m:6s}-write: {per*1e6:9.1f} us/pass -> {N/per/1e9:6.1f} GB/s (read)")
    del arr
