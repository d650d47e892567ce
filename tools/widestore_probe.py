"""On-chip gate + A/B for stage1_fused_v4 out_mode='wide' (VERDICT r4
item 1, avenue (c)): the kernel stores (tile/8,128) WIDE blocks and the
wrapper reshapes back to the (rows,16) contract (an XLA bitcast).

dma_probe2 showed the narrow (rows,16) out DMA is layout-bound at
1 GiB (narrow 298.8 / tall8 297.0 / wide 521.7 GB/s) and that
reshape-reads cost nothing. The remaining question is whether the
IN-KERNEL (tile,16)->(tile/8,128) melt (a) compiles bit-exact on this
Mosaic toolchain (isolated probes under-constrain — gate runs the FULL
production kernel on the adversarial corpus, CLAUDE.md), and (b) is
cheaper than the narrow DMA it replaces.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/widestore_probe.py [mb ...]
"""

import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import bench
from csv_simd_tpu import golden
from csv_simd_tpu.offsetfree import prefix_for_packed
from csv_simd_tpu.ops.stage1_v2 import pad_to_words
from csv_simd_tpu.ops.stage1_v4 import stage1_fused_v4


def gate():
    rng = np.random.default_rng(2026)
    data = rng.choice(
        np.frombuffer(b'ab"",\n\rx,z":; \t09\xa2\x8a\x8d\xac\xff',
                      dtype=np.uint8),
        size=700_000,
    )
    ref = golden.structural_mask(data)
    w2d = jnp.asarray(pad_to_words(data))
    for mode in ("narrow", "wide"):
        p4, _, _na = stage1_fused_v4(w2d, 0, row_tile=512,
                                     count_nonascii=False, out_mode=mode)
        m4 = np.unpackbits(
            np.ascontiguousarray(np.asarray(p4)).view("<u4").view(np.uint8),
            bitorder="little",
        )[: data.size]
        ok = bool((m4 == ref).all())
        print(f"gate[{mode}]: {'BIT-IDENTICAL' if ok else 'MISMATCH'}",
              flush=True)
        if not ok:
            sys.exit(1)
    # carry=1 cross-mode identity on the same buffer
    a = stage1_fused_v4(w2d, 1, row_tile=512, count_nonascii=False)
    b = stage1_fused_v4(w2d, 1, row_tile=512, count_nonascii=False,
                        out_mode="wide")
    assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert int(a[1]) == int(b[1])
    print("gate[carry=1 cross-mode]: BIT-IDENTICAL", flush=True)


def make_chains(mode):
    @functools.partial(jax.jit, static_argnames=("k",))
    def scan_chain(a, k):
        def body(i, acc):
            packed, parity, _na = stage1_fused_v4(
                a, acc & 1, row_tile=512, count_nonascii=False,
                out_mode=mode)
            return acc + parity + packed[0, 0]
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    @functools.partial(jax.jit, static_argnames=("k",))
    def build_chain(a, k):
        def body(i, acc):
            packed, parity, _na = stage1_fused_v4(
                a, acc & 1, row_tile=512, count_nonascii=False,
                out_mode=mode)
            cum = prefix_for_packed(packed)
            return acc + parity + cum[-1] + packed[0, 0]
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    @functools.partial(jax.jit, static_argnames=("k",))
    def buildf_chain(a, k):
        """full build with the IN-KERNEL fused prefix (round-5
        re-measure of the fusion round 4 refuted for narrow)."""
        def body(i, acc):
            packed, parity, _na, cum = stage1_fused_v4(
                a, acc & 1, row_tile=512, count_nonascii=False,
                out_mode=mode, emit_prefix=True)
            return acc + parity + cum[-1] + packed[0, 0]
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    return scan_chain, build_chain, buildf_chain


def run(mb):
    n = mb * 1024 * 1024
    data = bench._gen_csv(n)
    arr8 = np.frombuffer(data, dtype=np.uint8)
    host = pad_to_words(arr8)
    w2d = jnp.asarray(host)
    # pre-shaped wide input: host-side reshape is free; feeding it
    # directly avoids the in-jit (rows,128)->(rows/8,1024) reshape
    # (XLA materializes that copy at the 1 GiB scale)
    w2d_w = jnp.asarray(np.asarray(host).reshape(-1, 1024))
    n_padded = host.shape[0] * 512
    ks = (2, 6) if mb >= 512 else (16, 48)
    specs = {}
    for mode, kmode, arr in (("narrow", "narrow", w2d),
                             ("widen", "wide_native", w2d_w)):
        sc, bc, bf = make_chains(kmode)
        specs[f"scan_{mode}"] = (sc, arr, *ks)
        specs[f"build_{mode}"] = (bc, arr, *ks)
        if kmode == "wide_native":
            specs[f"buildf_{mode}"] = (bf, arr, *ks)
    pers = bench._marginal_multi(specs, trials=6, reps=2)
    for name, per in pers.items():
        print(f"{mb:5d}MiB {name:13s}: {per*1e6:9.1f} us/pass "
              f"-> {n_padded/per/1e9:6.1f} GB/s", flush=True)
    del w2d, w2d_w


if __name__ == "__main__":
    gate()
    for mb in [int(x) for x in sys.argv[1:]] or (64, 1024):
        run(mb)
