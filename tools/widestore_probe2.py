"""Lowering probes for wide-store construction candidates (VERDICT r4
item 1 avenue (c), after the in-kernel (512,16)->(64,128) reshape was
REFUSED by infer-vector-layout).

Candidates that avoid both the unsupported shape cast and the toxic
matmul-output-slice class:
  s8   — strided SUBLANE slice v[s::8] of a VPU value (pre-matmul)
  st16 — 16-lane windowed ref store o_ref[:, 16s:16s+16] = (64,16)
  mmL  — lane-PLACED (128,128) int8 pack weights: output lands in
         lanes 16s..16s+15 directly, consumed full-width by OR

Each probe compares compiled-on-chip vs numpy. Isolated probes
under-constrain (CLAUDE.md) — survivors must still pass the full v4
gate — but a refusal here kills a candidate cheaply.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/widestore_probe2.py
"""

import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

T = 512


def probe_s8_st16():
    """v[s::8] strided sublane slice + 16-lane windowed ref store."""
    def kernel(v_ref, o_ref):
        v = v_ref[:]
        for s in range(8):
            vs = jax.lax.slice(v, (s, 0), (T, 128), (8, 1))  # (64,128)
            o_ref[:, 16 * s : 16 * (s + 1)] = vs[:, :16]

    f = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((T, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T // 8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T // 8, 128), jnp.int32),
    )
    x = np.arange(T * 128, dtype=np.int32).reshape(T, 128)
    want = np.zeros((T // 8, 128), np.int32)
    for s in range(8):
        want[:, 16 * s : 16 * (s + 1)] = x[s::8, :16]
    got = np.asarray(f(jnp.asarray(x)))
    return bool((got == want).all())


def probe_mmL():
    """int8 matmul with lane-placed weights: nibble input (values<16),
    plane-0 output must land in lanes 16s..16s+15, full-width OR."""
    LANES = 128
    w = np.zeros((8, LANES, LANES), np.int8)
    for s in range(8):
        for lane in range(LANES):
            g, l = divmod(lane, 8)
            if l == 0:
                w[s, lane, 16 * s + g] = 1
            elif l == 1:
                w[s, lane, 16 * s + g] = 16
    wj = jnp.asarray(w.reshape(8 * LANES, LANES))

    def kernel(v_ref, w_ref, o_ref):
        v = v_ref[:]
        acc = None
        for s in range(8):
            vs = jax.lax.slice(v, (s, 0), (T, 128), (8, 1)).astype(jnp.int8)
            p = jax.lax.dot_general(
                vs, w_ref[LANES * s : LANES * (s + 1), :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = p if acc is None else (acc | p)
        o_ref[:] = acc

    f = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((T, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8 * LANES, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T // 8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T // 8, 128), jnp.int32),
    )
    rng = np.random.default_rng(7)
    x = rng.integers(0, 16, (T, 128)).astype(np.int32)
    want = np.zeros((T // 8, 128), np.int64)
    for s in range(8):
        xs = x[s::8].astype(np.int64)
        p = xs @ w[s].astype(np.int64)
        want = want | p
    got = np.asarray(f(jnp.asarray(x), wj))
    return bool((got == want.astype(np.int32)).all())


if __name__ == "__main__":
    for name, fn in (("s8+st16", probe_s8_st16), ("mmL", probe_mmL)):
        try:
            ok = fn()
            print(f"probe[{name}]: {'BIT-EXACT' if ok else 'WRONG VALUES'}",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — refusals are data
            msg = str(e).split("\n")[0][:160]
            print(f"probe[{name}]: REFUSED — {msg}", flush=True)
