"""Round-3 lowering probes for the wide-store kernel (VERDICT r4 item
1): after reshape (unsupported shape cast) and strided sublane slices
(vector.extract_strided_slice refused) died, the remaining
construction views the INPUT as (rows/8, 1024) — a free bitcast
outside the kernel — and works per 128-lane block:

  laneload — contiguous lane-window REF loads w_ref[:, 128k:128k+128]
             (memory ops, not vreg shuffles)
  mmLb     — per-block lane-PLACED (128,128) int8 pack matmul whose
             output lands in lanes 16k..16k+15, OR-combined full-width
             into one dense (64,128) store

    PYTHONPATH=/root/repo:/root/.axon_site python tools/widestore_probe3.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

T8 = 64
LANES = 128


def probe_laneload():
    def kernel(v_ref, o_ref):
        acc = None
        for k in range(8):
            x = v_ref[:, LANES * k : LANES * (k + 1)]
            acc = x if acc is None else acc + x
        o_ref[:] = acc

    f = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((T8, 8 * LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T8, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T8, LANES), jnp.int32),
    )
    x = np.arange(T8 * 8 * LANES, dtype=np.int32).reshape(T8, 8 * LANES)
    want = x.reshape(T8, 8, LANES).sum(axis=1, dtype=np.int32)
    got = np.asarray(f(jnp.asarray(x)))
    return bool((got == want).all())


def probe_mmLb():
    w = np.zeros((8, LANES, LANES), np.int8)
    for k in range(8):
        for lane in range(LANES):
            g, l = divmod(lane, 8)
            w[k, lane, 16 * k + g] = 1 if l % 2 == 0 else 16
    wj = jnp.asarray(w.reshape(8 * LANES, LANES))

    def kernel(v_ref, w_ref, o_ref):
        acc = None
        for k in range(8):
            x = v_ref[:, LANES * k : LANES * (k + 1)].astype(jnp.int8)
            p = jax.lax.dot_general(
                x, w_ref[LANES * k : LANES * (k + 1), :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = p if acc is None else (acc | p)
        o_ref[:] = acc

    f = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((T8, 8 * LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8 * LANES, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T8, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T8, LANES), jnp.int32),
    )
    rng = np.random.default_rng(7)
    x = rng.integers(0, 16, (T8, 8 * LANES)).astype(np.int32)
    want = np.zeros((T8, LANES), np.int64)
    for k in range(8):
        want |= x[:, LANES * k : LANES * (k + 1)].astype(np.int64) \
            @ w[k].astype(np.int64)
    got = np.asarray(f(jnp.asarray(x), wj))
    return bool((got == want.astype(np.int32)).all())


if __name__ == "__main__":
    for name, fn in (("laneload", probe_laneload), ("mmLb", probe_mmLb)):
        try:
            ok = fn()
            print(f"probe[{name}]: {'BIT-EXACT' if ok else 'WRONG VALUES'}",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — refusals are data
            msg = str(e).split("\n")[0][:160]
            print(f"probe[{name}]: REFUSED — {msg}", flush=True)
