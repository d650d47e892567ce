"""Lane-axis concat probe: can 8 (64,128) int8 values concatenate to
(64,1024) in-kernel (whole-vreg placement, no shuffles) and feed ONE
(64,1024)@(1024,128) int8 matmul? If yes, the dual-rail wide kernel
packs with 8 big matmuls instead of 64 small ones.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/widestore_probe4.py
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

T8, LANES = 64, 128


def probe_concat_mm():
    rng = np.random.default_rng(3)
    w = rng.integers(-2, 3, (8 * LANES, LANES)).astype(np.int8)
    wj = jnp.asarray(w)

    def kernel(v_ref, w_ref, o_ref):
        blocks = [
            (v_ref[:, LANES * k : LANES * (k + 1)] + k).astype(jnp.int8)
            for k in range(8)
        ]
        big = jnp.concatenate(blocks, axis=1)  # (64, 1024)
        o_ref[:] = jax.lax.dot_general(
            big, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

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
    x = rng.integers(0, 14, (T8, 8 * LANES)).astype(np.int32)
    big = np.concatenate(
        [x[:, LANES * k : LANES * (k + 1)] + k for k in range(8)],
        axis=1).astype(np.int64)
    want = (big @ w.astype(np.int64)).astype(np.int32)
    got = np.asarray(f(jnp.asarray(x), wj))
    return bool((got == want).all())


if __name__ == "__main__":
    try:
        ok = probe_concat_mm()
        print(f"probe[concat1024+mm]: "
              f"{'BIT-EXACT' if ok else 'WRONG VALUES'}", flush=True)
    except Exception as e:  # noqa: BLE001 — refusals are data
        print(f"probe[concat1024+mm]: REFUSED — "
              f"{str(e).splitlines()[0][:160]}", flush=True)
