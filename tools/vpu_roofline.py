"""MEASURE the VPU elem-op ceiling instead of hand-counting it.

PERF_NOTES claims the stage-1 kernels run at 85-90% of a VPU op-count
roofline — but round 2's ceiling was arithmetic (~35 ops x nameplate
3.85T elem-ops/s). VERDICT r2 #3 demands a measured ceiling: this tool
times K chained full-width int32 vector ops on (512,128) tiles through
the same fori_loop marginal methodology as bench.py, giving measured
elem-ops/s on THIS chip under current tenancy.

Method: a Pallas kernel applies N dependent-but-pipelineable ops (4
independent chains, one primitive per step, constants varying per step
so nothing folds) to every element of the tile grid. Marginal time
between two op counts on the SAME buffer cancels loads/stores and
launch overheads:

    rate = elements x (N_hi - N_lo) / (t_hi - t_lo)   [elem-ops/s]

Three op mixes bracket the real kernel's instruction blend:
- alu: add/xor cycle (the kernel's bulk);
- shift: lsr/add/xor cycle (prefix-xor ladders, flag extraction);
- mul: mul/xor cycle (nibble compress multiply-gathers).

The implied bandwidth ceiling for an n-op kernel is then
4 bytes x rate / n — restate PERF_NOTES' utilization against this.

Usage: python tools/vpu_roofline.py  (real chip; ~2 min with a warm
compile cache). Prints one JSON line with every measured rate.
"""

import functools
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE = 512
MB = int(os.environ.get("ROOFLINE_MB", "64"))

_CONSTS = np.random.default_rng(11).integers(
    1, 2**31 - 1, size=256).tolist()


def _apply(v, kind: str, k: int):
    c = jnp.int32(_CONSTS[k % len(_CONSTS)])
    if kind == "add":
        return v + c
    if kind == "xor":
        return v ^ c
    if kind == "lsr":
        return jax.lax.shift_right_logical(v, 1)
    if kind == "mul":
        return v * jnp.int32(_CONSTS[k % len(_CONSTS)] | 1)
    raise ValueError(kind)


MIXES = {
    "alu": ("add", "xor"),
    "shift": ("lsr", "add", "xor"),
    "mul": ("mul", "xor"),
}


def _probe_kernel(s_ref, w_ref, o_ref, *, n_ops: int, mix: str):
    """n_ops primitives per element: 4 independent chains (ILP for the
    VPU pipelines), one primitive per step, cycling the mix's kinds
    with per-step constants (nothing constant-folds across steps)."""
    kinds = MIXES[mix]
    x = w_ref[:] + s_ref[0]  # loop-variant: the fori_loop carry feeds in
    chains = [x, x ^ 17, x + 5, x ^ -7]
    steps = n_ops // 4
    for j in range(4):
        v = chains[j]
        for k in range(steps):
            v = _apply(v, kinds[k % len(kinds)], 4 * k + j)
        chains[j] = v
    o_ref[:] = (chains[0] ^ chains[1]) + (chains[2] ^ chains[3])


@functools.partial(jax.jit, static_argnames=("n_ops", "mix", "k"))
def _chain(w, n_ops: int, mix: str, k: int):
    rows = w.shape[0]
    grid = rows // TILE

    def call(s):
        return pl.pallas_call(
            functools.partial(_probe_kernel, n_ops=n_ops, mix=mix),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((TILE, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        )(s, w)

    def body(i, acc):
        out = call(acc.reshape(1))
        return acc + out[0, 0]

    return jax.lax.fori_loop(0, k, body, jnp.int32(0))


def _marginal(w, n_ops, mix, k_lo, k_hi, trials=5):
    mins = {k: float("inf") for k in (k_lo, k_hi)}
    for k in (k_lo, k_hi):
        float(_chain(w, n_ops, mix, k))  # compile + warm
    for _ in range(trials):
        for k in (k_lo, k_hi):
            t0 = time.time()
            float(_chain(w, n_ops, mix, k))
            mins[k] = min(mins[k], time.time() - t0)
    return (mins[k_hi] - mins[k_lo]) / (k_hi - k_lo)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:
        pass
    plat = jax.devices()[0].platform
    if plat not in ("tpu", "axon"):
        print(f"# platform {plat!r}: the roofline must be measured on "
              "the real chip", file=sys.stderr)
        sys.exit(2)

    rows = MB * 1024 * 1024 // (LANES * 4)
    rows -= rows % TILE
    w = jnp.asarray(
        np.random.default_rng(3).integers(
            -2**31, 2**31 - 1, size=(rows, LANES), dtype=np.int64
        ).astype(np.int32)
    )
    elements = rows * LANES
    OPS_LO, OPS_HI = 16, 48

    out = {"platform": plat, "elements": elements, "tile": TILE,
           "mixes": {}}
    for mix in MIXES:
        t_lo = _marginal(w, OPS_LO, mix, 8, 24)
        t_hi = _marginal(w, OPS_HI, mix, 8, 24)
        if t_hi <= t_lo:
            out["mixes"][mix] = {"error": "non-monotonic timing "
                                 f"({t_lo:.6f} vs {t_hi:.6f})"}
            continue
        rate = elements * (OPS_HI - OPS_LO) / (t_hi - t_lo)
        out["mixes"][mix] = {
            "s_per_pass_16ops": round(t_lo, 6),
            "s_per_pass_48ops": round(t_hi, 6),
            "elem_ops_per_s": round(rate / 1e12, 3),  # T elem-ops/s
            "implied_gbps_at_30_ops": round(4 * rate / 30 / 1e9, 1),
            "implied_gbps_at_35_ops": round(4 * rate / 35 / 1e9, 1),
        }
        print(f"# {mix}: {rate/1e12:.2f} T elem-ops/s "
              f"(16 ops {t_lo*1e6:.0f} us, 48 ops {t_hi*1e6:.0f} us)",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
