"""Publish exact per-kernel op counts + blended measured ceilings.

VERDICT r3 item 2: "Dump the jaxpr/Mosaic op mix for shipped v3 and v4
(counts by alu/shift/mul class), compute a blended measured ceiling per
kernel". Writes OPCOUNT.json at the repo root and prints the markdown
table for PERF_NOTES.

Runs on CPU (tracing only — no chip needed):
    PYTHONPATH=/root/repo python tools/opcount.py
"""

import json
import os
import sys

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from csv_simd_tpu.ops.stage1_v3 import stage1_fused
    from csv_simd_tpu.ops.stage1_v4 import stage1_fused_v4
    from csv_simd_tpu.utils.opcount import (
        MEASURED_RATES,
        blended_ceiling_gbps,
        kernel_op_counts,
    )

    tile = 512
    w2d = jnp.zeros((tile, 128), jnp.int32)

    kernels = {
        "v3 (fold scan, production)": lambda: kernel_op_counts(
            lambda a: stage1_fused(a, 0, row_tile=tile), w2d, tile=tile),
        "v4 (seq build, production)": lambda: kernel_op_counts(
            lambda a: stage1_fused_v4(a, 0, row_tile=tile,
                                      count_nonascii=False),
            w2d, tile=tile),
        "v4 +nonascii (validate_utf8)": lambda: kernel_op_counts(
            lambda a: stage1_fused_v4(a, 0, row_tile=tile,
                                      count_nonascii=True),
            w2d, tile=tile),
    }
    out = {"rates_elem_ops_per_s": MEASURED_RATES, "tile": tile,
           "kernels": {}}
    print("| kernel | alu | shift | mul | conv | mxu | other | "
          "blended ceiling GB/s |")
    print("|---|---|---|---|---|---|---|---|")
    for name, f in kernels.items():
        c = f()
        ceil = blended_ceiling_gbps(c, tile=tile)
        out["kernels"][name] = {
            "counts": {k: {"ops": v["ops"],
                           "weighted_fullwidth": round(v["weighted"], 3)}
                       for k, v in sorted(c.items())},
            "blended_ceiling_gbps": round(ceil, 1),
        }
        def fmt(k):
            v = c.get(k)
            return f"{v['weighted']:.1f} ({v['ops']})" if v else "0"
        print(f"| {name} | {fmt('alu')} | {fmt('shift')} | {fmt('mul')} "
              f"| {fmt('conv')} | {fmt('mxu')} | {fmt('other')} "
              f"| {ceil:.0f} |")
    path = os.path.join(os.path.dirname(__file__), "..", "OPCOUNT.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {os.path.abspath(path)}", file=sys.stderr)


if __name__ == "__main__":
    main()
