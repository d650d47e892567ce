"""Exact kernel op counts from the traced Pallas jaxpr (VERDICT r3 #2).

Walks the REAL kernel jaxpr embedded in a `pallas_call` equation (not a
re-derived twin), classifies every vector op by VPU issue class, and
weights it by its element count relative to one full-width (tile, 128)
int32 tensor. Combined with the MEASURED per-class rates from
tools/vpu_roofline.py this yields a blended per-kernel ceiling that
bench.py reports against (`vs_vpu_ceiling`).

Classes:
  alu    — add/sub/and/or/xor/not/min/max/compare/select (1 issue)
  shift  — shl / lsr / asr (measured ~3.6x faster than alu)
  mul    — integer/float multiply
  mxu    — dot_general (MXU, not VPU-issue bound; excluded from the
           VPU ceiling but listed)
  conv   — convert_element_type
  other  — broadcasts/reshapes/slices/iota/gather (layout; mostly free
           or narrow)

Measured rates (tools/vpu_roofline.py on the v5e chip, 2026-08-18):
elem-ops/s full-width int32 — alu 3.378e12, shift 12.271e12,
mul 4.496e12. conv is counted at the alu rate (conservative).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# measured on-chip (tools/vpu_roofline.py; PERF_NOTES round-3)
MEASURED_RATES = {"alu": 3.378e12, "shift": 12.271e12, "mul": 4.496e12,
                  "conv": 3.378e12}

_ALU = {
    "add", "sub", "and", "or", "xor", "not", "neg", "min", "max",
    "eq", "ne", "lt", "le", "gt", "ge", "select_n", "rem",
    "population_count", "clz",
}
_SHIFT = {"shift_left", "shift_right_logical", "shift_right_arithmetic"}
_MUL = {"mul"}
_MXU = {"dot_general"}
_CONV = {"convert_element_type"}


def _class_of(prim: str) -> str:
    if prim in _ALU:
        return "alu"
    if prim in _SHIFT:
        return "shift"
    if prim in _MUL:
        return "mul"
    if prim in _MXU:
        return "mxu"
    if prim in _CONV:
        return "conv"
    return "other"


def _walk(jaxpr, counts, tile_elems: float):
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        # recurse into nested jaxprs (pl.when -> cond, scans, ...)
        for v in eqn.params.values():
            inner = getattr(v, "jaxpr", None)
            if inner is not None:
                _walk(inner, counts, tile_elems)
            if isinstance(v, (list, tuple)):
                for w in v:
                    inner = getattr(w, "jaxpr", None)
                    if inner is not None:
                        _walk(inner, counts, tile_elems)
        cls = _class_of(prim)
        out = eqn.outvars[0].aval if eqn.outvars else None
        shape = getattr(out, "shape", ())
        elems = float(np.prod(shape)) if shape else 1.0
        w = elems / tile_elems
        counts.setdefault(cls, {"ops": 0, "weighted": 0.0})
        counts[cls]["ops"] += 1
        counts[cls]["weighted"] += w


def kernel_op_counts(fn, *args, tile: int = 512, **kw) -> Dict:
    """Trace `fn(*args, **kw)`, find every pallas_call, and count the
    inner kernel ops. `weighted` is in units of one full-width
    (tile, 128) op — a (tile, 16) op counts 0.125, a (1,1) op ~0."""
    import jax

    jaxpr = jax.make_jaxpr(fn)(*args, **kw)
    counts: Dict = {}
    tile_elems = float(tile * 128)

    def find(jx):
        for eqn in jx.eqns:
            if eqn.primitive.name == "pallas_call":
                _walk(eqn.params["jaxpr"], counts, tile_elems)
            else:
                for v in eqn.params.values():
                    inner = getattr(v, "jaxpr", None)
                    if inner is not None:
                        find(inner)

    find(jaxpr.jaxpr)
    return counts


def blended_ceiling_gbps(counts: Dict, bytes_per_row: int = 512,
                         tile: int = 512) -> float:
    """GB/s ceiling implied by the measured per-class VPU rates for a
    kernel processing `tile` rows x 512 bytes per grid step. MXU and
    `other` (layout) ops are excluded — the MXU runs concurrently with
    the VPU and layout ops are register moves; this makes the ceiling
    OPTIMISTIC (a true upper bound), which is the honest direction for
    a utilization denominator."""
    t = 0.0
    full = float(tile * 128)  # elements of one full-width op
    for cls, c in counts.items():
        if cls in ("mxu", "other"):
            continue
        rate = MEASURED_RATES[cls]
        t += c["weighted"] * full / rate
    if t == 0:
        return float("inf")
    return tile * bytes_per_row / t / 1e9
