"""Mosaic toolchain regression probes.

Every lowering this project found broken (or load-bearing) on the
current Mosaic/TPU toolchain, as one self-contained probe each:
compile the construct on the REAL chip and compare bit-exactly against
interpret mode. One command prints the fixed/broken matrix — re-run
after every toolchain bump (PERF_NOTES.md "Round-3 candidates").

Why each probe exists (all caught on hardware, rounds 1-2):

- matmul32_slice / matmul32_roll: the (T,32) MATMUL-OUTPUT path —
  a single (128,32) bf16 matmul emitting both 16-bit halves, combined
  with an offset lane slice or a pltpu.roll — measured 11% faster than
  the shipped two-(128,16)-matmul pack and passed every interpret-mode
  test, but BOTH miscompiled silently (7361 mismatched bits / 700 KB);
  bench.py's on-chip gate caught them. If these ever report `fixed`,
  re-run the single-matmul pack ablation (tools/ablate2.py) — it
  reopens the 247->344 GB/s full-build gap (stage1_v4.py in-kernel
  NOTE).
- int8_lane_gather: take_along_axis lane gathers lower for int32 but
  NOT int8; with int8 fixed, the vpshufb-style LUT classify becomes
  viable again (~14 -> ~8 classify ops; PERF_NOTES "LUT classify").
- cmp8 / select8: 8-bit vector compares/selects CRASH this toolchain
  inside Pallas kernels (CLAUDE.md) — the SWAR int32 classify exists
  because of this.
- sublane_concat: sublane-axis pad/concat shifts don't lower — row
  scans ride MXU matmuls instead (stage1_v3/v4).
- unsigned_reduce: unsigned reductions unsupported — kernels use int32
  two's-complement bit patterns throughout.

Usage: python tools/mosaic_probes.py  (needs the real chip; interpret
mode is the reference, so a CPU-only run would be vacuous).
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, L = 8, 128

PROBES = []


def probe(name, note):
    def deco(fn):
        PROBES.append((name, note, fn))
        return fn

    return deco


def _run_both(kernel, out_shape, *args):
    """Run a kernel compiled and in interpret mode; compare bit-exactly.
    Returns (status, detail)."""

    def call(interpret):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(*out_shape),
            interpret=interpret,
        )(*args)

    golden = np.asarray(call(True))
    try:
        got = np.asarray(jax.block_until_ready(call(False)))
    except Exception as e:  # noqa: BLE001 — any lowering/compile failure
        msg = str(e).splitlines()[0][:120]
        return "broken-crash", msg
    if got.shape != golden.shape or not (got == golden).all():
        bad = int((got != golden).sum()) if got.shape == golden.shape else -1
        return "broken-miscompile", f"{bad} mismatched elements"
    return "fixed", "compiled output bit-identical to interpret"


def _pack_weights32() -> np.ndarray:
    """(128, 32) bf16-exact weights: word g's low half from lanes
    8g..8g+3 (cols 0..15), high half from lanes 8g+4..8g+7 (cols
    16..31) — the removed single-matmul pack's construction."""
    w = np.zeros((L, 32), np.float32)
    for lane in range(L):
        g, l = divmod(lane, 8)
        w[lane, g + (0 if l < 4 else 16)] = float(1 << (4 * (l % 4)))
    return w


_RNG = np.random.default_rng(7)
_V = jnp.asarray(_RNG.integers(0, 16, size=(T, L)), jnp.int32)
_W32 = jnp.asarray(_pack_weights32(), jnp.bfloat16)


@probe("matmul32_slice",
       "(T,32) matmul output consumed via offset lane slice")
def _p_mm_slice():
    def kernel(v_ref, w_ref, o_ref):
        vb = v_ref[:].astype(jnp.bfloat16)
        o = jax.lax.dot_general(
            vb, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        o_ref[:] = o[:, :16] | (o[:, 16:] << 16)

    return _run_both(kernel, ((T, 16), jnp.int32), _V, _W32)


@probe("matmul32_roll",
       "(T,32) matmul output consumed via pltpu.roll combine")
def _p_mm_roll():
    def kernel(v_ref, w_ref, o_ref):
        vb = v_ref[:].astype(jnp.bfloat16)
        o = jax.lax.dot_general(
            vb, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        hi = pltpu.roll(o, shift=32 - 16, axis=1)
        o_ref[:] = (o | (hi << 16))[:, :16]

    return _run_both(kernel, ((T, 16), jnp.int32), _V, _W32)


@probe("int8_lane_gather",
       "take_along_axis lane gather on int8 (int32 gathers DO lower)")
def _p_i8_gather():
    lut = jnp.asarray(_RNG.integers(-128, 127, size=(T, L)), jnp.int8)
    idx = jnp.asarray(_RNG.integers(0, L, size=(T, L)), jnp.int32)

    def kernel(l_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(l_ref[:], i_ref[:], axis=1)

    return _run_both(kernel, ((T, L), jnp.int8), lut, idx)


@probe("cmp8", "8-bit vector compare (eq) inside a kernel")
def _p_cmp8():
    a = jnp.asarray(_RNG.integers(0, 255, size=(T, L)), jnp.uint8)

    def kernel(a_ref, o_ref):
        o_ref[:] = (a_ref[:] == jnp.uint8(0x2C)).astype(jnp.int32)

    return _run_both(kernel, ((T, L), jnp.int32), a)


@probe("select8", "8-bit vector select (jnp.where on uint8 lanes)")
def _p_sel8():
    a = jnp.asarray(_RNG.integers(0, 255, size=(T, L)), jnp.uint8)

    def kernel(a_ref, o_ref):
        x = a_ref[:]
        o_ref[:] = jnp.where(x > jnp.uint8(127), x, jnp.uint8(7))

    return _run_both(kernel, ((T, L), jnp.uint8), a)


@probe("sublane_concat", "sublane-axis shift via pad/concat")
def _p_sublane():
    def kernel(v_ref, o_ref):
        x = v_ref[:]
        shifted = jnp.concatenate(
            [jnp.zeros((1, L), jnp.int32), x[:-1]], axis=0
        )
        o_ref[:] = x + shifted

    return _run_both(kernel, ((T, L), jnp.int32), _V)


@probe("unsigned_reduce", "jnp.sum over uint32 lanes")
def _p_unsigned():
    a = jnp.asarray(_RNG.integers(0, 2**31, size=(T, L)), jnp.uint32)

    def kernel(a_ref, o_ref):
        o_ref[0, 0] = jnp.sum(a_ref[:])

    return _run_both(kernel, ((1, 1), jnp.uint32), a)


@probe("mm1_in_context",
       "the FULL v4 kernel with pack_mode='mm1' vs golden — the probe "
       "that decides adoption (round 3: isolated (T,32) probes passed "
       "while this still miscompiled)")
def _p_mm1_in_context():
    from csv_simd_tpu import golden
    from csv_simd_tpu.ops.stage1_v2 import pad_to_words
    from csv_simd_tpu.ops.stage1_v4 import stage1_fused_v4

    rng = np.random.default_rng(2026)
    data = rng.choice(
        np.frombuffer(b'ab"",\n\rx,z":; \t09\xa2\x8a\x8d\xac\xff',
                      dtype=np.uint8),
        size=700_000,
    )
    ref = golden.structural_mask(data)
    w2d = jnp.asarray(pad_to_words(data))
    try:
        p4, _, _ = stage1_fused_v4(w2d, 0, row_tile=512,
                                   count_nonascii=False,
                                   pack_mode="mm1")
    except Exception as e:  # pragma: no cover - crash counts as broken
        return "broken-crash", str(e)[:120]
    m4 = np.unpackbits(
        np.ascontiguousarray(np.asarray(p4)).view("<u4").view(np.uint8),
        bitorder="little",
    )[: data.size]
    bad = int((m4 != ref).sum())
    if bad:
        return "broken-wrong", f"{bad} mismatched bits vs golden"
    return "fixed", "compiled mm1 pack bit-identical to golden"


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:
        pass
    plat = jax.devices()[0].platform
    if plat not in ("tpu", "axon"):
        print(f"# platform is {plat!r}: probes need the real chip "
              "(interpret mode is the reference side)", file=sys.stderr)
        sys.exit(2)
    results = {}
    for name, note, fn in PROBES:
        status, detail = fn()
        results[name] = status
        print(f"{name:18s} {status:18s} {detail}   [{note}]")
    print(json.dumps({"platform": plat, "probes": results}))
    if results.get("mm1_in_context") == "fixed":
        print("# the mm1 pack now compiles correctly IN CONTEXT: run "
              "the same-batch A/B (tools/ablate2.py v4ncmm1:512 "
              "v4nc:512) and adopt if it wins — expected ~11% on the "
              "v4 build (PERF_NOTES).", file=sys.stderr)
    elif results.get("matmul32_slice") == "fixed" \
            and results.get("matmul32_roll") == "fixed":
        print("# isolated (T,32) probes pass but the in-context pack "
              "is still broken — round 3 showed the isolated probes "
              "are NOT sufficient; trust mm1_in_context only.",
              file=sys.stderr)


if __name__ == "__main__":
    main()
