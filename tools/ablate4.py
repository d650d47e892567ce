"""Round-4 ablation: base/compress/pack variants on the real chip.

VERDICT r3 item 1: ablate (a) a non-MXU roll-ladder pack, (b) the pack
cost solo, and the named micro-opts (base sign-broadcast via shifts,
0x80-domain nibble compress) — each variant is GATED compiled-vs-golden
on an adversarial corpus before any timing (the rule that caught the
mm1 miscompiles twice), then timed same-batch interleaved so tenancy
cancels.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate4.py \
        [mode ...]   # default: the round-4 slate

Modes: v3, v3s (base shift), v4 (prod: nc+mm2+mul+lsr7), v4s, v4m80,
v4sm80, v4roll, v4rollslice, v4rollsm80, v4mm1 (known-miscompile canary),
sol.
"""

import functools
import json
import sys
import time

import numpy as np


SPECS = {
    # name: (kernel, kwargs)
    "v3":          ("v3", {}),
    "v3s":         ("v3", {"base_mode": "shift"}),
    "v4":          ("v4", {}),
    "v4s":         ("v4", {"base_mode": "shift"}),
    "v4m80":       ("v4", {"compress_mode": "m80"}),
    "v4sm80":      ("v4", {"base_mode": "shift", "compress_mode": "m80"}),
    "v4roll":      ("v4", {"pack_mode": "roll"}),
    "v4rollslice": ("v4", {"pack_mode": "rollslice"}),
    "v4rollsm80":  ("v4", {"pack_mode": "roll", "base_mode": "shift",
                           "compress_mode": "m80"}),
    "v4mm1":       ("v4", {"pack_mode": "mm1"}),
    "v4mm1w":      ("v4", {"pack_mode": "mm1w"}),
    "v4mm1wsm80":  ("v4", {"pack_mode": "mm1w", "base_mode": "shift",
                           "compress_mode": "m80"}),
    "v4mm4i8":     ("v4", {"pack_mode": "mm4i8"}),
    "v4nopack":    ("v4", {"pack_mode": "none"}),  # timing-only; no gate
    "sol":         ("sol", {}),
}
# NOTE: "v4rollslice" is excluded — Mosaic rejects lane strides > 2
# ('vector.extract_strided_slice' confined to [1,2)); the roll pack's
# int32 take_along_axis gather DOES lower.
DEFAULT = [
    "v3", "v3s", "v4", "v4s", "v4m80", "v4sm80", "v4roll",
    "v4rollsm80", "sol",
]
N = 64 * 1024 * 1024
TILE = 512


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from csv_simd_tpu import golden
    from csv_simd_tpu.ops.stage1_v2 import pad_to_words
    from csv_simd_tpu.ops.stage1_v3 import stage1_fused, unpack_packed_host
    from csv_simd_tpu.ops.stage1_v4 import stage1_fused_v4

    modes = sys.argv[1:] or DEFAULT
    plat = jax.devices()[0].platform
    print(f"platform: {plat}")

    # ---- gate: compiled vs golden on the adversarial corpus ----
    rng = np.random.default_rng(44)
    data = rng.choice(
        np.frombuffer(b'ab"",\n\rx,z":; \t09\xa2\x8a\x8d\xac\xff',
                      dtype=np.uint8),
        size=700_000,
    )
    ref = golden.structural_mask(data)
    gate_w2d = jnp.asarray(pad_to_words(data))
    ok_modes = []
    for m in modes:
        kind, kw = SPECS[m]
        if kind == "sol" or m == "v4nopack":
            ok_modes.append(m)
            continue
        if kind == "v3":
            p, _ = stage1_fused(gate_w2d, 0, row_tile=TILE, **kw)
            got = unpack_packed_host(np.asarray(p), data.size, tile=TILE)
        else:
            p, _, _na = stage1_fused_v4(
                gate_w2d, 0, row_tile=TILE, count_nonascii=False, **kw)
            got = np.unpackbits(
                np.ascontiguousarray(np.asarray(p)).view("<u4").view(np.uint8),
                bitorder="little")[: data.size]
        bad = int((got != ref).sum())
        print(f"gate {m:12s}: {'OK' if bad == 0 else f'MISCOMPILE {bad} bits'}")
        if bad == 0:
            ok_modes.append(m)
    sys.stdout.flush()

    # ---- timing: loop-variant fori chains, interleaved rounds ----
    rows = N // 512
    arr = jnp.asarray(
        np.random.randint(-(2**31), 2**31, (rows, 128),
                          dtype=np.int64).astype(np.int32))

    def mk(m):
        kind, kw = SPECS[m]
        if kind == "sol":
            @functools.partial(jax.jit, static_argnames=("k",))
            def chain(a, k):
                def body(i, acc):
                    return acc + jnp.sum(jnp.maximum(a, acc & 127),
                                         dtype=jnp.int32)
                return jax.lax.fori_loop(0, k, body, jnp.int32(0))
            return chain
        if kind == "v3":
            @functools.partial(jax.jit, static_argnames=("k",))
            def chain(a, k):
                def body(i, acc):
                    p, par = stage1_fused(a, acc & 1, row_tile=TILE, **kw)
                    return acc + par + p[0, 0]
                return jax.lax.fori_loop(0, k, body, jnp.int32(0))
            return chain

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(a, k):
            def body(i, acc):
                p, par, _na = stage1_fused_v4(
                    a, acc & 1, row_tile=TILE, count_nonascii=False, **kw)
                return acc + par + p[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        return chain

    chains = {m: mk(m) for m in ok_modes}
    KS = {"sol": (128, 384)}
    best = {m: {k: 1e9 for k in KS.get(m, (32, 96))} for m in ok_modes}
    # warm/compile
    for m in ok_modes:
        for k in KS.get(m, (32, 96)):
            t0 = time.time()
            float(chains[m](arr, k))
            print(f"warm {m}:{k} {time.time()-t0:.1f}s")
            sys.stdout.flush()
    # interleaved rounds
    for r in range(6):
        for m in ok_modes:
            for k in KS.get(m, (32, 96)):
                for _ in range(2):
                    t0 = time.time()
                    float(chains[m](arr, k))
                    best[m][k] = min(best[m][k], time.time() - t0)
    out = {}
    for m in ok_modes:
        (k_lo, k_hi) = KS.get(m, (32, 96))
        per = (best[m][k_hi] - best[m][k_lo]) / (k_hi - k_lo)
        gbps = N / per / 1e9
        out[m] = {"us_per_pass": round(per * 1e6, 2),
                  "gbps": round(gbps, 1)}
        print(f"{m:12s}: {per*1e6:7.2f} us/pass -> {gbps:6.1f} GB/s")
        sys.stdout.flush()
    print(json.dumps({"ablate4": out}))


if __name__ == "__main__":
    main()
