"""Record the BASELINE scaling table, within this rig's limits.

BASELINE.md demands bytes/s at 1 chip / 1 host / N hosts. This rig
exposes ONE real TPU chip through a tunnel (no pod), so the table
records what is measurable here and says so explicitly:

- `chip`: the real-chip stage-1 scan / full-build GB/s (bench.py's
  fori_loop marginal methodology, gated on compiled-vs-golden bit
  identity). When the tunnel is down the row cites the last recorded
  on-chip numbers instead of silently vanishing (the round-2 lesson).
- `virtual_mesh`: the sharded build (shard_map + exclusive XOR-scan
  parity + psum counts) at 1/2/4/8 shards on a virtual CPU mesh, same
  buffer. CPU "devices" share the host's cores, so these rows measure
  the PARTITION + COLLECTIVE overhead profile of the sharded path (and
  its correctness at scale), not chip throughput.
- `multihost`: 2- and 4-process jax.distributed global meshes (8/16
  shards over the DCN-style coordinator), timed end-to-end per pass by
  process 0 (tools/multihost_demo.py).

Writes SCALING.json + SCALING.md at the repo root. Each section runs
in a SUBPROCESS so backend selection (axon chip vs forced-CPU virtual
devices) never bleeds across sections.

Usage: python tools/scaling_table.py [--skip-chip]
       python tools/scaling_table.py --section virtual   (internal)
       python tools/scaling_table.py --section chip      (internal)
"""

import json
import os
import socket
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

MB = int(os.environ.get("SCALING_MB", "32"))


def _buffer(n_bytes):
    from corpus import synthetic_wide_table

    import numpy as np

    data = synthetic_wide_table(n_bytes)
    return np.frombuffer(data, dtype=np.uint8)


# ------------------------------------------------- section: virtual mesh


def section_virtual():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from csv_simd_tpu import golden
    from csv_simd_tpu.ops.stage1_v2 import pad_to_words
    from csv_simd_tpu.parallel.sharded import AXIS, sharded_stage1

    devs = jax.devices()
    arr = _buffer(MB * 1024 * 1024)
    # one padded buffer shared by every mesh size: rows % (512*8) == 0
    # keeps shard_rows tile-compatible for n in {1,2,4,8}
    w2d = pad_to_words(arr)
    unit = 512 * 8
    if w2d.shape[0] % unit:
        pad = -(-w2d.shape[0] // unit) * unit - w2d.shape[0]
        w2d = np.concatenate([w2d, np.zeros((pad, 128), w2d.dtype)])
    padded = w2d.shape[0] * 512
    want = int(golden.structural_mask(arr).sum())

    rows = []
    for n in (1, 2, 4, 8):
        if n > len(devs):
            break
        mesh = Mesh(np.array(devs[:n]), (AXIS,))
        w_dev = jax.device_put(
            jnp.asarray(w2d), NamedSharding(mesh, P(AXIS, None))
        )
        out = sharded_stage1(w_dev, 0, mesh, use_pallas=False)
        jax.block_until_ready(out[0])  # compile + warm
        assert int(out[3]) == want, (n, int(out[3]), want)
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            out = sharded_stage1(w_dev, 0, mesh, use_pallas=False)
            jax.block_until_ready(out[0])
            best = min(best, time.time() - t0)
        rows.append({"shards": n, "s_per_pass": round(best, 6),
                     "gbps": round(padded / best / 1e9, 3)})
    base = rows[0]["gbps"]
    for r in rows:
        r["efficiency_vs_1"] = round(r["gbps"] / (base * r["shards"]), 3)
        r["speedup_vs_1"] = round(r["gbps"] / base, 3)
    print(json.dumps({"padded_bytes": padded, "rows": rows,
                      "total_structural": want}))


# ------------------------------------------------------- section: chip


def section_chip():
    """Real-chip scan/build GB/s via the bench marginal methodology
    (small budget: this is the scaling table's unit row, not the
    headline bench)."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:
        pass
    plat = jax.devices()[0].platform
    if plat not in ("tpu", "axon"):
        print(json.dumps({"error": f"platform {plat}, not a chip"}))
        return

    from csv_simd_tpu.offsetfree import prefix_for_packed
    from csv_simd_tpu.ops.stage1_v2 import pad_to_words
    from csv_simd_tpu.ops.stage1_v3 import stage1_fused
    from csv_simd_tpu.ops.stage1_v4 import stage1_fused_v4

    arr = _buffer(MB * 1024 * 1024)
    host_words = pad_to_words(arr)
    w2d = jnp.asarray(host_words)
    w2d_wide = jnp.asarray(host_words.reshape(-1, 1024))
    padded = host_words.shape[0] * 512

    @functools.partial(jax.jit, static_argnames=("k",))
    def scan_chain(a, k):
        def body(i, acc):
            packed, parity = stage1_fused(a, acc & 1, row_tile=512)
            return acc + parity + packed[0, 0]
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    @functools.partial(jax.jit, static_argnames=("k",))
    def build_chain(a, k):
        # the production PackedDeviceTape config (round 5): wide-
        # native kernel, prefix consuming the (rows/8,128) output
        def body(i, acc):
            packed, parity, _na = stage1_fused_v4(
                a, acc & 1, row_tile=512, count_nonascii=False,
                out_mode="wide_native")
            cum = prefix_for_packed(packed)
            return acc + parity + cum[-1] + packed[0, 0]
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    def marginal(chain, a, k_lo, k_hi, trials=4):
        mins = {k: float("inf") for k in (k_lo, k_hi)}
        for k in (k_lo, k_hi):
            float(chain(a, k))
        for _ in range(trials):
            for k in (k_lo, k_hi):
                t0 = time.time()
                float(chain(a, k))
                mins[k] = min(mins[k], time.time() - t0)
        return (mins[k_hi] - mins[k_lo]) / (k_hi - k_lo)

    scan = padded / marginal(scan_chain, w2d, 16, 48) / 1e9
    build = padded / marginal(build_chain, w2d_wide, 8, 24) / 1e9
    print(json.dumps({"scan_gbps": round(scan, 1),
                      "build_gbps": round(build, 1),
                      "padded_bytes": padded, "source": "measured"}))


# --------------------------------------------- section: host native C++


def section_native():
    """The multithreaded C++ engine (AVX2 with SWAR fallback) on THIS host: thread-scaling
    GB/s — the measured '1 host (CPU)' row of the scaling story (and
    the sensible streamed backend on this rig, PERF_NOTES 'Rig
    constraint')."""
    import numpy as np

    from csv_simd_tpu import golden, native

    if not native.available():
        print(json.dumps({"error": f"native engine unavailable: "
                          f"{native.build_error()}"}))
        return
    arr = _buffer(MB * 1024 * 1024)
    want = int(golden.structural_mask(arr).sum())
    ncpu = os.cpu_count() or 1
    threads = sorted(
        x for x in {1, 2, 4, 8, min(16, ncpu), ncpu} if x <= ncpu)
    # INTERLEAVED best-of rounds: this host's vcpus are shared and
    # tenancy drifts minute-to-minute, so timing each thread count in
    # its own block conflates drift with scaling (round-4 lesson: a
    # contended window recorded 4T efficiency 0.44 while interleaved
    # A/B measured 0.51-0.53)
    best = {t: float("inf") for t in threads}
    for t in threads:
        offs, _par = native.host_stage1(arr, n_threads=t)  # warm
        assert offs.shape[0] == want
    for _round in range(4):
        for t in threads:
            t0 = time.time()
            native.host_stage1(arr, n_threads=t)
            best[t] = min(best[t], time.time() - t0)
    rows = [{"threads": t, "s_per_pass": round(best[t], 6),
             "gbps": round(arr.size / best[t] / 1e9, 3)}
            for t in threads]
    base = rows[0]["gbps"]
    for r in rows:
        r["speedup_vs_1"] = round(r["gbps"] / base, 2)
        r["efficiency_vs_1"] = round(
            r["gbps"] / (base * r["threads"]), 3)
    print(json.dumps({"bytes": arr.size, "cpus": ncpu, "rows": rows}))


# --------------------------------------------------- section: multihost


def run_multihost(n_hosts: int):
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["MULTIHOST_BYTES"] = str(8 * 1024 * 1024)
    procs = [
        subprocess.Popen(
            [sys.executable, "tools/multihost_demo.py",
             f"127.0.0.1:{port}", str(n_hosts), str(i)],
            cwd=ROOT, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for i in range(n_hosts)
    ]
    outs = [procs[0].communicate(timeout=300)]
    outs += [p.communicate(timeout=60) for p in procs[1:]]
    for p, (_o, err) in zip(procs, outs):
        if p.returncode != 0:
            return {"hosts": n_hosts, "error": err[-500:]}
    out = outs[0][0]
    entry = {"hosts": n_hosts, "shards": n_hosts * 4}
    for line in out.splitlines():
        if line.startswith("MULTIHOST_TIME"):
            _, sec, nbytes, shards = line.split()
            entry.update(
                s_per_pass=float(sec),
                gbps=round(int(nbytes) / float(sec) / 1e9, 3),
                padded_bytes=int(nbytes), shards=int(shards),
            )
        if line.startswith("MULTIHOST_OK"):
            entry["total_structural"] = int(line.split()[1])
    return entry


# ---------------------------------------------------------------- main


def _sub(section, extra_env=None):
    env = dict(os.environ)
    env.update(extra_env or {})
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--section", section],
        capture_output=True, text=True, timeout=3600, env=env, cwd=ROOT,
    )
    if r.returncode != 0:
        return {"error": (r.stderr or "")[-500:]}
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return {"error": "no JSON line in section output"}


def main():
    if "--section" in sys.argv:
        which = sys.argv[sys.argv.index("--section") + 1]
        {"virtual": section_virtual, "chip": section_chip,
         "native": section_native}[which]()
        return

    table = {"buffer_mb": MB}
    if "--keep-chip" in sys.argv:
        # rerun the HOST sections without touching the chip row (e.g.
        # after a contended-CPU capture): reuse the existing measured
        # row instead of overwriting it with the recorded fallback
        try:
            with open(os.path.join(ROOT, "SCALING.json")) as f:
                prev_chip = json.load(f)["chip"]
        except Exception:
            prev_chip = None
        if prev_chip is not None:
            table["chip"] = prev_chip
            sys.argv.append("--skip-chip")
    chip_up = False
    if "--skip-chip" not in sys.argv:
        print("# probing the real chip (bounded)...", file=sys.stderr)
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=180,
            )
            chip_up = probe.returncode == 0
        except subprocess.TimeoutExpired:
            chip_up = False
    if "chip" in table:
        pass  # --keep-chip: measured row carried over
    elif chip_up:
        table["chip"] = _sub("chip")
    else:
        # never lose the chip row to an outage (the round-2 lesson):
        # fall back to the last recorded on-chip numbers, labeled
        table["chip"] = {
            "source": "recorded (tunnel down/skipped at capture; "
                      "BENCH_r01.json + PERF_NOTES.md round-2-late)",
            "scan_gbps": 343.8, "build_gbps": 246.8,
            "sol_gbps_range": [536, 963],
        }
    print("# host native C++ engine thread scaling...", file=sys.stderr)
    table["host_native"] = _sub("native", {"JAX_PLATFORMS": "cpu"})
    print("# virtual 8-device CPU mesh...", file=sys.stderr)
    table["virtual_mesh"] = _sub(
        "virtual",
        {"XLA_FLAGS": "--xla_force_host_platform_device_count=8",
         "JAX_PLATFORMS": "cpu"},
    )
    print("# multihost (2 and 4 processes)...", file=sys.stderr)
    table["multihost"] = [run_multihost(2), run_multihost(4)]

    with open(os.path.join(ROOT, "SCALING.json"), "w") as f:
        json.dump(table, f, indent=1)

    lines = [
        "# SCALING — recorded scaling table (BASELINE.md 'Scaling' row)",
        "",
        f"Generated by `python tools/scaling_table.py` "
        f"({MB} MiB synthetic wide table; artifact: SCALING.json).",
        "",
        "## 1 real chip (the per-chip unit of scaling)",
        "",
    ]
    chip = table["chip"]
    if "scan_gbps" in chip:
        lines += [
            f"- stage-1 scan: **{chip['scan_gbps']} GB/s**; full "
            f"offsets-free build: **{chip['build_gbps']} GB/s** "
            f"({chip.get('source', 'measured')})",
        ]
    else:
        lines += [f"- {chip.get('source', chip.get('error', '?'))}"]
    lines += [
        "",
        "## 1 host, native C++ engine, AVX2+SWAR (thread scaling, this host)",
        "",
        "| threads | s/pass | GB/s | speedup vs 1 | efficiency |",
        "|---|---|---|---|---|",
    ]
    for r in table.get("host_native", {}).get("rows", []):
        lines.append(
            f"| {r['threads']} | {r['s_per_pass']} | {r['gbps']} | "
            f"{r['speedup_vs_1']} | {r['efficiency_vs_1']} |"
        )
    lines += [
        "",
        "## Virtual 8-device CPU mesh (sharded-path overhead profile)",
        "",
        "CPU 'devices' share the host's cores: these rows measure the",
        "partition + collective overheads of the shard_map build (and",
        "its correctness at every width), not chip throughput.",
        "",
        "| shards | s/pass | GB/s | speedup vs 1 | efficiency |",
        "|---|---|---|---|---|",
    ]
    for r in table["virtual_mesh"].get("rows", []):
        lines.append(
            f"| {r['shards']} | {r['s_per_pass']} | {r['gbps']} | "
            f"{r['speedup_vs_1']} | {r['efficiency_vs_1']} |"
        )
    lines += [
        "",
        "## Multi-host (jax.distributed, DCN-style coordinator)",
        "",
        "| processes | global shards | s/pass | GB/s | structural |",
        "|---|---|---|---|---|",
    ]
    for e in table["multihost"]:
        if "error" in e:
            lines.append(f"| {e['hosts']} | - | error | - | - |")
        else:
            lines.append(
                f"| {e['hosts']} | {e['shards']} | {e['s_per_pass']} | "
                f"{e['gbps']} | {e['total_structural']} |"
            )
    lines += [
        "",
        "Real pod-slice scaling (N real chips over ICI) is not",
        "measurable on this rig (one chip via the axon tunnel); the",
        "sharded path's collectives are validated on the meshes above",
        "and compiled on the real 1-chip mesh (tools/verify_chip.py).",
        "",
    ]
    with open(os.path.join(ROOT, "SCALING.md"), "w") as f:
        f.write("\n".join(lines))
    print(json.dumps(table))


if __name__ == "__main__":
    main()
