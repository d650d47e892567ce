"""Host-native dense-extraction ablation (VERDICT r3 item 6).

Round-4 findings, recorded (4-vcpu shared host, 256 MiB synthetic wide
table, interleaved best-of):

| variant                            | dense 1T GB/s |
|---|---|
| classify only (no parity/extract)  | 4.9  (the loop's uop ceiling) |
| + parity chain                     | 4.0  |
| + popcount (no writes)             | 4.0  |
| + tzcnt/blsr extraction (SHIPPED)  | 3.0-3.3 |
| branch-free 8x rounds (simdjson)   | 1.48-2.9 (slower: CSV structure
|                                    |  is near-periodic, the loop
|                                    |  branch predicts well)         |
| two independent 32-bit chains      | 2.94 (no win: not chain-bound) |
| 32-bit offset staging              | 3.19 (+6%, loses after widen)  |
| quote-skip fast path               | 3.19 (93% of blocks HAVE quotes)|
| out-buffer scratch cache + copy    | 1.9-2.6 (copy > fault savings) |
| MADV_HUGEPAGE on out buffer        | +1.5% (kept: free, right ask)  |

Conclusion: the dense loop is uop-throughput-bound on this host (the
AVX2 classify alone runs at 4.9 GB/s vs 11.9 GB/s 1T stream read), so
extraction-side tricks can't reach the "2x dense 1T" target — the
remaining lever was the round-3 scratch-compaction removal, already
landed. Thread scaling meets the bar: interleaved A/B measured
1T 2.49-2.53 / 4T 5.10-5.13 GB/s = 2.05x, efficiency 0.51 (the host's
own stream bandwidth scales 2.9x at 4T, so 0.5+ is the machine).

Run:  PYTHONPATH=/root/repo python tools/ablate_native.py [mib]
"""

import ctypes
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np


def main():
    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                    "..", "tests"))
    from corpus import synthetic_wide_table

    from csv_simd_tpu import golden, native

    data = np.frombuffer(synthetic_wide_table(mib << 20), np.uint8)
    small = data[: 3 << 20]
    off, _ = native.host_stage1(small, n_threads=4)
    assert np.array_equal(
        off, np.flatnonzero(golden.structural_mask(small))), "broken"

    out = {"mib": mib, "gbps": {}}
    for nt in (1, 2, 4):
        best = 1e9
        for _ in range(5):
            t0 = time.time()
            native.host_stage1(data, n_threads=nt)
            best = min(best, time.time() - t0)
        out["gbps"][f"{nt}T"] = round(data.size / best / 1e9, 2)
    g = out["gbps"]
    out["speedup_4T"] = round(g["4T"] / g["1T"], 2)
    out["efficiency_4T"] = round(g["4T"] / g["1T"] / 4, 3)
    print(json.dumps({"ablate_native": out}))


if __name__ == "__main__":
    main()
