"""Multi-host distributed build: N separate processes, each with local
CPU devices, joined by jax.distributed into one global mesh (DCN-style) —
the BASELINE.json "N>=2 hosts" config, simulated without a pod."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("n_hosts", [2, 4])
def test_multi_host_sharded_build(n_hosts):
    """2- and 4-process global meshes (8 and 16 shards): the parity /
    count collectives must stitch identically at any host count."""
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, "tools/multihost_demo.py", coord,
             str(n_hosts), str(i)],
            cwd="/root/repo",
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(n_hosts)
    ]
    try:
        outs = [procs[0].communicate(timeout=240)]
        outs += [p.communicate(timeout=60) for p in procs[1:]]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost demo timed out")
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-2000:]
    assert "MULTIHOST_OK" in outs[0][0]
