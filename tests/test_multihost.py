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


def test_two_host_sharded_build():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, "tools/multihost_demo.py", coord, "2", str(i)],
            cwd="/root/repo",
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    try:
        out0, err0 = procs[0].communicate(timeout=240)
        out1, err1 = procs[1].communicate(timeout=60)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost demo timed out")
    assert procs[0].returncode == 0, err0[-2000:]
    assert procs[1].returncode == 0, err1[-2000:]
    assert "MULTIHOST_OK" in out0
