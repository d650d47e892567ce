"""The CLI must never hang on a downed device tunnel (VERDICT r4 #5).

The axon sitecustomize force-sets jax_platforms='axon,cpu' and axon
backend init BLOCKS (not raises) when the tunnel is down. Three layers
of defense, each tested here:

1. JAX_PLATFORMS=cpu from the environment is honored (counter-override
   before any device probe);
2. the auto-platform probe runs in a SUBPROCESS with a hard timeout;
3. probe timeout/failure degrades to CPU with a warning, and the
   command completes.

The end-to-end test simulates the hang faithfully: a sitecustomize in a
temp dir registers a fake jax backend whose factory sleeps forever —
exactly the axon failure mode — and the CLI must still finish.
"""

import os
import subprocess
import sys
import textwrap

import pytest

from csv_simd_tpu.utils.backend import resolve_platform

CSV = b"sym,qty\nAAPL,3\nMSFT,5\n"


def test_explicit_flag_wins(monkeypatch):
    calls = []
    monkeypatch.setenv("JAX_PLATFORMS", "")
    assert resolve_platform("cpu", probe=lambda t: calls.append(t)) == "cpu"
    assert not calls  # no probe for an explicit flag


def test_env_cpu_honored_without_probe(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")

    def probe(_t):  # pragma: no cover - must not run
        raise AssertionError("probe must not run when env pins cpu")

    assert resolve_platform("auto", probe=probe) == "cpu"


def test_probe_timeout_falls_back_to_cpu(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "")
    warnings = []
    out = resolve_platform("auto", probe=lambda t: None,
                           warn=warnings.append)
    assert out == "cpu"
    assert warnings and "falling back to CPU" in warnings[0]
    import jax

    assert jax.config.jax_platforms == "cpu"


def test_probe_alive_leaves_auto(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "")
    assert resolve_platform("auto", probe=lambda t: "tpu") == "auto"


def _run_cli(tmp_path, extra_env, args, timeout=120):
    """Run `python -m csv_simd_tpu ...` with a sitecustomize that
    registers a hanging fake backend (the axon failure mode)."""
    site = tmp_path / "site"
    site.mkdir(exist_ok=True)
    (site / "sitecustomize.py").write_text(textwrap.dedent(
        """
        import os, time
        if os.environ.get("FAKE_TUNNEL_HANG") == "1":
            import jax
            from jax._src import xla_bridge

            def _hang_factory():
                time.sleep(3600)

            xla_bridge.register_backend_factory(
                "faketpu", _hang_factory, priority=500)
            jax.config.update("jax_platforms", "faketpu,cpu")
        """
    ))
    f = tmp_path / "t.csv"
    f.write_bytes(CSV)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # keep the repo importable; PREPEND the fake site dir so its
    # sitecustomize wins over any real one
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        [str(site), repo] + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, "-m", "csv_simd_tpu", *args, str(f)],
        capture_output=True, text=True, env=env, timeout=timeout,
    )


@pytest.mark.parametrize("cmd", [["info"], ["sql", "SELECT sym FROM t"]])
def test_cli_completes_on_hanging_backend(tmp_path, cmd):
    """No JAX_PLATFORMS set, default backend hangs: the bounded probe
    times out (3 s here) and the command completes on CPU."""
    r = _run_cli(
        tmp_path,
        {"FAKE_TUNNEL_HANG": "1", "CSV_SIMD_TPU_PROBE_TIMEOUT": "3"},
        cmd,
    )
    assert r.returncode == 0, r.stderr
    assert "falling back to CPU" in r.stderr


def test_cli_env_cpu_honored_on_hanging_backend(tmp_path):
    """JAX_PLATFORMS=cpu set, default backend hangs: honored directly
    (no probe, no warning), command completes."""
    r = _run_cli(
        tmp_path,
        {"FAKE_TUNNEL_HANG": "1", "JAX_PLATFORMS": "cpu"},
        ["info"],
    )
    assert r.returncode == 0, r.stderr
    assert "falling back to CPU" not in r.stderr
