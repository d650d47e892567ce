"""Platform resolution that cannot hang on a downed device tunnel.

The axon sitecustomize on this class of host force-sets
``jax_platforms='axon,cpu'``, overriding ``JAX_PLATFORMS=cpu`` from the
environment — and axon backend init HANGS (not raises) when the tunnel
is down. bench.py has always probed the backend in a bounded subprocess
for exactly this reason; the CLI must too (a CLI that blocks forever is
worse than the reference's stub, bin/main.rs:11-14). Three rules:

1. an explicit ``--platform`` flag always wins;
2. ``JAX_PLATFORMS=cpu`` in the environment is honored by
   counter-overriding the sitecustomize BEFORE the first device probe
   (the env var is the user speaking; the sitecustomize is plumbing);
3. otherwise the default platform is probed in a SUBPROCESS with a hard
   timeout — on timeout or failure we fall back to CPU with a warning
   instead of hanging the command.
"""

from __future__ import annotations

import os
import subprocess
import sys

#: seconds the auto-platform probe may spend initializing the backend
#: (tunnel round-trips make a healthy init take a few seconds; a downed
#: tunnel blocks forever). Override: CSV_SIMD_TPU_PROBE_TIMEOUT.
DEFAULT_PROBE_TIMEOUT = 75.0


def honor_cpu_env() -> bool:
    """If the user set JAX_PLATFORMS=cpu, make it stick (the
    sitecustomize may have overridden it). Returns True when applied."""
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
        return True
    return False


def _probe_default_platform(timeout: float) -> str | None:
    """Initialize jax's default backend in a subprocess (inheriting this
    process's environment, so the same sitecustomize applies) and return
    its platform name, or None on failure/timeout."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout,
        )
    except (subprocess.TimeoutExpired, OSError):
        return None
    if r.returncode != 0 or not r.stdout:
        return None
    return r.stdout.strip().splitlines()[-1]


def resolve_platform(flag: str = "auto", *, probe=None,
                     warn=None) -> str:
    """Pin jax_platforms so no later device probe can hang.

    flag: 'auto' | 'cpu' | 'tpu' (the CLI --platform choices). Returns
    the platform decision ('auto' means "default backend confirmed
    alive — leave jax's own selection in place"). `probe`/`warn` are
    injectable for tests.

    Note the probe is NOT cached: a "recently alive" cache would
    re-open the hang window the moment the tunnel dies inside the TTL.
    The extra bounded subprocess init is the price of the guarantee."""
    import jax

    if flag != "auto":
        jax.config.update("jax_platforms", flag)
        return flag
    if honor_cpu_env():
        return "cpu"
    timeout = float(os.environ.get("CSV_SIMD_TPU_PROBE_TIMEOUT",
                                   DEFAULT_PROBE_TIMEOUT))
    plat = (probe or _probe_default_platform)(timeout)
    if plat is None:
        (warn or (lambda m: print(m, file=sys.stderr)))(
            "warning: jax default backend unavailable (probe timed out "
            f"after {timeout:.0f}s or failed) — falling back to CPU; "
            "pass --platform tpu to insist"
        )
        jax.config.update("jax_platforms", "cpu")
        return "cpu"
    return "auto"
