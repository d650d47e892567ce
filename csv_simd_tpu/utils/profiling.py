"""Device profiling hooks (SURVEY.md §5.1): thin wrappers over
jax.profiler so a pipeline run can emit a TensorBoard-viewable trace, and
named scopes so kernel launches are attributable in the trace."""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/csv_simd_tpu_trace") -> Iterator[str]:
    """Capture a device trace around a block; yields the log dir.

    Degrades to a no-op (still yields) if the profiler is unavailable —
    e.g. remote-execution backends that don't export device traces."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    started = False
    try:
        try:
            jax.profiler.start_trace(log_dir)
            started = True
        except Exception:
            pass
        yield log_dir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def named(name: str):
    """Named scope for trace attribution: with named('stage1'): ..."""
    import jax

    return jax.profiler.TraceAnnotation(name)
