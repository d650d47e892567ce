"""Test harness config: force JAX onto a virtual 8-device CPU platform so
sharding/collective paths are exercised without TPU hardware (the driver
separately dry-runs the multi-chip path; bench.py runs on the real chip)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin's sitecustomize register() force-sets
# jax_platforms="axon,cpu" at interpreter start, overriding the env var —
# counter-override it so tests run on the virtual CPU mesh.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_RES = pathlib.Path("/root/reference/res")


def _fixture(name: str) -> bytes:
    path = REFERENCE_RES / name
    if not path.exists():
        pytest.skip(f"reference fixture {name} not available")
    return path.read_bytes()


@pytest.fixture
def reader_test01() -> bytes:
    """96 B, 3-field, LF, ragged last row (uniform-stride violation)."""
    return _fixture("reader_test01.csv")


@pytest.fixture
def sample_csv() -> bytes:
    """300 B, 3-field, LF, quoted single chars; stride 3 x 15."""
    return _fixture("sample.csv")


@pytest.fixture
def sample_rx() -> bytes:
    """623 B, 8-field, CRLF, UTF-8 BOM, comma inside quotes; stride 9 x 8."""
    return _fixture("sample_rx.csv")
