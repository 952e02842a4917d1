"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths (parallel/) are validated on
``xla_force_host_platform_device_count=8`` virtual CPU devices; real-TPU
execution is exercised by bench.py / the driver instead.

Note: plugins (e.g. jaxtyping) may import jax before this file runs, so the
JAX_PLATFORMS env var alone is not reliable — we also use jax.config.update,
which works any time before the backend is first initialized.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden():
    """Loader for reference-parity fixtures (tests/golden/*.npz)."""

    def load(name: str) -> dict[str, np.ndarray]:
        return dict(np.load(GOLDEN / f"{name}.npz"))

    return load
