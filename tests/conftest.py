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

import resource

# the full suite's largest compile (the interpreted whole-frame kernel scan
# in test_train) segfaulted inside XLA's CPU compiler twice in round 4 and
# once in round 5 — always late in the suite, never in isolation. Two
# defenses: let the main-thread stack grow to the hard limit (LLVM pass
# recursion on the giant interpret-mode programs), and drop accumulated
# compiled executables between test modules (see _clear_jax_caches below).
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _soft != resource.RLIM_INFINITY and _soft != _hard:
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches():
    """Drop jit/pjit executable caches after each test MODULE.

    The suite compiles hundreds of programs; keeping every executable alive
    for the whole run grew the process to the point where XLA's CPU
    compiler segfaulted on the largest late-suite compile (reproduced 3x,
    always in ``backend_compile_and_load``). Tests within a module still
    share compilations; cross-module sharing is rare and recompiles are
    cheap on CPU."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def golden():
    """Loader for reference-parity fixtures (tests/golden/*.npz)."""

    def load(name: str) -> dict[str, np.ndarray]:
        return dict(np.load(GOLDEN / f"{name}.npz"))

    return load
