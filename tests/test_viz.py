"""Smoke coverage for the plotting aids (reference parity: the per-file
plot helpers at e.g. func_VAELE_MQAM_shaping.py:328-376)."""

import numpy as np
import pytest

mpl = pytest.importorskip("matplotlib")
mpl.use("Agg")

from vae_equalizer_tpu.viz import (
    constellation_plot,
    correlation_plot,
    expectation_constellation,
)


def test_constellation_plot_accepts_all_layouts(tmp_path):
    rng = np.random.default_rng(0)
    out = tmp_path / "c.png"
    # stacked planes (2, N), per-pol planes (2, 2, N), complex (N,), complex (2, N)
    for arr in (
        rng.normal(size=(2, 100)).astype(np.float32),
        rng.normal(size=(2, 2, 100)).astype(np.float32),
        (rng.normal(size=100) + 1j * rng.normal(size=100)).astype(np.complex64),
        (rng.normal(size=(2, 100)) + 1j * rng.normal(size=(2, 100))).astype(np.complex64),
    ):
        fig = constellation_plot(arr, save=str(out))
        assert out.exists() and fig.axes
        out.unlink()


def test_expectation_and_correlation_plots():
    rng = np.random.default_rng(1)
    amps = np.linspace(-1, 1, 8).astype(np.float32)
    q = rng.random((2, 16, 50)).astype(np.float32)
    q /= q.sum(axis=1, keepdims=True)
    fig = expectation_constellation(q, amps)
    assert fig.axes
    fig2 = correlation_plot(rng.normal(size=200), rng.normal(size=200))
    assert "peak" in fig2.axes[0].get_title()
