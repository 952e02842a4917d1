"""Whole-frame fused CMA chunk kernel vs the lax.scan chunked engine.

ops/cma_frame_kernel.py must reproduce models/cma.py:_cma_chunked (itself
golden-tested against the reference's CMAbatch/CMAflex) to float-reduction
noise: same outputs, same adapted taps, same errors, including the
reference's storage-roll and late-update quirks. Interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_equalizer_tpu.models.cma import cma_batch_dp, cma_flex_dp, dirac_taps_dp
from vae_equalizer_tpu.ops.cma_frame_kernel import cma_chunked_frame_pallas


def _rx(n=4000, seed=3):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(2, 2, n)).astype(np.float32))


@pytest.mark.parametrize("name,B,S,lr", [
    ("CMAbatch", 100, 100, 1e-4),
    ("CMAflex", 100, 10, 5e-5),
    ("CMAflex-S25", 100, 25, 5e-5),
])
def test_matches_scan_engine(name, B, S, lr):
    rx = _rx()
    h0 = dirac_taps_dp(25)
    if S == B:
        out_r, h_r, e_r = cma_batch_dp(rx, 1.0, h0, lr, B, 2, True)
    else:
        out_r, h_r, e_r = cma_flex_dp(rx, 1.0, h0, lr, B, S, 2, True)
    out_k, h_k, e_k = cma_chunked_frame_pallas(rx, 1.0, h0, lr, B, S, 2, interpret=True)
    np.testing.assert_allclose(out_k, out_r, rtol=1e-4, atol=2e-6)
    np.testing.assert_allclose(h_k, h_r, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(e_k, e_r, rtol=1e-4, atol=5e-6)


def test_small_m_and_tail_coverage():
    """Odd chunk/tail arithmetic: frame length not a multiple of S."""
    rx = _rx(n=2 * 1037, seed=9)
    h0 = dirac_taps_dp(11)
    out_r, h_r, e_r = cma_flex_dp(rx, 1.0, h0, 1e-4, 60, 20, 2, True)
    out_k, h_k, e_k = cma_chunked_frame_pallas(rx, 1.0, h0, 1e-4, 60, 20, 2, interpret=True)
    assert out_k.shape == out_r.shape == (2, 2, 1037)
    np.testing.assert_allclose(out_k, out_r, rtol=1e-4, atol=2e-6)
    np.testing.assert_allclose(h_k, h_r, rtol=1e-4, atol=1e-7)


@pytest.mark.parametrize("name,B,S,lr", [
    ("CMAbatch", 100, 100, 1e-4),
    ("CMAflex", 100, 20, 5e-5),
])
def test_rb_kernel_matches_single_run_stack(name, B, S, lr):
    """Runs-batched chunk kernel == a stack of single-run kernel calls
    (n_slots = 1 and > 1 exercise the ring layouts with a leading R)."""
    from vae_equalizer_tpu.ops.cma_frame_kernel import (
        cma_chunked_frame_pallas_rb,
    )

    R = 3
    rng = np.random.default_rng(11)
    rx = jnp.asarray(rng.normal(size=(R, 2, 2, 3000)).astype(np.float32))
    h0 = jnp.stack([
        dirac_taps_dp(25) + 0.01 * jnp.asarray(
            rng.normal(size=dirac_taps_dp(25).shape).astype(np.float32))
        for _ in range(R)
    ])
    out_b, h_b, e_b = cma_chunked_frame_pallas_rb(
        rx, 1.0, h0, lr, B, S, 2, interpret=True
    )
    assert out_b.shape == (R, 2, 2, 1500)
    for r in range(R):
        out_s, h_s, e_s = cma_chunked_frame_pallas(
            rx[r], 1.0, h0[r], lr, B, S, 2, interpret=True
        )
        np.testing.assert_allclose(out_b[r], out_s, rtol=1e-5, atol=2e-6)
        np.testing.assert_allclose(h_b[r], h_s, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(e_b[r], e_s, rtol=1e-5, atol=5e-6)


def test_cma_frame_experiment_runs_batched(monkeypatch):
    """runs with use_pallas="frame" ride the kernel-level runs batch; the
    per-run key streams equal the vmapped scan-engine path, so results must
    match it to chunk-kernel parity tolerance and runs stay distinct."""
    import vae_equalizer_tpu.ops.cma_frame_kernel as cfk
    from vae_equalizer_tpu.train.dp import run_cma_dp
    from vae_equalizer_tpu.utils.config import DpConfig

    orig = cfk.cma_chunked_frame_pallas_rb
    monkeypatch.setattr(
        cfk, "cma_chunked_frame_pallas_rb",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )

    cfg = DpConfig(
        loss_type="CMAbatch", mod="4-QAM", snr_db=20.0, num_frames=2,
        n_frame_max=2000, lr=1e-4, batch_len=100,
    )
    key = jax.random.PRNGKey(5)
    ref = run_cma_dp(cfg, key, runs=4)  # vmapped scan engine
    res = run_cma_dp(cfg, key, runs=4, use_pallas="frame", runs_batch=2)
    assert res["ser"].shape == ref["ser"].shape == (4, 4, 2)
    assert res["taps"].shape == (4, 2, 2, 2, 25)
    np.testing.assert_allclose(res["ser"], ref["ser"], atol=2e-3)
    np.testing.assert_allclose(res["taps"], ref["taps"], rtol=1e-4, atol=1e-6)
    assert len({float(s) for s in res["ser"][:, 0, -1]}) > 1
