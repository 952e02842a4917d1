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
