"""Pallas kernels vs their XLA reference implementations (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from vae_equalizer_tpu.models import cma_dp
from vae_equalizer_tpu.ops import cma_dp_pallas


def test_cma_pallas_matches_scan(golden):
    g = golden("cma_dp")
    out1, h1, e1 = cma_dp(jnp.asarray(g["Rx"]), 1.0, jnp.asarray(g["h0"]), float(g["lr"]), 2, True)
    out2, h2, e2 = cma_dp_pallas(
        jnp.asarray(g["Rx"]), 1.0, jnp.asarray(g["h0"]), float(g["lr"]), 2, True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(e1), rtol=1e-4, atol=1e-6)
    # and therefore matches the PyTorch golden too
    np.testing.assert_allclose(np.asarray(out2), g["out"], rtol=1e-4, atol=1e-5)


def test_cma_pallas_eval_mode(golden):
    g = golden("cma_dp")
    h0 = jnp.asarray(g["h0"])
    out1, h1, e1 = cma_dp(jnp.asarray(g["Rx"]), 1.0, h0, float(g["lr"]), 2, False)
    out2, h2, e2 = cma_dp_pallas(jnp.asarray(g["Rx"]), 1.0, h0, float(g["lr"]), 2, False, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(h2), np.asarray(h0))
