"""Golden parity: CMA family (per-symbol scan + chunked batch/flex engines)."""

import numpy as np
import jax.numpy as jnp

from vae_equalizer_tpu.models import cma_siso, cma_dp, cma_batch_dp, cma_flex_dp


def test_cma_siso_golden(golden):
    g = golden("cma_awgn")
    out, h, e = cma_siso(jnp.asarray(g["Rx"]), 1.0, jnp.asarray(g["h0"]), float(g["lr"]), 2, True)
    np.testing.assert_allclose(np.asarray(out), g["out"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h), g["h"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(e), g["e"], rtol=1e-3, atol=1e-5)


def test_cma_dp_golden(golden):
    g = golden("cma_dp")
    out, h, e = cma_dp(jnp.asarray(g["Rx"]), 1.0, jnp.asarray(g["h0"]), float(g["lr"]), 2, True)
    np.testing.assert_allclose(np.asarray(out), g["out"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h), g["h"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(e), g["e"], rtol=1e-3, atol=1e-5)


def test_cma_batch_dp_golden(golden):
    g = golden("cmabatch_dp")
    out, h, e = cma_batch_dp(
        jnp.asarray(g["Rx"]), 1.0, jnp.asarray(g["h0"]), float(g["lr"]), int(g["batchlen"]), 2, True
    )
    np.testing.assert_allclose(np.asarray(out), g["out"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h), g["h"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(e), g["e"], rtol=1e-3, atol=1e-5)


def test_cma_flex_dp_golden(golden):
    g = golden("cmaflex_dp")
    out, h, e = cma_flex_dp(
        jnp.asarray(g["Rx"]),
        1.0,
        jnp.asarray(g["h0"]),
        float(g["lr"]),
        int(g["batchlen"]),
        int(g["symb_step"]),
        2,
        True,
    )
    np.testing.assert_allclose(np.asarray(out), g["out"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h), g["h"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(e), g["e"], rtol=1e-3, atol=1e-5)


def test_cma_flex_reduces_to_batch(golden):
    """flex with symb_step == batch_len must equal the batch variant."""
    g = golden("cmabatch_dp")
    b = int(g["batchlen"])
    out_b, h_b, _ = cma_batch_dp(jnp.asarray(g["Rx"]), 1.0, jnp.asarray(g["h0"]), float(g["lr"]), b, 2, True)
    out_f, h_f, _ = cma_flex_dp(jnp.asarray(g["Rx"]), 1.0, jnp.asarray(g["h0"]), float(g["lr"]), b, b, 2, True)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_f), atol=1e-7)
    np.testing.assert_allclose(np.asarray(h_b), np.asarray(h_f), atol=1e-7)


def test_cma_eval_mode_keeps_taps(golden):
    g = golden("cma_dp")
    h0 = jnp.asarray(g["h0"])
    _, h, _ = cma_dp(jnp.asarray(g["Rx"]), 1.0, h0, float(g["lr"]), 2, False)
    np.testing.assert_array_equal(np.asarray(h), np.asarray(h0))
