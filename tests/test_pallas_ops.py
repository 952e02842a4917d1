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


def test_butterfly_demap_pallas_matches_xla(golden):
    from vae_equalizer_tpu.ops.butterfly_kernel import vae_le_dp_forward_pallas
    from vae_equalizer_tpu.models import vae_le_dp_forward

    g = golden("twoxtwofir")
    args = (
        jnp.asarray(g["w"]),
        jnp.asarray(g["x"]),
        jnp.asarray(g["amp_levels"]),
        jnp.asarray(g["var"]),
        float(g["nu_sc"]),
    )
    q1, out1 = vae_le_dp_forward(*args, 2)
    q2, out2 = vae_le_dp_forward_pallas(*args, 2, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), rtol=1e-5, atol=1e-6)
    # accumulation order differs (shift-and-matmul vs conv): allow fp noise
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q1), rtol=5e-4, atol=2e-6)
    # and the torch golden
    np.testing.assert_allclose(np.asarray(out2), g["out"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(q2), g["q_est"], rtol=1e-3, atol=1e-6)


def test_butterfly_demap_pallas_odd_sps1(golden):
    """sps=1 path (polyphase degenerates to plain conv)."""
    from vae_equalizer_tpu.ops.butterfly_kernel import vae_le_dp_forward_pallas
    from vae_equalizer_tpu.models import vae_le_dp_forward, butterfly_init

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 2, 96)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2, 4, 11)).astype(np.float32) * 0.3)
    amps = jnp.asarray(np.linspace(-1, 1, 4).astype(np.float32))
    var = jnp.asarray([0.05, 0.08], dtype=np.float32)
    q1, out1 = vae_le_dp_forward(w, x, amps, var, 0.1, 1)
    q2, out2 = vae_le_dp_forward_pallas(w, x, amps, var, 0.1, 1, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q1), rtol=1e-4, atol=1e-6)
