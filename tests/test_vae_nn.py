"""Golden parity + behavior: VAE-NN CNN equalizer, LMMSE/DFE baseline."""

import numpy as np
import jax
import jax.numpy as jnp

from vae_equalizer_tpu.models import (
    vae_nn_forward,
    compute_lmmse,
    compute_feedforward,
    compute_feedback,
    complex_fir,
    dfe_equalize,
)
from vae_equalizer_tpu.models.lmmse_dfe import nearest_neighbor


def test_vae_nn_forward_golden(golden):
    g = golden("vaenn_net")
    params = {
        "w1": jnp.asarray(g["fc1_weight"]),
        "b1": jnp.asarray(g["fc1_bias"]),
        "w2": jnp.asarray(g["fc2_weight"]),
        "b2": jnp.asarray(g["fc2_bias"]),
    }
    q = vae_nn_forward(params, jnp.asarray(g["x"][0]), sps=2)
    np.testing.assert_allclose(np.asarray(q), g["out"][0], rtol=1e-4, atol=1e-6)


def test_vae_nn_posteriors_normalized(golden):
    g = golden("vaenn_net")
    params = {
        "w1": jnp.asarray(g["fc1_weight"]),
        "b1": jnp.asarray(g["fc1_bias"]),
        "w2": jnp.asarray(g["fc2_weight"]),
        "b2": jnp.asarray(g["fc2_bias"]),
    }
    q = np.asarray(vae_nn_forward(params, jnp.asarray(g["x"][0]), sps=2))
    n = q.shape[0] // 2
    np.testing.assert_allclose(q[:n].sum(0), 1.0, rtol=1e-5)
    np.testing.assert_allclose(q[n:].sum(0), 1.0, rtol=1e-5)


def test_lmmse_dfe_filters_golden(golden):
    g = golden("lmmse_dfe")
    h = (g["h_real"] + 1j * g["h_imag"]).astype(np.complex64)
    lmmse = compute_lmmse(h, float(g["snr"]), 20, 11)
    np.testing.assert_allclose(lmmse.real, g["lmmse_real"], rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(lmmse.imag, g["lmmse_imag"], rtol=1e-3, atol=1e-6)
    ff = compute_feedforward(h, float(g["snr"]), 11)
    np.testing.assert_allclose(ff.real, g["ff_real"], rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(ff.imag, g["ff_imag"], rtol=1e-3, atol=1e-6)
    fb = compute_feedback(h, ff)
    np.testing.assert_allclose(fb.real, g["fb_real"], rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(fb.imag, g["fb_imag"], rtol=1e-3, atol=1e-6)


def test_dfe_loop_golden(golden):
    from vae_equalizer_tpu.core import make_constellation

    g = golden("lmmse_dfe")
    gl = golden("dfe_loop")
    h = (g["h_real"] + 1j * g["h_imag"]).astype(np.complex64)
    ff = compute_feedforward(h, float(g["snr"]), 11)
    fb = compute_feedback(h, ff)
    const = make_constellation("64-QAM", 0.0)
    points = jnp.asarray(np.stack([const.points.real, const.points.imag]))

    rx = jnp.asarray(np.stack([gl["rx_real"], gl["rx_imag"]]).astype(np.float32))
    ff_planes = jnp.asarray(np.stack([ff.real, ff.imag]).astype(np.float32))
    ff_out = complex_fir(rx, ff_planes)
    np.testing.assert_allclose(np.asarray(ff_out[0]), gl["ff_out_real"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ff_out[1]), gl["ff_out_imag"], rtol=1e-3, atol=1e-4)

    init_idx = nearest_neighbor(ff_out, points)
    np.testing.assert_array_equal(np.asarray(init_idx), gl["init_idx"])

    fb_planes = jnp.asarray(np.stack([fb.real, fb.imag]).astype(np.float32))
    dfe_idx = jax.jit(dfe_equalize)(ff_out, fb_planes, points, init_idx)
    np.testing.assert_array_equal(np.asarray(dfe_idx), gl["dfe_idx"])
