"""L0 tests: filters, constellation/PCS, stacked-complex ops."""

import numpy as np
import jax.numpy as jnp

from vae_equalizer_tpu.core import cplx, rcfir, rrcfir, make_constellation
from vae_equalizer_tpu.core.constellation import demapper_noise_var
from vae_equalizer_tpu.channels.presets import channel_ir


def test_filters_match_reference(golden):
    g = golden("filters")
    np.testing.assert_allclose(rrcfir(8, 2, 0.1), g["rrc_T8_sps2_b01"], rtol=1e-6)
    np.testing.assert_allclose(rcfir(8, 2, 0.1), g["rc_T8_sps2_b01"], rtol=1e-6)
    np.testing.assert_allclose(rrcfir(8, 1, 0.1), g["rrc_T8_sps1_b01"], rtol=1e-6)
    np.testing.assert_allclose(rcfir(8, 1, 0.1), g["rc_T8_sps1_b01"], rtol=1e-6)
    np.testing.assert_allclose(rrcfir(6, 4, 0.25), g["rrc_T6_sps4_b025"], rtol=1e-6)


def test_filters_unit_norm_and_finite():
    for sps in (1, 2, 4):
        for beta in (0.1, 0.25, 0.5):
            for fn in (rcfir, rrcfir):
                h = fn(8, sps, beta)
                assert np.all(np.isfinite(h))
                np.testing.assert_allclose(np.linalg.norm(h), 1.0, rtol=1e-6)


def test_constellation_matches_reference_init(golden):
    for mod in ["4-QAM", "16-QAM", "64-QAM"]:
        for nu in [0.0, 0.0270955, 0.1222578]:
            g = golden(f"init_{mod}_{nu}")
            c = make_constellation(mod, nu)
            np.testing.assert_allclose(c.amps, g["amps"], rtol=1e-6)
            np.testing.assert_allclose(c.P, g["P"], rtol=1e-6)
            np.testing.assert_allclose(c.nu_sc, g["nu_sc"], rtol=1e-6)
            np.testing.assert_allclose(c.pow_mean, g["pow_mean"], rtol=1e-6)
            np.testing.assert_allclose(
                demapper_noise_var(c, 23.0), g["var"][0], rtol=1e-5
            )


def test_channel_preset_upsampling_matches_reference(golden):
    g = golden("init_64-QAM_0.0")
    h_up, m_orig = channel_ir("h1", 2)
    assert m_orig == 5
    np.testing.assert_allclose(h_up, g["h_channel"], rtol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(h_up), 1.0, rtol=1e-6)


def test_constellation_unit_power():
    for mod in ["4-QAM", "16-QAM", "64-QAM"]:
        c = make_constellation(mod, 0.0)
        np.testing.assert_allclose(np.mean(np.abs(c.points) ** 2), 1.0, rtol=1e-6)
        # uniform prior => pow_mean is unit power
        np.testing.assert_allclose(c.pow_mean, 1.0, rtol=1e-6)


def test_cplx_roundtrip_and_conv():
    rng = np.random.default_rng(0)
    z = rng.normal(size=32) + 1j * rng.normal(size=32)
    h = rng.normal(size=5) + 1j * rng.normal(size=5)
    x = cplx.to_planes(jnp.asarray(z.astype(np.complex64)))
    hh = cplx.to_planes(jnp.asarray(h.astype(np.complex64)))
    np.testing.assert_allclose(np.asarray(cplx.from_planes(x)), z.astype(np.complex64), rtol=1e-6)
    want = np.convolve(z, h, mode="valid")
    got = np.asarray(cplx.from_planes(cplx.conv_valid(x, hh)))
    np.testing.assert_allclose(got, want.astype(np.complex64), rtol=1e-4, atol=1e-5)


def test_cplx_mul_conj():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(2, 7)).astype(np.float32)
    b = rng.normal(size=(2, 7)).astype(np.float32)
    za = a[0] + 1j * a[1]
    zb = b[0] + 1j * b[1]
    got = np.asarray(cplx.cmul(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got[0] + 1j * got[1], za * zb, rtol=1e-5)
    got = np.asarray(cplx.cconj(jnp.asarray(a)))
    np.testing.assert_allclose(got[0] + 1j * got[1], np.conj(za), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cplx.cabs2(jnp.asarray(a))), np.abs(za) ** 2, rtol=1e-5)
