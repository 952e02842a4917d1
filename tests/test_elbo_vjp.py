"""Hand-derived fused-loss VJP vs jax autodiff (exact math check)."""

import numpy as np
import jax
import jax.numpy as jnp

from vae_equalizer_tpu.core import make_constellation
from vae_equalizer_tpu.core.constellation import demapper_noise_var
from vae_equalizer_tpu.models import butterfly_init, dirac_taps_dp
from vae_equalizer_tpu.ops.elbo_vjp import vae_dp_loss_bwd, vae_dp_loss_fwd, vae_dp_loss_reference


def _setup(seed=0, n_sym=64, m=25, mod="16-QAM", nu=0.0270955):
    const = make_constellation(mod, nu)
    rng = np.random.default_rng(seed)
    w = jnp.asarray(butterfly_init(m)) + 0.05 * jnp.asarray(
        rng.normal(size=(2, 4, m)).astype(np.float32)
    )
    h = jnp.asarray(dirac_taps_dp(m)) + 0.05 * jnp.asarray(
        rng.normal(size=(2, 2, 2, m)).astype(np.float32)
    )
    x = jnp.asarray(rng.normal(size=(2, 2, 2 * n_sym)).astype(np.float32) * 0.6)
    amps = jnp.asarray(const.amps)
    var = jnp.full((2,), demapper_noise_var(const, 20.0), jnp.float32)
    P = jnp.asarray(const.P, jnp.float32)
    return w, h, x, amps, var, const.nu_sc, P


def test_fwd_matches_reference():
    w, h, x, amps, var, nu_sc, P = _setup()
    (loss, var_est), _ = vae_dp_loss_fwd(w, h, x, amps, var, nu_sc, P)
    loss_ref, var_ref = vae_dp_loss_reference(w, h, x, amps, var, nu_sc, P)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var_est), np.asarray(var_ref), rtol=1e-6)


def test_bwd_matches_autodiff():
    w, h, x, amps, var, nu_sc, P = _setup()

    def ref_loss(w_, h_):
        return vae_dp_loss_reference(w_, h_, x, amps, var, nu_sc, P)[0]

    gw_ref, gh_ref = jax.grad(ref_loss, argnums=(0, 1))(w, h)
    _, residuals = vae_dp_loss_fwd(w, h, x, amps, var, nu_sc, P)
    gw, gh = vae_dp_loss_bwd(w, h, x, amps, var, nu_sc, P, residuals)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gh_ref), rtol=5e-4, atol=1e-5)


def test_bwd_matches_autodiff_64qam():
    w, h, x, amps, var, nu_sc, P = _setup(seed=3, n_sym=100, m=11, mod="64-QAM", nu=0.0)

    def ref_loss(w_, h_):
        return vae_dp_loss_reference(w_, h_, x, amps, var, nu_sc, P)[0]

    gw_ref, gh_ref = jax.grad(ref_loss, argnums=(0, 1))(w, h)
    _, residuals = vae_dp_loss_fwd(w, h, x, amps, var, nu_sc, P)
    gw, gh = vae_dp_loss_bwd(w, h, x, amps, var, nu_sc, P, residuals)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gh_ref), rtol=5e-4, atol=1e-5)


def test_pallas_fused_loss_and_grad_interpret():
    from vae_equalizer_tpu.ops.elbo_kernel import vae_dp_loss_and_grad_pallas

    for seed, n_sym, m, mod in [(0, 64, 25, "16-QAM"), (3, 100, 11, "64-QAM")]:
        w, h, x, amps, var, nu_sc, P = _setup(seed=seed, n_sym=n_sym, m=m, mod=mod)

        def ref_loss(w_, h_):
            return vae_dp_loss_reference(w_, h_, x, amps, var, nu_sc, P)[0]

        loss_ref, var_ref = vae_dp_loss_reference(w, h, x, amps, var, nu_sc, P)
        gw_ref, gh_ref = jax.grad(ref_loss, argnums=(0, 1))(w, h)
        loss, var_est, gw, gh, q, out = vae_dp_loss_and_grad_pallas(
            w, h, x, amps, var, nu_sc, P, interpret=True
        )
        from vae_equalizer_tpu.models.vae_le import vae_le_dp_forward

        q_ref, out_ref = vae_le_dp_forward(w, x, amps, var, nu_sc, 2)
        np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref), rtol=5e-4, atol=2e-6)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(var_est), np.asarray(var_ref), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), rtol=5e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gh), np.asarray(gh_ref), rtol=5e-4, atol=1e-5)


def test_pallas_siso_fused_loss_and_grad_interpret():
    """SISO fused kernel (complex FIR + mean-|.|-normalized demapper + shaped
    ELBO + hand-derived backward incl. the normalization VJP) vs autodiff."""
    from vae_equalizer_tpu.models import siso_fir_init, dirac_taps_siso, vae_le_siso_forward
    from vae_equalizer_tpu.models.losses import elbo_siso
    from vae_equalizer_tpu.ops.elbo_siso_kernel import vae_siso_loss_and_grad_pallas

    for seed, n_sym, m, mod, nu in [(0, 64, 25, "16-QAM", 0.0270955), (3, 100, 11, "64-QAM", 0.0)]:
        const = make_constellation(mod, nu)
        rng = np.random.default_rng(seed)
        w = jnp.asarray(siso_fir_init(m)) + 0.05 * jnp.asarray(
            rng.normal(size=(1, 2, m)).astype(np.float32)
        )
        h = jnp.asarray(dirac_taps_siso(m)) + 0.05 * jnp.asarray(
            rng.normal(size=(2, m)).astype(np.float32)
        )
        x = jnp.asarray(rng.normal(size=(2, 2 * n_sym)).astype(np.float32) * 0.6)
        amps = jnp.asarray(const.amps)
        P = jnp.asarray(const.P, jnp.float32)
        var = 10 ** (-20.0 / 10)
        amp_mean = const.amp_mean

        def loss_fn(w_, h_):
            q, _ = vae_le_siso_forward(w_, x, amps, amp_mean, var, 2)
            return elbo_siso(q, x, h_, amps, P)

        loss_ref = loss_fn(w, h)
        gw_ref, gh_ref = jax.grad(loss_fn, argnums=(0, 1))(w, h)
        q_ref, out_ref = vae_le_siso_forward(w, x, amps, amp_mean, var, 2)

        loss, gw, gh, q, out = vae_siso_loss_and_grad_pallas(
            w, h, x, amps, amp_mean, var, P, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref), rtol=5e-4, atol=2e-6)
        np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gh), np.asarray(gh_ref), rtol=5e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), rtol=5e-4, atol=1e-5)
