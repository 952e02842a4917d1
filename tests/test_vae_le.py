"""Golden parity: butterfly/SISO FIR forwards, soft demapper, ELBO losses."""

import numpy as np
import jax
import jax.numpy as jnp

from vae_equalizer_tpu.models import (
    butterfly_init,
    vae_le_dp_forward,
    siso_fir_init,
    vae_le_siso_forward,
    soft_demap_dp,
)
from vae_equalizer_tpu.models.losses import elbo_dp, elbo_siso


def test_butterfly_forward_golden(golden):
    g = golden("twoxtwofir")
    q, out = jax.jit(vae_le_dp_forward, static_argnums=(5,))(
        jnp.asarray(g["w"]),
        jnp.asarray(g["x"]),
        jnp.asarray(g["amp_levels"]),
        jnp.asarray(g["var"]),
        float(g["nu_sc"]),
        2,
    )
    np.testing.assert_allclose(np.asarray(out), g["out"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(q), g["q_est"], rtol=1e-3, atol=1e-6)


def test_butterfly_dirac_init_passthrough():
    """Dirac-initialized butterfly at sps=1 must pass the input through."""
    w = butterfly_init(25)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2, 64)).astype(np.float32))
    out = vae_le_dp_forward(w, x, jnp.linspace(-1, 1, 8), jnp.ones(2), 0.0, 1)[1]
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_soft_demap_golden(golden):
    g = golden("soft_dec")
    q = soft_demap_dp(
        jnp.asarray(g["out"]), jnp.asarray(g["amp_levels"]), jnp.asarray(g["var"]), float(g["nu_sc"])
    )
    np.testing.assert_allclose(np.asarray(q), g["q"], rtol=1e-3, atol=1e-6)


def test_siso_forward_golden(golden):
    g = golden("twofir")
    q, out = jax.jit(vae_le_siso_forward, static_argnums=(5,))(
        jnp.asarray(g["w"]),
        jnp.asarray(g["x"]),
        jnp.asarray(g["amp_levels"]),
        float(g["amp_mean"]),
        float(g["var"]),
        2,
    )
    np.testing.assert_allclose(np.asarray(out), g["out"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(q), g["q_est"], rtol=1e-3, atol=1e-6)


def test_siso_dirac_init():
    w = siso_fir_init(25)
    assert float(w[0, 0, 12]) == 1.0
    assert float(jnp.sum(jnp.abs(w))) == 1.0


def test_elbo_dp_golden(golden):
    g = golden("elbo_dp")
    loss, var_est = jax.jit(elbo_dp)(
        jnp.asarray(g["q"]),
        jnp.asarray(g["rx"]),
        jnp.asarray(g["h_est"]),
        jnp.asarray(g["amp_levels"]),
        jnp.asarray(g["P"]),
    )
    np.testing.assert_allclose(float(loss), g["loss"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var_est), g["var_est"], rtol=1e-5)


def test_elbo_siso_golden(golden):
    g = golden("elbo_siso")
    loss_shaped = jax.jit(elbo_siso)(
        jnp.asarray(g["q"]),
        jnp.asarray(g["rx"]),
        jnp.asarray(g["h_est"]),
        jnp.asarray(g["amp_levels"]),
        jnp.asarray(g["P"]),
    )
    loss_uniform = jax.jit(elbo_siso)(
        jnp.asarray(g["q"]),
        jnp.asarray(g["rx"]),
        jnp.asarray(g["h_est"]),
        jnp.asarray(g["amp_levels"]),
        None,
    )
    np.testing.assert_allclose(float(loss_shaped), g["loss_shaped"], rtol=1e-5)
    np.testing.assert_allclose(float(loss_uniform), g["loss_uniform"], rtol=1e-5)


def test_elbo_dp_differentiable(golden):
    """Gradients flow to both the equalizer taps (via q) and h_est."""
    g = golden("elbo_dp")
    q0 = jnp.asarray(g["q"])
    rx = jnp.asarray(g["rx"])
    amps = jnp.asarray(g["amp_levels"])
    P = jnp.asarray(g["P"])

    def f(h):
        return elbo_dp(q0, rx, h, amps, P)[0]

    grad = jax.grad(f)(jnp.asarray(g["h_est"]))
    assert np.all(np.isfinite(np.asarray(grad)))
    assert float(jnp.max(jnp.abs(grad))) > 0


def test_siso_forward_runs_matches_vmapped():
    """The runs-batched SISO eval forward (im2col batched dot, round 5) must
    equal jax.vmap of the conv form — same outputs, same posteriors — for
    odd/even-ish shapes of the reference eval config family."""
    import jax

    from vae_equalizer_tpu.models import (
        vae_le_siso_forward,
        vae_le_siso_forward_runs,
    )

    rng = np.random.default_rng(3)
    num_lev, m_est, L, R = 8, 25, 600, 3
    amps = jnp.asarray(
        (2 * np.arange(num_lev) - (num_lev - 1)) / np.sqrt(2 * (num_lev**2 - 1) / 3),
        jnp.float32,
    )
    w = jnp.asarray(rng.normal(size=(R, 1, 2, m_est)).astype(np.float32) * 0.2)
    x = jnp.asarray(rng.normal(size=(R, 2, L)).astype(np.float32))
    q_ref, out_ref = jax.vmap(
        lambda wr, xr: vae_le_siso_forward(wr, xr, amps, 0.8, 0.05, 2)
    )(w, x)
    q, out = vae_le_siso_forward_runs(w, x, amps, 0.8, 0.05, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref),
                               rtol=1e-5, atol=1e-6)
