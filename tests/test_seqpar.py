"""Multi-chip sharding: dp x sp training step vs the single-device path."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from vae_equalizer_tpu.core import make_constellation
from vae_equalizer_tpu.core.constellation import demapper_noise_var
from vae_equalizer_tpu.models import butterfly_init, dirac_taps_dp, vae_le_dp_forward
from vae_equalizer_tpu.models.losses import elbo_dp
from vae_equalizer_tpu.parallel.seqpar import make_mesh_2d, make_sp_dp_train_step


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh_2d(2, 4)


def _reference_step(params, opt_state, rx, const, var, sps, lr):
    """Single-device replica of one dp x sp train step (per run)."""
    amps = jnp.asarray(const.amps)
    P = jnp.asarray(const.P, jnp.float32)
    opt = optax.adam(lr)

    def loss_fn(p, x):
        q, _ = vae_le_dp_forward(p["w"], x, amps, var, const.nu_sc, sps)
        return elbo_dp(q, x, p["h"], amps, P)

    def one(p, s, x):
        (loss, var_est), g = jax.value_and_grad(loss_fn, has_aux=True)(p, x)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss, var_est

    return jax.jit(jax.vmap(one))(params, opt_state, rx)


def test_sp_dp_step_matches_single_device(mesh):
    """The sharded step must equal the unsharded one: identical loss and
    identical parameter updates (halo conv + psum'd ELBO are exact)."""
    n_runs, n = 2, 512
    sps, m_est, lr = 2, 25, 2.5e-3
    const = make_constellation("16-QAM", 0.0270955)
    var = jnp.full((2,), demapper_noise_var(const, 20.0), jnp.float32)

    rng = np.random.default_rng(0)
    rx = jnp.asarray(rng.normal(size=(n_runs, 2, 2, n)).astype(np.float32) * 0.5)

    init, make_step, shard_inputs, info = make_sp_dp_train_step(
        mesh, mod="16-QAM", nu=0.0270955, snr_db=20.0, m_est=m_est, sps=sps, lr=lr
    )
    params, opt_state = init(n_runs)
    p_s, s_s, rx_s = shard_inputs(params, opt_state, rx)
    step = make_step(n)
    p1, s1, loss1, var_est1 = step(p_s, s_s, rx_s)

    p2, s2, loss2, var_est2 = _reference_step(params, opt_state, rx, const, var, sps, lr)

    np.testing.assert_allclose(np.asarray(loss1), np.asarray(loss2), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(var_est1), np.asarray(var_est2), rtol=2e-5)
    for k in ("w", "h"):
        np.testing.assert_allclose(np.asarray(p1[k]), np.asarray(p2[k]), rtol=1e-4, atol=2e-6)


def test_sp_dp_step_runs_multiple_iterations(mesh):
    n_runs, n = 2, 256
    init, make_step, shard_inputs, info = make_sp_dp_train_step(mesh, mod="4-QAM", snr_db=20.0)
    params, opt_state = init(n_runs)
    rng = np.random.default_rng(1)
    rx = jnp.asarray(rng.normal(size=(n_runs, 2, 2, n)).astype(np.float32) * 0.5)
    params, opt_state, rx_s = shard_inputs(params, opt_state, rx)
    step = make_step(n)
    losses = []
    for _ in range(3):
        params, opt_state, loss, _ = step(params, opt_state, rx_s)
        losses.append(np.asarray(loss))
    assert np.all(np.isfinite(np.asarray(losses)))
    assert np.asarray(losses)[-1].mean() < np.asarray(losses)[0].mean()


def test_sharded_full_loop_matches_single_device(mesh):
    """train_vae_dp_sharded drives the WHOLE experiment (channel gen, theta
    drift, minibatch optimizer scan, synchronized eval) on the dp x sp mesh;
    the per-frame metric trajectories must match train_vae_dp(runs=...) —
    exactly for the early frames, within reduction-order float noise after."""
    from vae_equalizer_tpu.parallel.seqpar import train_vae_dp_sharded
    from vae_equalizer_tpu.train import train_vae_dp
    from vae_equalizer_tpu.utils.config import DpConfig

    cfg = DpConfig(mod="4-QAM", snr_db=20.0, num_frames=3, n_frame_max=1000, lr=2.5e-3)
    key = jax.random.PRNGKey(7)
    a = train_vae_dp(cfg, key, runs=2)
    b = train_vae_dp_sharded(cfg, key, runs=2, mesh=mesh)
    assert b["ser"].shape == a["ser"].shape == (2, 4, 3)
    # identical channel draws + exact halo/psum algebra: first frames match
    # to the SER quantum; later frames only to pre-convergence float noise
    np.testing.assert_allclose(b["ser"][..., :2], a["ser"][..., :2], atol=2e-3)
    np.testing.assert_allclose(b["mi"][..., :2], a["mi"][..., :2], atol=1e-2)
    np.testing.assert_allclose(b["var_est"][..., :2], a["var_est"][..., :2], rtol=1e-3)
    assert np.all(np.isfinite(b["ser"])) and np.all(b["ser"] <= 1.0)
    for k in ("w", "h"):
        assert np.all(np.isfinite(np.asarray(b["params"][k])))


def test_sharded_full_loop_compiled_runs(mesh):
    from vae_equalizer_tpu.parallel.seqpar import train_vae_dp_sharded
    from vae_equalizer_tpu.utils.config import DpConfig

    cfg = DpConfig(mod="4-QAM", snr_db=20.0, num_frames=2, n_frame_max=500, lr=2.5e-3)
    res = train_vae_dp_sharded(cfg, jax.random.PRNGKey(1), runs=2, mesh=mesh, compiled=True)
    assert res["ser"].shape == (2, 4, 2)
    assert np.all(np.isfinite(res["ser"]))


def test_sharded_flex_loop_matches_single_device(mesh):
    """train_vae_flex_dp_sharded: the VAEflex overlapping-window experiment
    on the dp x sp mesh matches train_vae_flex_dp(runs=...) — same window
    assembly, central crops, and eval — for the early frames."""
    from vae_equalizer_tpu.parallel.seqpar import train_vae_flex_dp_sharded
    from vae_equalizer_tpu.train import train_vae_flex_dp
    from vae_equalizer_tpu.utils.config import DpConfig

    # few windows per frame (6): with the reference's 45+ chained Adam steps
    # the sharded reduction order diverges chaotically within one frame
    # (verified: window-0 losses match to 1e-4), so the trajectory
    # comparison must stay in the pre-chaos regime like the VAE test above
    cfg = DpConfig(
        mod="4-QAM", snr_db=20.0, num_frames=3, n_frame_max=400,
        batch_len=100, flex_step=50, lr=2.5e-3,
    )
    key = jax.random.PRNGKey(9)
    a = train_vae_flex_dp(cfg, key, runs=2)
    b = train_vae_flex_dp_sharded(cfg, key, runs=2, mesh=mesh)
    assert b["ser"].shape == a["ser"].shape == (2, 4, 3)
    np.testing.assert_allclose(b["ser"][..., :2], a["ser"][..., :2], atol=2e-3)
    np.testing.assert_allclose(b["mi"][..., :2], a["mi"][..., :2], atol=1e-2)
    np.testing.assert_allclose(b["var_est"][..., :2], a["var_est"][..., :2], rtol=1e-3)
    assert np.all(np.isfinite(b["ser"])) and np.all(b["ser"] <= 1.0)
