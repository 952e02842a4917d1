"""Sequence-parallel (sp) x data-parallel (dp) sharded VAE training step.

Mapping this workload onto a TPU mesh (SURVEY.md sections 2/5): the two
meaningful parallel axes are

  * ``dp`` — independent runs (grid points / repeats): pure data parallelism,
    no cross-run communication;
  * ``sp`` — the time axis of one frame: the butterfly FIR and the ELBO's
    channel convolution only need a halo of M-1 neighbor samples
    (overlap-save), exchanged with ``ppermute`` over ICI; the ELBO's global
    reductions (reconstruction energy C, variance term E, KL) are ``psum``s.

There is no tensor/pipeline/expert dimension worth sharding here — the model
is a 2x4xM tap bank — so dp x sp is the full, honest mesh mapping. Gradients
are psum-reduced over sp so every sp shard applies identical optimizer
updates (standard sequence-parallel training).

All collectives ride mesh axis names inside shard_map; ppermute zero-fills
the frame edges (non-periodic boundary), matching the zero-padded global
convolution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core import make_constellation
from ..core.constellation import demapper_noise_var
from ..models import butterfly_init, dirac_taps_dp, soft_demap_dp
from ..models.losses import posterior_moments

__all__ = [
    "halo_exchange",
    "make_sp_dp_train_step",
    "make_mesh_2d",
    "train_vae_dp_sharded",
    "train_vae_flex_dp_sharded",
]


def make_mesh_2d(n_dp: int, n_sp: int, devices=None) -> Mesh:
    devs = np.asarray(devices if devices is not None else jax.devices()[: n_dp * n_sp])
    return Mesh(devs.reshape(n_dp, n_sp), ("dp", "sp"))


def halo_exchange(x: jnp.ndarray, left: int, right: int, axis_name: str) -> jnp.ndarray:
    """Pad the last axis of a sp-sharded block with neighbor data.

    Returns x extended to (..., left + L + right); frame edges are
    zero-filled (ppermute leaves unpaired destinations at zero).
    """
    n = jax.lax.axis_size(axis_name)
    parts = []
    if left > 0:
        send_right = [(i, i + 1) for i in range(n - 1)]
        parts.append(jax.lax.ppermute(x[..., -left:], axis_name, send_right))
    parts.append(x)
    if right > 0:
        send_left = [(i + 1, i) for i in range(n - 1)]
        parts.append(jax.lax.ppermute(x[..., :right], axis_name, send_left))
    return jnp.concatenate(parts, axis=-1)


def _sp_butterfly(w: jnp.ndarray, x: jnp.ndarray, sps: int, axis_name: str) -> jnp.ndarray:
    """Sequence-parallel butterfly FIR: local block + halo -> local outputs.

    x: (2, 2, Ln) local samples (global same-padding conv, stride sps).
    Requires Ln % sps == 0 and M odd.
    """
    m = w.shape[-1]
    pad = m // 2
    xh = halo_exchange(x, pad, pad, axis_name)  # (2, 2, Ln + 2*pad)
    x_i = jnp.concatenate([xh[:, 0, :], -xh[:, 1, :]])
    x_q = jnp.concatenate([xh[:, 1, :], xh[:, 0, :]])

    def xcorr(inp):
        return jax.lax.conv_general_dilated(
            inp[None], w, (sps,), "VALID", dimension_numbers=("NCH", "OIH", "NCH")
        )[0]

    return jnp.stack([xcorr(x_i), xcorr(x_q)], axis=1)  # (2, 2, Ln//sps)


def _sp_elbo(q, rx, h_est, amps, P_prior, sps, n_global, axis_name, eps=1e-12):
    """Sequence-parallel DP ELBO: halo'd conv + psum'd global reductions.

    q: (2, 2n, Ln_sym) local posteriors; rx: (2, 2, Ln) local samples.
    Numerically equals models.losses.elbo_dp on the gathered arrays.
    """
    pol = 2
    m = h_est.shape[-1]
    mh = m // 2
    mh2 = 2 * mh
    ln = rx.shape[-1]
    idx0 = jax.lax.axis_index(axis_name) * ln  # global offset of this block
    t_glob = idx0 + jnp.arange(ln)

    eq, eq2 = posterior_moments(q, amps, sps)  # (2, 2, Ln)
    var = eq2 - eq * eq

    # D = h (*) Eq over global positions; halo of Mh on the left covers the
    # conv support, then mask positions with global n < Mh
    h = h_est[..., : mh2 + 1]
    hr, hi = h[:, :, 0, :], h[:, :, 1, :]
    w_re = jnp.stack([hr, -hi], axis=2)
    w_im = jnp.stack([hi, hr], axis=2)
    w = jnp.stack([w_re, w_im], axis=1).reshape(pol * 2, pol * 2, mh2 + 1)[:, :, ::-1]
    eq_h = halo_exchange(eq.reshape(pol * 2, ln), mh2, 0, axis_name)
    d = jax.lax.conv_general_dilated(
        eq_h[None], w, (1,), "VALID", dimension_numbers=("NCH", "OIH", "NCH")
    )[0].reshape(pol, 2, ln)
    d_valid = (t_glob >= mh2).astype(d.dtype)  # global n in [Mh, N)

    # C = sum_{[mh, N-mh)} rx^2 - 2 <rx[n-mh], D[n]> + ||D||^2 + E
    rx_mask = ((t_glob >= mh) & (t_glob < n_global - mh)).astype(rx.dtype)
    c_loc = jnp.sum(rx * rx * rx_mask, axis=(1, 2))
    # rx[n - mh] aligned with D[n]: halo rx to the left by mh
    rx_h = halo_exchange(rx.reshape(pol * 2, ln), mh, 0, axis_name)[:, :ln].reshape(pol, 2, ln)
    c_loc = c_loc - 2.0 * jnp.sum(
        (rx_h[:, 0] * d[:, 0] + rx_h[:, 1] * d[:, 1]) * d_valid, axis=1
    )
    c_loc = c_loc + jnp.sum((d * d) * d_valid[None, None, :], axis=(1, 2))

    # E term: S[nu, j] = sum over global window [Mh - j, N - j) of sum_c Var
    v = jnp.sum(var, axis=1)  # (2, Ln)
    j = jnp.arange(mh2 + 1)
    win = (t_glob[None, :] >= (mh2 - j)[:, None]) & (t_glob[None, :] < (n_global - j)[:, None])
    s_loc = jnp.einsum("nt,jt->nj", v, win.astype(v.dtype))
    h_absq = jnp.sum(h * h, axis=2)
    e_loc = jnp.einsum("xnj,nj->x", h_absq, s_loc)
    c = jax.lax.psum(c_loc + e_loc, axis_name)

    # KL over global symbol positions [mh, N_sym - mh)
    n_sym_global = n_global // sps
    ts = idx0 // sps + jnp.arange(q.shape[-1])
    kl_mask = ((ts >= mh) & (ts < n_sym_global - mh)).astype(q.dtype)
    p_col = jnp.tile(P_prior, 2)[None, :, None]
    kl_loc = jnp.sum(-q * jnp.log(q / p_col + eps) * kl_mask[None, None, :])
    kl = jax.lax.psum(kl_loc, axis_name)

    n_eff = n_global - mh2
    return jnp.sum(n_eff * jnp.log(c)) - kl, jax.lax.stop_gradient(c / n_eff)


def make_sp_dp_train_step(
    mesh: Mesh,
    mod: str = "64-QAM",
    nu: float = 0.0,
    snr_db: float = 23.0,
    m_est: int = 25,
    sps: int = 2,
    lr: float = 2.5e-3,
):
    """Build (params, opt_state, step, shard_inputs) for dp x sp training.

    step(params, opt_state, rx, tx) runs one optimizer step of the DP VAE
    with runs sharded over 'dp' and the frame time axis sharded over 'sp'.
    rx: (n_runs, 2, 2, N) float32; returns (params, opt_state, loss, var_est).
    """
    const = make_constellation(mod, nu)
    amps = jnp.asarray(const.amps)
    p_prior = jnp.asarray(const.P, jnp.float32)
    var = jnp.full((2,), demapper_noise_var(const, snr_db), jnp.float32)
    nu_sc = const.nu_sc
    opt = optax.adam(lr)

    n_dp = mesh.shape["dp"]
    n_sp = mesh.shape["sp"]

    params0 = {"w": butterfly_init(m_est), "h": dirac_taps_dp(m_est)}

    def local_loss(p, rx_loc, n_global):
        out = _sp_butterfly(p["w"], rx_loc, sps, "sp")
        d = out[:, :, None, :] - amps[None, None, :, None]
        metric = d * d / (2.0 * var[:, None, None, None]) + nu_sc * (amps**2)[None, None, :, None]
        q = jax.nn.softmax(-metric, axis=2).reshape(2, -1, out.shape[-1])
        return _sp_elbo(q, rx_loc, p["h"], amps, p_prior, sps, n_global, "sp")

    def make_step(n_global: int):
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P("dp"), P("dp"), P("dp", None, None, "sp")),
            out_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
        )
        def sharded_step(params, opt_state, rx):
            def one_run(p, s, x):
                (loss, var_est), g = jax.value_and_grad(
                    lambda pp: local_loss(pp, x, n_global), has_aux=True
                )(p)
                g = jax.lax.psum(g, "sp")  # full gradient on every sp shard
                updates, s = opt.update(g, s, p)
                return optax.apply_updates(p, updates), s, loss, var_est

            return jax.vmap(one_run)(params, opt_state, rx)

        return jax.jit(sharded_step)

    def shard_inputs(params, opt_state, rx):
        run_sh = NamedSharding(mesh, P("dp"))
        rx_sh = NamedSharding(mesh, P("dp", None, None, "sp"))
        return (
            jax.device_put(params, run_sh),
            jax.device_put(opt_state, run_sh),
            jax.device_put(rx, rx_sh),
        )

    def init(n_runs: int):
        assert n_runs % n_dp == 0, "runs must be a multiple of the dp axis"
        params = jax.tree.map(lambda x: jnp.broadcast_to(x, (n_runs,) + x.shape), params0)
        opt_state = jax.vmap(opt.init)(params)
        return params, opt_state

    return init, make_step, shard_inputs, {"n_dp": n_dp, "n_sp": n_sp, "const": const, "var": var}


def train_vae_dp_sharded(
    cfg,
    key: jax.Array,
    progress=None,
    runs: int | None = None,
    mesh: Mesh | None = None,
    params_init=None,
    compiled: bool = False,
    checkpoint=None,
    checkpoint_every: int = 0,
    chunk_frames: int = 1,
    flex_windows: bool = False,
):
    """Full DP VAE online experiment on a dp x sp device mesh.

    The complete frame loop of train/dp.py:train_vae_dp — theta-drift channel
    generation, the minibatch optimizer scan, and the synchronized SER/MI
    evaluation — with independent runs sharded over the mesh's ``dp`` axis and
    every minibatch's sample axis sharded over ``sp`` (halo-exchange butterfly
    + psum'd ELBO + psum'd gradients). Numerically equivalent to
    ``train_vae_dp(cfg, key, runs=runs)`` up to float reduction order; one XLA
    program per frame (or per experiment with ``compiled=True``).

    Channel generation and eval run as ordinary jit code on the mesh (the
    partitioner places them); only the gradient scan is shard_mapped.

    ``mesh`` defaults to a dp x sp mesh over all devices with sp=2 when the
    device count is even (sp=1 otherwise) — pass an explicit
    ``make_mesh_2d(n_dp, n_sp)`` to control the split.

    ``flex_windows=True`` runs the VAEflex scheme instead (overlapping
    sliding windows with central crop, func_VAEflex_DP_MQAM_shaping.py:59-70):
    each window's sample axis is sp-sharded with the same halo exchange —
    the window is just a minibatch that starts every ``flex_step`` symbols —
    and only the central flex_step symbols feed the recorded stream.
    Requires batch_len %% flex_step == 0.
    """
    from ..train.dp import (
        _VAE_FIELDS,
        _dp_result,
        _finish_vae_frame,
        _frame_inputs,
        _setup,
        _vae_optimizer,
    )
    from ..train.eval_utils import batch_cut_weight, margin_weight_maxshift
    from ..train.harness import run_frame_loop

    if mesh is None:
        n_dev = len(jax.devices())
        mesh = make_mesh_2d(n_dev // 2, 2) if n_dev % 2 == 0 else make_mesh_2d(n_dev, 1)
    n_dp, n_sp = mesh.shape["dp"], mesh.shape["sp"]
    runs = n_dp if runs is None else runs
    if runs % n_dp != 0:
        raise ValueError(f"runs={runs} must be a multiple of the dp axis ({n_dp})")
    m_max0 = cfg.n_frame_max // cfg.batch_len
    n_frame = m_max0 * cfg.batch_len
    const, var, gen, amps, prior = _setup(cfg, n_frame)
    mb_len = cfg.batch_len * cfg.sps
    if flex_windows:
        if cfg.batch_len % cfg.flex_step != 0:
            raise ValueError("flex sp-sharding needs batch_len %% flex_step == 0")
        fs = cfg.flex_step
        m_span = (n_frame - cfg.batch_len) // fs * fs  # recorded symbols
        m_max = m_span // fs  # windows per frame
        crop0 = (cfg.batch_len - fs) // 2
    else:
        m_max = m_max0
    if mb_len % (n_sp * cfg.sps) != 0:
        raise ValueError(f"minibatch length {mb_len} must split over sp={n_sp} whole symbols")
    if cfg.m_est % 2 == 0:
        raise ValueError("sp sharding requires odd M_est (symmetric halo)")

    params0 = params_init or {
        "w": butterfly_init(cfg.m_est),
        "h": dirac_taps_dp(cfg.m_est),
    }
    opt = _vae_optimizer(cfg, m_max)  # m_max = optimizer steps per frame
    run_sh = NamedSharding(mesh, P("dp"))
    params = jax.device_put(
        jax.tree.map(lambda x: jnp.broadcast_to(x, (runs,) + x.shape), params0), run_sh
    )
    opt_state = jax.vmap(opt.init)(params)

    def local_loss(p, rx_loc):
        out = _sp_butterfly(p["w"], rx_loc, cfg.sps, "sp")
        q = soft_demap_dp(out, amps, var, const.nu_sc)
        loss, var_est = _sp_elbo(q, rx_loc, p["h"], amps, prior, cfg.sps, mb_len, "sp")
        n_lev = amps.shape[0]
        return loss, (q.reshape(2, 2, n_lev, -1), out, var_est)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp", None, None, None, "sp")),
        out_specs=(
            P("dp"),
            P("dp"),
            P("dp"),
            P("dp", None, None, None, None, "sp"),
            P("dp", None, None, None, "sp"),
            P("dp"),
        ),
    )
    def train_frame(params, opt_state, rx_mb):
        def one_run(p, s, x):  # x: (m_max, 2, 2, mb_len / n_sp)
            def mb(carry, x_m):
                p, s = carry
                (loss, (q, out, var_est)), g = jax.value_and_grad(
                    local_loss, has_aux=True
                )(p, x_m)
                g = jax.lax.psum(g, "sp")  # full gradient on every sp shard
                updates, s = opt.update(g, s, p)
                return (optax.apply_updates(p, updates), s), (loss, q, out, var_est)

            (p, s), (losses, q_mb, out_mb, var_est) = jax.lax.scan(mb, (p, s), x)
            return p, s, losses, q_mb, out_mb, var_est

        return jax.vmap(one_run)(params, opt_state, rx_mb)

    def frame_step(carry, key, theta):
        params, opt_state = carry
        keys = jax.random.split(key, runs)  # matches the vmapped runs path
        rx, tx_full, sigma = jax.vmap(gen, in_axes=(0, None))(keys, theta)
        rx = jax.lax.with_sharding_constraint(rx, run_sh)
        if flex_windows:
            # overlapping windows: window w = chunks w..w+k_ch-1 of fs
            # symbols (same reshaped-chunk assembly as ops/frame_kernel.py)
            fs2 = cfg.flex_step * cfg.sps
            k_ch = mb_len // fs2
            n_ch = rx.shape[-1] // fs2
            ch = rx[..., : n_ch * fs2].reshape(runs, 2, 2, n_ch, fs2)
            rx_mb = jnp.stack(
                [ch[:, :, :, i : i + m_max] for i in range(k_ch)], axis=-2
            ).reshape(runs, 2, 2, m_max, mb_len)
            rx_mb = jnp.moveaxis(rx_mb, 3, 1)
            # recorded stream = central crops; its ground truth starts at
            # batch_len//2 (train/dp.py:train_vae_flex_dp)
            tx = jax.lax.dynamic_slice_in_dim(
                tx_full, cfg.batch_len // 2, m_max * cfg.flex_step, 3
            )
        else:
            # (runs, 2, 2, N) -> (runs, m_max, 2, 2, mb_len): contiguous
            rx_mb = jnp.moveaxis(rx.reshape(runs, 2, 2, m_max, mb_len), 3, 1)
            tx = tx_full
        params, opt_state, losses, q_mb, out_mb, var_est = train_frame(
            params, opt_state, rx_mb
        )
        n_lev = amps.shape[0]
        q_mb = q_mb.reshape(runs, m_max, 2, 2 * n_lev, cfg.batch_len)
        if flex_windows:
            q_mb = q_mb[..., crop0 : crop0 + cfg.flex_step]
            out_mb = out_mb[..., crop0 : crop0 + cfg.flex_step]
            n_rec = m_max * cfg.flex_step
            weight_fn = lambda s0, ms: margin_weight_maxshift(n_rec, ms)
        else:
            weight_fn = lambda s0, ms: batch_cut_weight(
                m_max, cfg.batch_len, s0, ms, cfg.n_cut
            )
        packed = jax.vmap(
            lambda l, q, o, v, t, s: _finish_vae_frame(
                l, q, o, v, t, const, amps, prior, var, weight_fn, s,
            )
        )(losses, q_mb, out_mb, var_est, tx, sigma)
        return (params, opt_state), packed

    (params, _), hist = run_frame_loop(
        frame_step, (params, opt_state), _frame_inputs(cfg, key), _VAE_FIELDS,
        runs=runs, vmap_runs=False, progress=progress, compiled=compiled,
        chunk_frames=chunk_frames,
        checkpoint=checkpoint, checkpoint_every=checkpoint_every,
    )
    return _dp_result(hist, var, (runs,), cfg.num_frames, params=params)


def train_vae_flex_dp_sharded(cfg, key, **kwargs):
    """VAEflex (overlapping sliding windows) on a dp x sp mesh.

    ``train_vae_dp_sharded`` with ``flex_windows=True``: every window's
    sample axis is sp-sharded with the same halo-exchange butterfly and
    psum'd ELBO/gradients; recorded stream and eval semantics match
    train/dp.py:train_vae_flex_dp.
    """
    return train_vae_dp_sharded(cfg, key, flex_windows=True, **kwargs)
