"""LMMSE + DFE baseline evaluation over an SNR sweep.

Known-channel (non-blind) baselines at 1 sample/symbol with RC pulse
shaping: closed-form Wiener filter and a decision-feedback equalizer seeded
by the LMMSE hard decisions.

Parity: the module-level script in AWGN_channel/DFE_MQAM_shaping.py:246-295
(the only reference experiment without a processing() function).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..channels import channel_ir, make_awgn_simulator
from ..core import make_constellation
from ..metrics import find_shift_symb_siso, ser_const_siso
from ..models import (
    complex_fir,
    compute_feedback,
    compute_feedforward,
    compute_lmmse,
    dfe_equalize,
)
from ..models.lmmse_dfe import nearest_neighbor
from ..utils.config import LmmseDfeConfig
from .eval_utils import margin_weight, roll_time

Progress = Callable[[int, dict], None] | None

SNR_VEC = tuple(range(15, 23))


def run_lmmse_dfe(cfg: LmmseDfeConfig, key: jax.Array, snrs=SNR_VEC, progress: Progress = None):
    """Evaluate LMMSE and DFE SER over an SNR grid.

    Returns {"ser_mmse": (num_snr, epochs), "ser_dfe": ..., "snrs": ...}.
    """
    const = make_constellation(cfg.mod, cfg.nu)
    h_up, m_orig = channel_ir(cfg.channel, 1)
    h_c = h_up.astype(np.complex64)
    amps = jnp.asarray(const.amps)
    points = jnp.asarray(np.stack([const.points.real, const.points.imag]))
    margin = cfg.n_cut + 11
    n1 = (cfg.lmmse_order - 1) // 2 + 1

    ser_mmse = np.zeros((len(snrs), cfg.num_epochs), np.float32)
    ser_dfe = np.zeros((len(snrs), cfg.num_epochs), np.float32)

    key_loop = key
    for si, snr in enumerate(snrs):
        lmmse = compute_lmmse(h_c, snr, cfg.lmmse_order, n1)
        ff = compute_feedforward(h_c, snr, cfg.m_dfe)
        fb = compute_feedback(h_c, ff)
        lmmse_p = jnp.asarray(np.stack([lmmse.real, lmmse.imag]).astype(np.float32))
        ff_p = jnp.asarray(np.stack([ff.real, ff.imag]).astype(np.float32))
        fb_p = jnp.asarray(np.stack([fb.real, fb.imag]).astype(np.float32))
        gen = make_awgn_simulator(
            const, snr, h_up, m_orig, cfg.n_valid, 1, pulse="rc"
        )

        @jax.jit
        def eval_epoch(k):
            rx, tx = gen(k)
            # --- LMMSE (even filter order -> conv output is N+1 long)
            soft_full = complex_fir(rx, lmmse_p)
            soft = soft_full[:, : cfg.n_valid]
            shift = find_shift_symb_siso(soft, tx, 21)
            soft_r = roll_time(soft, shift)
            w = margin_weight(cfg.n_valid, shift, margin)
            s_mmse = ser_const_siso(soft_r, tx, amps, weight=w)
            # --- DFE, seeded by the LMMSE hard decisions (reference takes
            # the [1:] offset of the LMMSE output, DFE_MQAM_shaping.py:278)
            ff_out = complex_fir(rx, ff_p)[:, : cfg.n_valid]
            init_idx = nearest_neighbor(soft_full[:, 1 : 1 + cfg.n_valid], points)
            dfe_idx = dfe_equalize(ff_out, fb_p, points, init_idx)
            hard = points[:, dfe_idx]
            shift_d = find_shift_symb_siso(hard, tx, 24)
            hard_r = roll_time(hard, shift_d)
            w_d = margin_weight(cfg.n_valid, shift_d, margin)
            s_dfe = ser_const_siso(hard_r, tx, amps, weight=w_d)
            return s_mmse, s_dfe

        for epoch in range(cfg.num_epochs):
            key_loop, k = jax.random.split(key_loop)
            s_mmse, s_dfe = eval_epoch(k)
            ser_mmse[si, epoch] = float(s_mmse)
            ser_dfe[si, epoch] = float(s_dfe)
            if progress:
                progress(epoch, {"snr": snr, "ser_mmse": float(s_mmse), "ser_dfe": float(s_dfe)})
    return {"ser_mmse": ser_mmse, "ser_dfe": ser_dfe, "snrs": np.asarray(snrs)}
