"""End-to-end statistical parity: this framework vs the PyTorch reference.

Runs the reference's full default experiments (where the reference is
mounted) and the corresponding framework loops, and reports final SER
side-by-side. Results are summarized in PARITY_RESULTS.md.

Usage: python tools/compare_parity.py [--which vaele|dp|dfe|all]
These are long runs (the reference DP config takes ~17 min of torch CPU).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
REF = pathlib.Path("/root/reference")
sys.path.insert(0, str(REPO))


def _ref_paths():
    sys.path.insert(0, str(REF / "AWGN_channel"))
    sys.path.insert(0, str(REF / "optical_DP_channel"))
    import numpy.core.numeric as ncn

    if not hasattr(ncn, "Inf"):
        ncn.Inf = np.inf


def compare_vaele():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from vae_equalizer_tpu.train import train_vae_le_awgn
    from vae_equalizer_tpu.utils.config import AwgnVaeLeConfig

    t0 = time.time()
    mine = train_vae_le_awgn(AwgnVaeLeConfig(), jax.random.PRNGKey(7))
    mine_wall = time.time() - t0

    _ref_paths()
    import func_VAELE_MQAM_shaping as ref

    t0 = time.time()
    with contextlib.redirect_stdout(io.StringIO()):
        ser_ref = ref.processing("64-QAM", 2, 24.0, 0.0, 25, 5e-3, 350, 15000, 1200, 500, 2, "h1")
    ref_wall = time.time() - t0
    ser_ref = ser_ref.detach().numpy()
    return {
        "config": "AWGN VAE-LE 64-QAM h1 SNR24 (Eval_run_shaping_vaele defaults)",
        "ref_final_ser": float(np.mean(ser_ref[-25:])),
        "mine_final_ser": float(np.mean(mine["ser"][-25:])),
        "mine_final_mi_bits": float(mine["mi"][-1]),
        "ref_wall_s": ref_wall,
        "mine_wall_s": mine_wall,
    }


def compare_dp():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from vae_equalizer_tpu.train import train_vae_dp
    from vae_equalizer_tpu.utils.config import DpConfig

    t0 = time.time()
    mine = train_vae_dp(DpConfig(), jax.random.PRNGKey(11))
    mine_wall = time.time() - t0

    _ref_paths()
    import shared_funcs as ref_sfun
    import func_VAELE_DP_MQAM_shaping as ref

    # numpy-2 compat shim for the reference's ragged-array simulate_dispersion
    # (H = R^T diag(e^{j pi tau f}, e^{-j pi tau f}) R, expanded per frequency)
    def shim(rx, symb_rate, sps, tau_cd, tau_pmd, phiIQ, theta):
        rx_fft = np.fft.fft(rx, axis=1)
        freq = np.fft.fftfreq(rx.shape[1], 1 / symb_rate / sps)
        exp_cd = np.exp(1j * 2 * (np.pi * freq) ** 2 * tau_cd)
        exp_pmd = np.exp(1j * np.pi * tau_pmd * freq)
        ct, st = np.cos(theta), np.sin(theta)
        e0, e1 = np.exp(-1j * phiIQ[0]), np.exp(-1j * phiIQ[1])
        h00 = ct * e0 * exp_pmd * ct * e0 + (-st * e0) / exp_pmd * (-st * e1)
        h01 = ct * e0 * exp_pmd * st * e0 + (-st * e0) / exp_pmd * ct * e1
        h10 = st * e1 * exp_pmd * ct * e0 + ct * e1 / exp_pmd * (-st * e1)
        h11 = st * e1 * exp_pmd * st * e0 + ct * e1 / exp_pmd * ct * e1
        out = np.stack(
            [(h00 * rx_fft[0] + h01 * rx_fft[1]) * exp_cd,
             (h10 * rx_fft[0] + h11 * rx_fft[1]) * exp_cd]
        )
        return np.complex64(np.fft.ifft(out, axis=1))

    ref_sfun.simulate_dispersion = shim
    t0 = time.time()
    with contextlib.redirect_stdout(io.StringIO()):
        ser_ref, _, _ = ref.processing(
            "64-QAM", 2, 23.0, 0.0, 25, 0.06 * np.pi, np.pi / 10, 2.5e-3, 100, 10000,
            170, 10, "h0", 90e9, -26e-24, 0.1e-12 * np.sqrt(1000),
            np.array([0.0314, 0.0314], dtype=np.complex64), 170,
        )
    ref_wall = time.time() - t0
    ser_ref = ser_ref.detach().numpy()
    return {
        "config": "optical DP VAE 64-QAM SNR23 170x10000 (Eval_run_DP defaults)",
        "ref_final_soft_ser": ser_ref[2:, -20:].mean(axis=1).tolist(),
        "mine_final_soft_ser": mine["ser"][2:, -20:].mean(axis=1).tolist(),
        "mine_final_mi_bits": mine["mi"][:, -1].tolist(),
        "ref_wall_s": ref_wall,
        "mine_wall_s": mine_wall,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="all", choices=["vaele", "dp", "all"])
    ap.add_argument("--out", default=str(REPO / "parity_results.json"))
    args = ap.parse_args()
    results = []
    if args.which in ("vaele", "all"):
        results.append(compare_vaele())
    if args.which in ("dp", "all"):
        results.append(compare_dp())
    pathlib.Path(args.out).write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
