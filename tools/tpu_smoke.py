"""One-process TPU smoke run: stage-by-stage checks then a quick benchmark.

Run on the real chip (no platform override). Prints PASS/FAIL per stage and
finishes with bench-style numbers. Designed to never transfer complex arrays
(axon transport constraint) and to be safe to re-run.

Usage: python tools/tpu_smoke.py [--full]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def stage(name, f):
    import jax

    t0 = time.perf_counter()
    try:
        r = jax.block_until_ready(f())
        print(f"PASS {name} ({time.perf_counter()-t0:.2f}s)", flush=True)
        return r
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="also run the full-size bench")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    stage("trivial op", lambda: jnp.sum(jnp.ones((128, 128))))

    from vae_equalizer_tpu.core import make_constellation
    from vae_equalizer_tpu.channels import channel_ir, make_dp_simulator, make_awgn_simulator

    const = make_constellation("64-QAM", 0.0)
    h_up, m_orig = channel_ir("h1", 2)
    h0_up, _ = channel_ir("h0", 2)

    gen_awgn = jax.jit(make_awgn_simulator(const, 24.0, h_up, m_orig, 2000, 2))
    stage("awgn simulator", lambda: gen_awgn(jax.random.PRNGKey(0)))

    gen_dp = jax.jit(
        make_dp_simulator(const, 23.0, h0_up, 2000, 2, 90e9, -26e-24,
                          0.1e-12 * np.sqrt(1000), np.array([0.0314, 0.0314]))
    )
    stage("dp simulator (on-device fft)", lambda: gen_dp(jax.random.PRNGKey(1), jnp.float32(0.3)))

    from vae_equalizer_tpu.models import butterfly_init, dirac_taps_dp, vae_le_dp_forward, cma_dp
    from vae_equalizer_tpu.models.losses import elbo_dp
    from vae_equalizer_tpu.core.constellation import demapper_noise_var

    amps = jnp.asarray(const.amps)
    P = jnp.asarray(const.P, jnp.float32)
    var = jnp.full((2,), demapper_noise_var(const, 23.0), jnp.float32)
    rng = np.random.default_rng(0)
    rx = jnp.asarray(rng.normal(size=(2, 2, 400)).astype(np.float32) * 0.5)
    w, h = butterfly_init(25), dirac_taps_dp(25)

    stage("butterfly forward + demapper", lambda: vae_le_dp_forward(w, rx, amps, var, 0.0, 2))
    q, out = vae_le_dp_forward(w, rx, amps, var, 0.0, 2)
    stage("fused elbo", lambda: elbo_dp(q, rx, h, amps, P))
    stage("elbo grad", lambda: jax.grad(lambda hh: elbo_dp(q, rx, hh, amps, P)[0])(h))
    stage("cma scan", lambda: cma_dp(rx, 1.0, dirac_taps_dp(11), 1e-3, 2, True))

    from vae_equalizer_tpu.ops import cma_dp_pallas, vae_le_dp_forward_pallas

    stage("pallas cma kernel", lambda: cma_dp_pallas(rx, 1.0, dirac_taps_dp(11), 1e-3, 2, True))
    stage("pallas butterfly+demap kernel", lambda: vae_le_dp_forward_pallas(w, rx, amps, var, 0.0, 2))

    from vae_equalizer_tpu.metrics import cpe_dp, find_shift_dp, ser_iqflip

    tx = jnp.asarray(const.amps[rng.integers(0, 8, size=(2, 2, 200))])
    stage("cpe", lambda: cpe_dp(out))
    stage("sync + ser", lambda: ser_iqflip(q, tx))

    import __graft_entry__ as ge

    fn, eargs = ge.entry()
    stage("graft entry forward", lambda: jax.jit(fn)(*eargs))

    print("--- bench (quick) ---", flush=True)
    from bench import measure_tpu, get_baseline

    try:
        r = measure_tpu(3, 2000)
        print("quick:", r, flush=True)
        r8 = measure_tpu(2, 2000, runs=8)
        print("quick aggregate 8 runs:", r8, flush=True)
        if args.full:
            rf = measure_tpu(10, 10000)
            print("FULL:", rf, flush=True)
            rf8 = measure_tpu(5, 10000, runs=8)
            print("FULL aggregate 8 runs:", rf8, flush=True)
            base = get_baseline(10000)
            print("vs baseline:", rf["symbols_per_sec"] / base["symbols_per_sec"], flush=True)
    except Exception as e:
        print("bench FAIL:", type(e).__name__, str(e)[:200], flush=True)


if __name__ == "__main__":
    main()
