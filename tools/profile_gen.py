"""Per-stage device breakdown of the vmapped DP CHANNEL GENERATION stage.

The aggregate pipeline is gen + train + eval; after round 4's train (in-kernel
im2col) and eval (emit_eval) fixes, generation (~5.7 ms/frame at R=128 by
difference, artifacts/r4_eval_ke.log) is the second-largest stage. This probe
re-derives the generator's internals (channels/optical_dp.py:make_dp_simulator
— kept in sync by tests/test_channels.py's golden band on the real generator)
as CUMULATIVE stage programs so adjacent differences isolate:

  rng   — PCS level sampling + the AWGN normal draw (pure RNG cost)
  conv  — + zero-insert upsample + fused pulse/ISI 'valid' conv
  fft   — + the frequency-domain CD/PMD/rotation block (pad, fft, H, ifft)
  full  — the real ``gen`` closure (adds sigma scaling, noise add, slices)

Same methodology as tools/profile_agg.py: R-way vmap, lax.scan over frames,
one AOT-compiled program per stage, best-of-3 wall time.
"""

from __future__ import annotations

import argparse
import functools
import time


def timed(fn, reps=3):
    import jax

    t0 = time.perf_counter()
    c = jax.jit(fn).lower().compile()
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(c())
        best = min(best, time.perf_counter() - t0)
    return best, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=128)
    ap.add_argument("--frames", type=int, default=170)
    ap.add_argument("--n-frame", type=int, default=10000)
    args = ap.parse_args()

    from vae_equalizer_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vae_equalizer_tpu.channels.optical_dp import (
        PULSE_BETA,
        PULSE_T,
        _fast_fft_len,
    )
    from vae_equalizer_tpu.channels.presets import channel_ir
    from vae_equalizer_tpu.core import cplx
    from vae_equalizer_tpu.core.constellation import sample_levels
    from vae_equalizer_tpu.core.filters import rrcfir
    from vae_equalizer_tpu.train.dp import _frame_inputs, _setup
    from vae_equalizer_tpu.utils.config import DpConfig

    R = args.runs
    cfg = DpConfig(mod="64-QAM", n_frame_max=args.n_frame,
                   num_frames=args.frames, n_lrhalf=10**9)
    m_max = cfg.n_frame_max // cfg.batch_len
    n_frame = m_max * cfg.batch_len
    const, var, gen, amps, P = _setup(cfg, n_frame)
    keys, thetas = _frame_inputs(cfg, jax.random.PRNGKey(0))

    # re-derive the closure constants (optical_dp.py:make_dp_simulator)
    pol, sps = 2, cfg.sps
    h_up, _ = channel_ir(cfg.channel, sps)
    h_pulse_re = rrcfir(PULSE_T, sps, PULSE_BETA)
    h_comb_c = np.convolve(h_pulse_re.astype(np.complex64), h_up)
    h_comb = jnp.asarray(np.stack([h_comb_c.real, h_comb_c.imag]).astype(np.float32))
    m_up = h_up.shape[-1]
    n_conv = n_frame + m_up + 4 * PULSE_T
    up_len = sps * (n_conv - 1) + 1
    sig_len = up_len - h_pulse_re.shape[-1] - m_up + 2
    fft_len = _fast_fft_len(sig_len)
    freq = np.fft.fftfreq(fft_len, 1 / cfg.symb_rate / sps)
    cd_phase = 2 * (np.pi * freq) ** 2 * cfg.tau_cd
    pmd_phase = np.pi * cfg.tau_pmd * freq
    cd = jnp.asarray(np.stack([np.cos(cd_phase), np.sin(cd_phase)]).astype(np.float32))
    pmd = jnp.asarray(np.stack([np.cos(pmd_phase), np.sin(pmd_phase)]).astype(np.float32))
    phi_iq = np.asarray(cfg.phi_iq)
    e_phi = jnp.asarray(np.stack([np.cos(phi_iq), -np.sin(phi_iq)]).astype(np.float32))

    def stage_one(part, key, theta):
        k_sym, k_noise = jax.random.split(key)
        data = sample_levels(k_sym, amps, P, (pol * 2, n_conv))
        noise = jax.random.normal(k_noise, (pol, 2, sig_len), jnp.float32)
        acc = data.sum() + noise[0, 0, 0]
        if part == "rng":
            return acc
        d4 = data.reshape(pol, 2, n_conv)
        tx_up = jnp.concatenate(
            [d4[..., None], jnp.zeros((pol, 2, n_conv, sps - 1), jnp.float32)], -1
        ).reshape(pol, 2, n_conv * sps)[..., :up_len]
        sig = jax.vmap(lambda xp: cplx.conv_valid(xp, h_comb))(tx_up)
        if part == "conv":
            return acc + sig.sum()
        z = sig[:, 0, :] + 1j * sig[:, 1, :]
        z = jnp.pad(z, ((0, 0), (0, fft_len - sig_len)))
        zf = jnp.fft.fft(z, axis=-1)
        ct, st = jnp.cos(theta), jnp.sin(theta)
        e0 = e_phi[0, 0] + 1j * e_phi[1, 0]
        e1 = e_phi[0, 1] + 1j * e_phi[1, 1]
        d0 = pmd[0] + 1j * pmd[1]
        d1 = pmd[0] - 1j * pmd[1]
        cdz = cd[0] + 1j * cd[1]
        h00 = ct * e0 * d0 * ct * e0 + (-st * e0) * d1 * (-st * e1)
        h01 = ct * e0 * d0 * st * e0 + (-st * e0) * d1 * ct * e1
        h10 = st * e1 * d0 * ct * e0 + ct * e1 * d1 * (-st * e1)
        h11 = st * e1 * d0 * st * e0 + ct * e1 * d1 * ct * e1
        out0 = (h00 * zf[0] + h01 * zf[1]) * cdz
        out1 = (h10 * zf[0] + h11 * zf[1]) * cdz
        z = jnp.fft.ifft(jnp.stack([out0, out1]), axis=-1)[:, :sig_len]
        sig = jnp.stack([jnp.real(z), jnp.imag(z)], axis=1).astype(jnp.float32)
        return acc + sig.sum()  # "fft"

    def program(part):
        if part == "full":
            def one(key, theta):
                rx, tx, sigma = gen(key, theta)
                return rx.sum() + tx[0, 0, 0] + sigma
        else:
            one = functools.partial(stage_one, part)

        def body(carry, inp):
            key, theta = inp
            ks = jax.random.split(key, R)
            vals = jax.vmap(one, in_axes=(0, None))(ks, theta)
            return carry + vals.sum(), None

        @jax.jit
        def run():
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), (keys, thetas))
            return acc

        return run

    prev = None
    for part in ["rng", "conv", "fft", "full"]:
        best, comp = timed(program(part))
        per_frame = best / args.frames * 1e3
        delta = "" if prev is None else f"  (+{per_frame - prev:6.3f} vs prev)"
        prev = per_frame
        print(f"{part:>5}: {per_frame:8.3f} ms/frame{delta}  "
              f"(total {best:.3f} s, compile {comp:.0f} s)", flush=True)


if __name__ == "__main__":
    main()
