"""Square M-QAM constellations with probabilistic constellation shaping (PCS).

Replaces the hand-written constellation dicts + Maxwell-Boltzmann pmf setup
that the reference duplicates in every file (e.g.
optical_DP_channel/shared_funcs.py:556-581,
AWGN_channel/func_VAELE_MQAM_shaping.py:246-272). A square M-QAM separates
into two independent ASK dimensions, so everything downstream works on the
per-dimension amplitude levels ``amps`` and their pmf ``P``.

Setup-time NumPy; the resulting small arrays are closed over / passed into
jitted functions.
"""

from __future__ import annotations

import dataclasses

import numpy as np

_MOD_SIZES = {"4-QAM": 2, "16-QAM": 4, "64-QAM": 8, "256-QAM": 16}


def qam_points(mod: str) -> np.ndarray:
    """Unit-power square QAM constellation, real-major ordering.

    Index ``k = i*num_lev + j`` maps to ``levels[i] + 1j*levels[j]`` which is
    the same layout as the reference's literal tables
    (shared_funcs.py:556-559): the real part is repeated ``num_lev`` times,
    the imaginary part tiled.
    """
    m = _MOD_SIZES[mod]
    levels = np.arange(-(m - 1), m, 2, dtype=np.float64)
    re = np.repeat(levels, m)
    im = np.tile(levels, m)
    c = re + 1j * im
    c = c / np.sqrt(np.mean(np.abs(c) ** 2))
    return c.astype(np.complex64)


def mb_prior(amps: np.ndarray, nu: float) -> np.ndarray:
    """Maxwell-Boltzmann pmf over amplitude levels.

    ``P_i ∝ exp(-nu * (a_i / min|a|)^2)`` — the per-dimension shaping pmf of
    shared_funcs.py:569-572.
    """
    sc = np.min(np.abs(amps))
    P = np.exp(-nu * np.abs(amps / sc) ** 2)
    return (P / np.sum(P)).astype(np.float64)


@dataclasses.dataclass(frozen=True)
class Constellation:
    """Static per-experiment constellation/PCS description.

    Attributes:
      mod: modulation name, e.g. "64-QAM".
      points: (num_lev**2,) complex64 unit-power constellation.
      amps: (num_lev,) float32 per-dimension amplitude levels (sorted asc).
      P: (num_lev,) float64 Maxwell-Boltzmann pmf of the amplitude levels.
      nu: shaping coefficient.
      nu_sc: nu rescaled so the lowest level is 1 (``nu / min|amps|^2``),
        used by the PCS-aware soft demapper.
      pow_mean: mean constellation power under the PCS distribution
        (= 2 * E_P[a^2]).
      amp_mean: mean per-component magnitude E_P[|a|] (SISO VAE-LE output
        normalization target).
      entropy: constellation entropy in bits under PCS.
    """

    mod: str
    points: np.ndarray
    amps: np.ndarray
    P: np.ndarray
    nu: float
    nu_sc: float
    pow_mean: float
    amp_mean: float
    entropy: float

    @property
    def num_lev(self) -> int:
        return self.amps.shape[0]

    @property
    def scale(self) -> float:
        """Exact integer-decode scale: index = round(scale*a_norm + (L-1)/2).

        Levels are odd integers scaled to unit 2D power, so the inverse
        spacing is sqrt((L^2-1)/6) exactly — NOT (L-1)/2, which only rounds
        correctly up to L=8 (see metrics/ser.py _decode_levels)."""
        import math

        return math.sqrt((self.num_lev**2 - 1) / 6)


def make_constellation(mod: str, nu: float = 0.0) -> Constellation:
    points = qam_points(mod)
    num_lev = _MOD_SIZES[mod]
    # per-dimension levels of the normalized constellation (ascending);
    # derived in float64 so the pmf/moments match the reference's float64
    # setup path, then stored float32
    levels = np.arange(-(num_lev - 1), num_lev, 2, dtype=np.float64)
    amps64 = levels / np.sqrt(np.mean(np.abs(levels[:, None] + 1j * levels[None, :]) ** 2))
    amps = amps64.astype(np.float32)
    P = mb_prior(amps64, nu)
    sc = float(np.min(np.abs(amps64)))
    nu_sc = nu / sc**2
    pow_mean = float(2.0 * np.sum(P * amps64**2))
    amp_mean = float(np.sum(P * np.abs(amps64)))
    entropy = float(-2.0 * np.sum(P * np.log2(P)))
    return Constellation(
        mod=mod,
        points=points,
        amps=amps,
        P=P,
        nu=float(nu),
        nu_sc=float(nu_sc),
        pow_mean=pow_mean,
        amp_mean=amp_mean,
        entropy=entropy,
    )


def demapper_noise_var(const: Constellation, snr_db: float) -> float:
    """Per-component noise variance for the soft demapper at a given SNR.

    ``pow_mean / 10^(SNR/10) / 2`` (per pol, per I/Q component) as in
    shared_funcs.py:581.
    """
    return const.pow_mean / 10 ** (snr_db / 10) / 2


def sample_levels(key, amps, P, shape) -> "jax.Array":
    """Draw amplitude levels i.i.d. from the PCS pmf — fast TPU inverse CDF.

    Semantically identical to ``jax.random.choice(key, amps, shape, p=P)``
    (uniform u -> searchsorted(cumsum(P), u) -> amps[idx]) but built from
    n_lev-1 compares on the natural (rows, lanes) layout: measured 1.0 ms vs
    2.5 ms per (4, 10033) draw inside a compiled frame scan on v5e — choice's
    trailing level axis and index gather both hit pathological TPU layouts.
    Replaces the reference's host-side ``rng.choice`` (shared_funcs.py:75).

    The CDF is precomputed with NumPy when amps/P are concrete (the usual
    case — they're setup-time constants): a ``jnp.cumsum`` on a closed-over
    constant makes jax's LOWERING evaluate that constant subgraph on the
    backend, which on the axon tunnel stalls the first lowering of every
    containing program by minutes (measured 80-640 s; host-side constants
    lower in ~0.1 s).
    """
    import jax as _jax
    import jax.numpy as _jnp

    try:  # concrete inputs: build the per-level constants on the host
        amps_h = np.asarray(amps)
        cum = np.cumsum(np.asarray(P, dtype=np.float32))
        steps = np.diff(amps_h)
    except Exception:  # traced inputs: stay in the graph
        amps_h, cum = amps, _jnp.cumsum(P)
        steps = amps[1:] - amps[:-1]
    u = _jax.random.uniform(key, shape)
    a = _jnp.full(shape, amps_h[0], _jnp.result_type(amps))
    for lev in range(1, amps.shape[0]):
        a = a + _jnp.where(u >= cum[lev - 1], steps[lev - 1], 0.0)
    return a
