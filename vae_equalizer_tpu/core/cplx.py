"""Complex baseband as stacked real/imag planes.

Framework-wide convention (matches the reference's tensor layout, see
SURVEY.md "cross-cutting convention"):

* SISO signal:  ``(2, L)``        — axis 0 is (I, Q)
* DP signal:    ``(2, 2, L)``     — (pol, I/Q, time)
* SISO taps:    ``(2, M)``        — (re/im, tap)
* DP taps:      ``(2, 2, 2, M)``  — (out-pol, in-pol, re/im, tap)

Stacked planes keep every op in real arithmetic, which is what TPU vector
units and the MXU natively consume; no complex dtype ever enters a jitted
compute path. The channel simulators use complex64 internally (FFT) and
convert at the boundary with :func:`to_planes` / :func:`from_planes`.
"""

from __future__ import annotations

import jax.numpy as jnp


def to_planes(z: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """complex (...) -> stacked (..., 2, ...) with new axis at `axis`."""
    return jnp.stack([jnp.real(z), jnp.imag(z)], axis=axis)


def from_planes(x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """stacked -> complex, consuming the size-2 `axis`."""
    re = jnp.take(x, 0, axis=axis)
    im = jnp.take(x, 1, axis=axis)
    return re + 1j * im


def cmul(a: jnp.ndarray, b: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Complex multiply of stacked-plane arrays along `axis`."""
    ar, ai = jnp.take(a, 0, axis=axis), jnp.take(a, 1, axis=axis)
    br, bi = jnp.take(b, 0, axis=axis), jnp.take(b, 1, axis=axis)
    return jnp.stack([ar * br - ai * bi, ar * bi + ai * br], axis=axis)


def cconj(a: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    re = jnp.take(a, 0, axis=axis)
    im = jnp.take(a, 1, axis=axis)
    return jnp.stack([re, -im], axis=axis)


def cabs2(a: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """|a|^2, removing the size-2 plane axis."""
    return jnp.sum(a * a, axis=axis)


def conv_valid(x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """'valid' complex convolution of stacked-plane 1-D signals.

    x: (2, Lx), h: (2, Lh) -> (2, Lx - Lh + 1). True convolution (kernel
    flipped), matching ``np.convolve(mode='valid')`` semantics used by the
    reference channel simulators.
    """
    xr, xi = x[0], x[1]
    hr, hi = h[0], h[1]
    rr = jnp.convolve(xr, hr, mode="valid")
    ri = jnp.convolve(xr, hi, mode="valid")
    ir = jnp.convolve(xi, hr, mode="valid")
    ii = jnp.convolve(xi, hi, mode="valid")
    return jnp.stack([rr - ii, ri + ir])
