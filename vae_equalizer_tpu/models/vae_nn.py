"""VAE-NN: two-layer convolutional equalizer/demapper (AWGN path).

conv(2 -> 2n, k1) -> ELU -> [BatchNorm] -> conv(2n -> 2n, k2, stride sps),
then the sps-phase-averaged input is added as a residual before a per-half
softmax over the amplitude levels.

Parameters are a plain dict pytree; BatchNorm is functional (batch statistics
in training, running averages carried in a separate state dict).

Parity: classes Net / Net_BN (func_VAENN_MQAM.py:170-211). Torch Conv1d is
cross-correlation with (out, in, k) kernels — same layout used here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["vae_nn_init", "vae_nn_forward"]


def _xavier_uniform(key, shape):
    fan_out = shape[0] * shape[2]
    fan_in = shape[1] * shape[2]
    a = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, jnp.float32, -a, a)


def vae_nn_init(key, kernel_1: int, kernel_2: int, num_lev: int, batchnorm: bool = False):
    """Initialize parameters (+ batchnorm state if enabled)."""
    k1, k2 = jax.random.split(key)
    ch = 2 * num_lev
    params = {
        "w1": _xavier_uniform(k1, (ch, 2, kernel_1)),
        "b1": jnp.zeros((ch,)),
        "w2": _xavier_uniform(k2, (ch, ch, kernel_2)),
        "b2": jnp.zeros((ch,)),
    }
    state = None
    if batchnorm:
        params["bn_scale"] = jnp.ones((ch,))
        params["bn_bias"] = jnp.zeros((ch,))
        state = {"mean": jnp.zeros((ch,)), "var": jnp.ones((ch,)), "momentum": 0.1}
    return params, state


def _conv(x, w, b, stride, pad):
    out = jax.lax.conv_general_dilated(
        x[None], w, (stride,), [(pad, pad)], dimension_numbers=("NCH", "OIH", "NCH")
    )[0]
    return out + b[:, None]


def vae_nn_forward(params, x, sps: int, state=None, train: bool = True, eps: float = 1e-5):
    """Forward pass. x: (2, L) -> q (2*num_lev, N_out)[, new_state].

    With ``state`` given, applies BatchNorm after the ELU (Net_BN); in train
    mode uses batch statistics and returns updated running stats.
    """
    k1 = params["w1"].shape[-1]
    k2 = params["w2"].shape[-1]
    h = _conv(x, params["w1"], params["b1"], 1, k1 // 2)
    h = jax.nn.elu(h)
    new_state = state
    if state is not None:
        if train:
            mu = jnp.mean(h, axis=1)
            var = jnp.var(h, axis=1)
            m = state["momentum"]
            # torch tracks running var with the unbiased estimator
            n = h.shape[1]
            var_unbiased = var * n / max(n - 1, 1)
            new_state = {
                "mean": (1 - m) * state["mean"] + m * mu,
                "var": (1 - m) * state["var"] + m * var_unbiased,
                "momentum": m,
            }
        else:
            mu, var = state["mean"], state["var"]
        h = (h - mu[:, None]) * jax.lax.rsqrt(var[:, None] + eps)
        h = h * params["bn_scale"][:, None] + params["bn_bias"][:, None]
    out = _conv(h, params["w2"], params["b2"], sps, k2 // 2)
    num_lev = out.shape[0] // 2
    n_out = out.shape[-1]
    # residual: average of the sps input phases
    x_res = jnp.mean(
        jnp.stack([x[:, i : sps * n_out : sps] for i in range(sps)]), axis=0
    )  # (2, N_out)
    q_i = jax.nn.softmax(out[:num_lev] + x_res[0][None, :], axis=0)
    q_q = jax.nn.softmax(out[num_lev:] + x_res[1][None, :], axis=0)
    q = jnp.concatenate([q_i, q_q])
    if state is not None:
        return q, new_state
    return q
