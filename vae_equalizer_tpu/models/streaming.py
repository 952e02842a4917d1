"""Stateful streaming receiver: block-wise equalization of a continuous stream.

Production-serving counterpart of the frame loops: the input arrives in
fixed-size blocks; the receiver keeps (taps, optimizer state, tail samples)
as an explicit carry, equalizes each block with overlap-save (the M-1 tail of
the previous block prepends the next so block boundaries are ISI-seamless),
and optionally keeps adapting online (VAE gradient step per block).

This is the natural deployment shape on TPU: one jitted ``step`` of static
block size, called forever. (The reference has no streaming mode — its
closest structure is VAEflex's overlapping windows,
func_VAEflex_DP_MQAM_shaping.py:59-70.)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from .losses import elbo_dp
from .vae_le import butterfly_init, vae_le_dp_forward
from .cma import dirac_taps_dp


@dataclasses.dataclass
class StreamingReceiver:
    """Online DP VAE-LE receiver over fixed-size sample blocks.

    Usage::

        rxr = StreamingReceiver(amps, P, var, nu_sc, m_est=25, sps=2,
                                block_len=2000, lr=2.5e-3, adapt=True)
        state = rxr.init()
        for block in stream:                 # block: (2, 2, block_len*sps)
            state, q, syms = rxr.step(state, block)
    """

    amps: jnp.ndarray
    P: jnp.ndarray
    var: jnp.ndarray
    nu_sc: float
    m_est: int = 25
    sps: int = 2
    block_len: int = 2000  # symbols per block
    lr: float = 2.5e-3
    adapt: bool = True
    adapt_batch: int = 100  # symbols per gradient step inside a block
    use_pallas: bool = False  # fused TPU kernel for the output pass (exact f32, ~2.7x)

    def __post_init__(self):
        self._opt = optax.adam(self.lr)
        self._step = jax.jit(self._step_impl)

    def init(self) -> dict[str, Any]:
        params = {"w": butterfly_init(self.m_est), "h": dirac_taps_dp(self.m_est)}
        return {
            "params": params,
            "opt": self._opt.init(params),
            # previous block's tail for overlap-save (M-1 samples)
            "tail": jnp.zeros((2, 2, self.m_est - 1), jnp.float32),
        }

    def _step_impl(self, state, block):
        tail = state["tail"]
        params = state["params"]
        opt = state["opt"]

        if self.adapt:
            # adapt on minibatches (training-step density of the frame loops)
            mb = self.adapt_batch * self.sps
            n_mb = block.shape[-1] // mb

            def loss_fn(p, x_mb):
                q, _ = vae_le_dp_forward(p["w"], x_mb, self.amps, self.var, self.nu_sc, self.sps)
                loss, _ = elbo_dp(q, x_mb, p["h"], self.amps, self.P)
                return loss

            def one(carry, i):
                p, s = carry
                x_mb = jax.lax.dynamic_slice_in_dim(block, i * mb, mb, 2)
                _, g = jax.value_and_grad(loss_fn)(p, x_mb)
                updates, s = self._opt.update(g, s, p)
                return (optax.apply_updates(p, updates), s), 0

            (params, opt), _ = jax.lax.scan(one, (params, opt), jnp.arange(n_mb))

        # one seamless overlap-save pass with the adapted taps
        x = jnp.concatenate([tail, block], axis=-1)
        if self.use_pallas:
            from ..ops import vae_le_dp_forward_pallas

            q, out = vae_le_dp_forward_pallas(
                params["w"], x, self.amps, self.var, self.nu_sc, self.sps
            )
        else:
            q, out = vae_le_dp_forward(params["w"], x, self.amps, self.var, self.nu_sc, self.sps)

        # overlap-save: drop the (M-1)//sps warmup symbols that belong to the
        # previous block's output
        warm = (self.m_est - 1) // self.sps
        q = q[:, :, warm : warm + self.block_len]
        out = out[:, :, warm : warm + self.block_len]
        new_state = {
            "params": params,
            "opt": opt,
            "tail": block[:, :, -(self.m_est - 1) :],
        }
        return new_state, q, out

    def step(self, state, block):
        """Process one (2, 2, block_len*sps) sample block."""
        return self._step(state, block)
