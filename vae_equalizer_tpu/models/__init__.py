"""L2 equalizers/demappers: VAE-LE (linear FIR), VAE-NN (CNN), CMA family, LMMSE/DFE."""

from .vae_le import (
    butterfly_init,
    vae_le_dp_forward,
    siso_fir_init,
    vae_le_siso_forward,
    vae_le_siso_forward_runs,
    soft_demap_dp,
)
from .losses import elbo_dp, elbo_siso
from .vae_nn import vae_nn_init, vae_nn_forward
from .cma import cma_siso, cma_dp, cma_batch_dp, cma_flex_dp, dirac_taps_siso, dirac_taps_dp
from .lmmse_dfe import compute_lmmse, compute_feedforward, compute_feedback, dfe_equalize, complex_fir

__all__ = [
    "butterfly_init",
    "vae_le_dp_forward",
    "siso_fir_init",
    "vae_le_siso_forward",
    "vae_le_siso_forward_runs",
    "soft_demap_dp",
    "elbo_dp",
    "elbo_siso",
    "vae_nn_init",
    "vae_nn_forward",
    "cma_siso",
    "cma_dp",
    "cma_batch_dp",
    "cma_flex_dp",
    "dirac_taps_siso",
    "dirac_taps_dp",
    "compute_lmmse",
    "compute_feedforward",
    "compute_feedback",
    "dfe_equalize",
    "complex_fir",
]
