"""L4 training/processing loops reproducing the reference experiment semantics."""

from .awgn import train_vae_le_awgn, train_vae_nn_awgn, run_cma_awgn
from .dp import train_vae_dp, train_vae_flex_dp, run_cma_dp

__all__ = [
    "train_vae_le_awgn",
    "train_vae_nn_awgn",
    "run_cma_awgn",
    "train_vae_dp",
    "train_vae_flex_dp",
    "run_cma_dp",
]
